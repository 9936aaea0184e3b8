"""Powder sample characterization from instance masks.

Re-implementation of the reference's ampis/applications/powder.py (569 LoC):
satellite<->particle matching, per-image satellite metrics, cumulative
particle size distributions, and aggregate satellite statistics.

The satellite matching hot loop (reference powder.py:82-83 computed
area(merge(sat, particle, intersect)) per particle in a python loop over C
calls) runs as one batched multithreaded C++ call per satellite here
(ampis_tpu.rle.intersect_areas).
"""
from __future__ import annotations

import copy

import matplotlib.pyplot as plt
import numpy as np

from .. import analyze, visualize  # noqa: F401  (analyze kept for API parity)
from .. import rle as RLE
from ..structures import (InstanceSet, Instances, boxes_to_array, mask_areas,
                          masks_to_rle)
from ..utils.io import gray2rgb, imread


def _rle_satellite_match(particles, satellites, match_thresh=0.5):
    """Match each satellite to the particle it overlaps most.

    Reference: powder.py:28-112. For each satellite the intersection
    fraction (satellite ∩ particle) / area(satellite) is computed against
    all particles; the best particle wins if the fraction exceeds
    ``match_thresh``. Satellites match at most one particle; particles may
    collect many satellites.
    """
    particles = masks_to_rle(particles)
    satellites = masks_to_rle(satellites)

    satellite_matches = []
    intersection_scores = []
    particles_matched_bool = np.zeros(len(particles), dtype=bool)
    satellites_unmatched = []

    for satellite_idx, satellite_mask in enumerate(satellites):
        sat_area = float(RLE.area(satellite_mask))
        inter = RLE.intersect_areas(satellite_mask, particles).astype(
            np.float64)
        intersects = inter / sat_area if sat_area else inter

        iscore_amax = int(np.argmax(intersects))
        iscore_max = intersects[iscore_amax]

        if iscore_max > match_thresh:
            satellite_matches.append([satellite_idx, iscore_amax])
            particles_matched_bool[iscore_amax] = True
            intersection_scores.append(iscore_max)
        else:
            satellites_unmatched.append(satellite_idx)

    particles_unmatched = np.array(
        [i for i, matched in enumerate(particles_matched_bool)
         if not matched], np.int64)
    satellite_matches = np.asarray(satellite_matches, np.int64)
    satellites_unmatched = np.asarray(satellites_unmatched, np.int64)
    intersection_scores = np.asarray(intersection_scores)

    if satellite_matches.size:
        match_pairs = {x: [] for x in np.unique(satellite_matches[:, 1])}
        for match in satellite_matches:
            match_pairs[match[1]].append(match[0])
    else:
        match_pairs = {}

    return {'satellite_matches': satellite_matches,
            'satellites_unmatched': satellites_unmatched,
            'particles_unmatched': particles_unmatched,
            'intersection_scores': intersection_scores,
            'match_pairs': match_pairs}


class PowderSatelliteImage:
    """Powder + satellite instance predictions for a single image.

    Reference: powder.py:115-285.
    """

    def __init__(self, particles=None, satellites=None, matches=None):
        self.particles = particles
        self.satellites = satellites
        self.matches = matches

    def compute_matches(self, thresh=0.5):
        """Match satellite masks to particle masks (reference powder.py:138)."""
        self.matches = _rle_satellite_match(self.particles.instances,
                                            self.satellites.instances, thresh)

    def visualize_particle_with_satellites(self, p_idx, ax=None):
        """Crop to a particle and its satellites and display the overlay.

        Reference: powder.py:155-219.
        """
        particle_mask = self.particles.instances[[p_idx]]
        particle_mask = masks_to_rle(particle_mask)

        particle_box = self.particles.instances.boxes[[p_idx]]
        particle_box = boxes_to_array(particle_box)
        particle_class_idx = np.zeros([1], np.int64)

        s_idx = self.matches['match_pairs'][p_idx]
        satellite_masks = self.satellites.instances[s_idx]
        satellite_masks = masks_to_rle(satellite_masks)

        satellite_box = self.satellites.instances.boxes[s_idx]
        satellite_box = boxes_to_array(satellite_box)
        satellite_class_idx = np.ones(len(satellite_box), np.int64)

        masks = particle_mask + satellite_masks
        boxes = np.concatenate((particle_box, satellite_box),
                               axis=0).astype(np.int64)
        labels = np.concatenate((particle_class_idx, satellite_class_idx),
                                axis=0)
        label_map = {'thing_classes': ['particle', 'satellite']}

        minbox = boxes[:, :2].min(axis=0)
        maxbox = boxes[:, 2:].max(axis=0)
        total_box = np.concatenate((minbox, maxbox), axis=0)
        c1, r1, c2, r2 = total_box

        img = imread(self.particles.filepath)
        img = gray2rgb(img)
        img = img[r1:r2, c1:c2]

        masks = RLE.decode(masks)
        masks = masks[r1:r2, c1:c2, :]
        masks = RLE.encode(np.asfortranarray(masks))

        boxes[:, [0, 2]] -= c1
        boxes[:, [1, 3]] -= r1

        image_size = (r2 - r1, c2 - c1)
        instances = Instances(image_size, masks=masks, boxes=boxes,
                              class_idx=labels)
        iset = InstanceSet(instances=instances)
        iset.instances.colors = visualize.random_colors(
            len(iset.instances), iset.randomstate)
        visualize.display_iset(img, iset, label_map, ax=ax)

    def compute_satellite_metrics(self):
        """Counts + mask areas of matched/all particles (powder.py:221-273)."""
        assert None not in (self.particles, self.satellites, self.matches)

        n_satellites = len(self.satellites.instances)
        matched_particle_idx = list(self.matches['match_pairs'])
        n_particles_matched = len(matched_particle_idx)
        n_particles_all = len(self.particles.instances)

        particle_masks_all = masks_to_rle(self.particles.instances.masks.rle)
        mask_areas_all = RLE.area(particle_masks_all)
        mask_areas_matched = mask_areas_all[matched_particle_idx]

        return {'n_satellites': n_satellites,
                'n_particles_matched': n_particles_matched,
                'n_particles_all': n_particles_all,
                'mask_areas_matched': mask_areas_matched,
                'mask_areas_all': mask_areas_all}

    def copy(self):
        """Deep copy (reference powder.py:275-285)."""
        return copy.deepcopy(self)


def psd(particles, xvals='d_eq', yvals='cvf', c=None, distance='length',
        ax=None, plot=True, return_results=False):
    r"""Cumulative particle size distribution from segmentation masks.

    Reference: powder.py:288-461. Mask areas -> equivalent circle diameter
    d_eq = 2 sqrt(A / pi); cumulative volume fraction uses
    V = 4/3 pi^(-1/2) A^(3/2). Pixel -> length conversion from HFW / image
    width when available.

    Note the reference had a parenthesis bug at powder.py:363
    (``type(x == InstanceSet)``) that made its array/list input branch
    unreachable; here the branch works as documented.
    """
    if isinstance(c, tuple):
        length_units = c[1]
        c = c[0]
    else:
        length_units = ''

    if isinstance(particles, (InstanceSet, PowderSatelliteImage)):
        particles = [particles]
    if isinstance(particles[0], PowderSatelliteImage):
        particles = [x.particles for x in particles]

    if isinstance(particles[0], InstanceSet):
        areas = [mask_areas(x) for x in particles]
    elif isinstance(particles[0], (np.ndarray, list)):
        areas = [np.asarray(x) for x in particles]
    else:
        raise ValueError('particles must contain InstanceSet, '
                         'PowderSatelliteImage, arrays, or lists')

    if distance.lower() == 'length':
        if c is None:
            if isinstance(particles[0], InstanceSet):
                if particles[0].HFW is not None:
                    HFW = [x.HFW for x in particles]
                    assert all(x is not None for x in HFW), \
                        'all HFW values must be specified if c is not defined'
                    for iset in particles:
                        assert iset.HFW_units == particles[0].HFW_units, \
                            'all HFW values should have same units'
                    length_units = particles[0].HFW_units
                    HFW = np.asarray([x.HFW for x in particles])
                    image_widths = np.asarray(
                        [x.instances.image_size[1] for x in particles],
                        np.int64)
                    c = [h / w for h, w in zip(HFW, image_widths)]
                else:
                    raise ValueError(
                        'Cannot infer c because HFW is not defined')
            else:
                raise ValueError(
                    'Cannot infer c from particles (must be list of '
                    'InstanceSet or PowderSatelliteImage objects)')

        if isinstance(c, (list, np.ndarray)):
            assert len(c) == len(areas), (
                'if c (or c[0] if passed as tuple) is a list or array it '
                'must have the same length as particles.')
            areas = [a_i * c_i ** 2 for a_i, c_i in zip(areas, c)]
        elif isinstance(c, (int, float)):
            areas = [a_i * c ** 2 for a_i in areas]
        else:
            raise ValueError('c (or c[0] if passed as tuple) must be a '
                             'list, array, int, or float')
    elif distance.lower() == 'pixels':
        length_units = 'px'
    else:
        raise ValueError('distance must be "length" or "pixels"')

    if isinstance(areas[0], (list, np.ndarray)):
        areas = np.concatenate(areas, axis=0)

    unique, counts = np.unique(areas, return_counts=True)
    if xvals.lower() == 'd_eq':
        unique = 2 * np.sqrt(unique / np.pi)
        xlabel = 'Equivalent diameter{}'.format(
            ', {}'.format(length_units) if length_units else '')
    elif xvals.lower() == 'area':
        xlabel = 'Mask area{}'.format(
            '- ${}^2$'.format(length_units) if length_units else '')
    else:
        raise ValueError('xvals must be "d_eq" or "area"')

    if yvals.lower() == 'cvf':
        volumes = 4 / 3 * np.pi ** (-1 / 2) * unique ** (3 / 2)
        counts = volumes * counts
        ylabel = 'cumulative volume fraction'
    elif yvals.lower() == 'counts':
        ylabel = 'counts (cumulative)'
    else:
        raise ValueError('yvals must be "cvf" or "counts"')

    counts = np.asarray(counts, dtype=np.float64).cumsum()
    counts = counts / counts[-1]

    x = unique
    y = counts

    if plot or ax is not None:
        if ax is None:
            fig, ax = plt.subplots(dpi=300)
        ax.grid(axis='both', which='both', color=(0.85, 0.85, 0.85),
                linewidth=1, linestyle='--')
        ax.plot(x, y, '-.k')
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
    if plot:
        plt.show()

    if return_results:
        return {'x': x, 'y': y, 'x_label': xlabel, 'y_label': ylabel}


def satellite_measurements(psi, print_summary=True, output_dict=False):
    """Aggregate satellite content measurements over a list of images.

    Reference: powder.py:463-569. Reports image/particle/satellite counts,
    satellite fraction, and the satellites-per-particle distribution.
    """
    if isinstance(psi, PowderSatelliteImage):
        psi = [psi]
    assert all(isinstance(x, PowderSatelliteImage) for x in psi), \
        'psi must be list of PowderSatelliteImage objects!'

    matches = [x.matches for x in psi]
    if any(x is None for x in matches):
        for x in psi:
            x.compute_matches()
        matches = [x.matches for x in psi]

    n_images = len(psi)
    n_particles_matched = sum(len(x['match_pairs'].keys()) for x in matches)
    n_particles = n_particles_matched + sum(
        len(x['particles_unmatched']) for x in matches)

    spp_list = []
    for m in matches:
        for v in m['match_pairs'].values():
            spp_list.append(len(v))
    spp_list = np.asarray(spp_list)
    n_satellites_matched = int(spp_list.sum()) if spp_list.size else 0
    mspp = float(np.median(spp_list)) if spp_list.size else 0.0

    n_satellites_unmatched = sum(
        len(x['satellites_unmatched']) for x in matches)
    sat_frac = n_particles_matched / n_particles if n_particles else 0.0

    unique, counts = np.unique(spp_list, return_counts=True)
    assert counts.sum() == n_particles_matched
    assert n_particles == sum(len(x.particles.instances) for x in psi)
    assert (n_satellites_matched + n_satellites_unmatched
            == sum(len(x.satellites.instances) for x in psi))

    counts = counts.cumsum() / counts.sum() if counts.size else counts

    keys = ['n_images', 'n_particles', 'n_satellites',
            'n_satellites_unmatched', 'n_satellited_particels', 'sat_frac',
            'mspp', 'unique_satellites_per_particle',
            'counts_satellites_per_particle']
    labels = ['number of images',
              'number of particles',
              'number of matched satellites',
              'number of unmatched satellites',
              'number of satellited particles',
              'fraction of satellited particles',
              'median number of satellites per\n'
              'satellited particle             ']
    values = [n_images, n_particles, n_satellites_matched,
              n_satellites_unmatched, n_particles_matched, sat_frac, mspp,
              unique, counts]

    if print_summary:
        for lab, v in zip(labels, values[:-2]):
            print('{:35}\t{}'.format(lab, v))
    if output_dict:
        return dict(zip(keys, values))
