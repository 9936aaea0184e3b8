"""Powder sample characterization from instance masks.

Covers the behavior of the reference's ampis/applications/powder.py
(satellite<->particle matching, per-image satellite metrics, cumulative
particle size distributions, aggregate satellite statistics) with a
vectorized design: the reference's per-satellite python loop over C calls
(reference powder.py:82-83) is a single multithreaded C++ crowd-IoU call
producing the full (satellites x particles) overlap-fraction matrix.

Output schemas (dict keys, printed labels, including the reference's
``n_satellited_particels`` typo-key) are pinned for API parity; the
implementations are this codebase's own.
"""
from __future__ import annotations

import copy

import matplotlib.pyplot as plt
import numpy as np

from .. import analyze, visualize  # noqa: F401  (analyze kept for API parity)
from .. import rle as RLE
from ..structures import (InstanceSet, Instances, RLEMasks, boxes_to_array,
                          mask_areas, masks_to_rle)
from ..utils.io import gray2rgb, imread


def _overlap_fractions(satellites, particles):
    """(S, P) matrix of area(sat ∩ particle) / area(sat).

    One batched C++ call: COCO crowd-IoU semantics normalize the
    intersection by the detection (satellite) area, which is exactly the
    reference's matching score (reference powder.py:82-83).
    """
    crowd = np.ones(len(particles), dtype=bool)
    frac = RLE.iou(satellites, particles, crowd)
    return np.nan_to_num(np.asarray(frac, np.float64))


def _rle_satellite_match(particles, satellites, match_thresh=0.5):
    """Assign each satellite to the particle it overlaps most.

    Reference behavior (powder.py:28-112): a satellite matches the single
    particle with the highest overlap fraction, provided that fraction
    exceeds ``match_thresh``; a particle may collect any number of
    satellites. Returns the same five-key dict as the reference.
    """
    particles = masks_to_rle(particles)
    satellites = masks_to_rle(satellites)
    n_s, n_p = len(satellites), len(particles)

    frac = _overlap_fractions(satellites, particles)  # (S, P)
    if frac.size:
        best_particle = frac.argmax(axis=1)
        best_frac = frac[np.arange(n_s), best_particle]
    else:
        best_particle = np.zeros(n_s, np.int64)
        best_frac = np.zeros(n_s)
    hit = best_frac > match_thresh

    sat_ids = np.arange(n_s, dtype=np.int64)
    pairs = np.stack([sat_ids[hit], best_particle[hit].astype(np.int64)],
                     axis=1) if hit.any() else np.empty((0, 2), np.int64)

    particle_hit = np.zeros(n_p, dtype=bool)
    particle_hit[pairs[:, 1]] = True

    # particle index -> list of its satellites, insertion-ordered by
    # satellite index (matches the reference's accumulation order)
    by_particle = {}
    for s, p in pairs:
        by_particle.setdefault(p, []).append(s)

    return {'satellite_matches': pairs,
            'satellites_unmatched': sat_ids[~hit],
            'particles_unmatched': np.flatnonzero(~particle_hit),
            'intersection_scores': best_frac[hit],
            'match_pairs': by_particle}


def _crop_instances_to_window(rles, boxes, window):
    """Decode, crop to the (c1, r1, c2, r2) window, re-encode; shift boxes."""
    c1, r1, c2, r2 = window
    dense = RLE.decode(list(rles))[r1:r2, c1:c2, :]
    cropped = RLE.encode(np.asfortranarray(dense))
    shifted = boxes - np.asarray([c1, r1, c1, r1])
    return cropped, shifted


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
        """Crop to one particle + its matched satellites and overlay them.

        Reference: powder.py:155-219. Class 0 = particle, 1 = satellite.
        """
        sat_idx = self.matches['match_pairs'][p_idx]
        group = [(self.particles.instances, [p_idx], 0),
                 (self.satellites.instances, sat_idx, 1)]

        rles, boxes, classes = [], [], []
        for inst, idx, cls in group:
            rles.extend(masks_to_rle(inst[list(idx)]))
            boxes.append(boxes_to_array(inst.boxes[list(idx)]))
            classes.append(np.full(len(idx), cls, np.int64))
        boxes = np.concatenate(boxes, axis=0).astype(np.int64)
        classes = np.concatenate(classes)

        # tight window around the union of all member boxes
        c1, r1 = boxes[:, :2].min(axis=0)
        c2, r2 = boxes[:, 2:].max(axis=0)
        rles, boxes = _crop_instances_to_window(rles, boxes, (c1, r1, c2, r2))

        image = gray2rgb(imread(self.particles.filepath))[r1:r2, c1:c2]

        inst = Instances((r2 - r1, c2 - c1), masks=RLEMasks(list(rles)),
                         boxes=boxes, class_idx=classes)
        iset = InstanceSet(instances=inst)
        iset.instances.colors = visualize.random_colors(len(inst),
                                                        iset.randomstate)
        visualize.display_iset(
            image, iset, {'thing_classes': ['particle', 'satellite']}, ax=ax)

    def compute_satellite_metrics(self):
        """Counts + mask areas of matched/all particles (powder.py:221-273)."""
        assert None not in (self.particles, self.satellites, self.matches)
        areas = np.asarray(RLE.area(
            masks_to_rle(self.particles.instances.masks.rle)))
        matched = np.asarray(sorted(self.matches['match_pairs']), np.int64)
        return {'n_satellites': len(self.satellites.instances),
                'n_particles_matched': len(matched),
                'n_particles_all': len(self.particles.instances),
                'mask_areas_matched': areas[matched],
                'mask_areas_all': areas}

    def copy(self):
        """Deep copy (reference powder.py:275-285)."""
        return copy.deepcopy(self)


# --------------------------------------------------------------------- psd

def _gather_mask_areas(particles):
    """Normalize psd() input to (list of per-image area arrays, isets?)."""
    if isinstance(particles, (InstanceSet, PowderSatelliteImage)):
        particles = [particles]
    if isinstance(particles[0], PowderSatelliteImage):
        particles = [x.particles for x in particles]
    if isinstance(particles[0], InstanceSet):
        return [np.asarray(mask_areas(x), np.float64) for x in particles], \
            particles
    if isinstance(particles[0], (np.ndarray, list)):
        return [np.asarray(x, np.float64) for x in particles], None
    raise ValueError('particles must contain InstanceSet, '
                     'PowderSatelliteImage, arrays, or lists')


def _scale_from_hfw(isets):
    """Per-image px->length factor from HFW / image width; single units."""
    if isets is None:
        raise ValueError('Cannot infer c from particles (must be list of '
                         'InstanceSet or PowderSatelliteImage objects)')
    if isets[0].HFW is None:
        raise ValueError('Cannot infer c because HFW is not defined')
    hfws = [x.HFW for x in isets]
    assert all(h is not None for h in hfws), \
        'all HFW values must be specified if c is not defined'
    units = {x.HFW_units for x in isets}
    assert len(units) == 1, 'all HFW values should have same units'
    widths = [x.instances.image_size[1] for x in isets]
    return [h / w for h, w in zip(hfws, widths)], units.pop()


def psd(particles, xvals='d_eq', yvals='cvf', c=None, distance='length',
        ax=None, plot=True, return_results=False):
    r"""Cumulative particle size distribution from segmentation masks.

    Reference: powder.py:288-461. Mask areas -> equivalent circle diameter
    d_eq = 2 sqrt(A / pi); cumulative volume fraction weights each size by
    V = 4/3 pi^(-1/2) A^(3/2). Pixel -> length conversion ``c`` (scalar or
    per-image) defaults to HFW / image width.

    Note the reference had a parenthesis bug at powder.py:363
    (``type(x == InstanceSet)``) that made its array/list input branch
    unreachable; here the branch works as documented.
    """
    c, length_units = (c if isinstance(c, tuple) else (c, ''))

    areas, isets = _gather_mask_areas(particles)

    if distance.lower() == 'length':
        if c is None:
            c, length_units = _scale_from_hfw(isets)
        if np.isscalar(c):
            c = [c] * len(areas)
        elif not isinstance(c, (list, np.ndarray)):
            raise ValueError('c (or c[0] if passed as tuple) must be a '
                             'list, array, int, or float')
        assert len(c) == len(areas), (
            'if c (or c[0] if passed as tuple) is a list or array it '
            'must have the same length as particles.')
        areas = [a * s ** 2 for a, s in zip(areas, c)]
    elif distance.lower() == 'pixels':
        length_units = 'px'
    else:
        raise ValueError('distance must be "length" or "pixels"')

    size, multiplicity = np.unique(np.concatenate(areas), return_counts=True)

    if xvals.lower() == 'd_eq':
        x = 2.0 * np.sqrt(size / np.pi)
        xlabel = 'Equivalent diameter' + (
            f', {length_units}' if length_units else '')
    elif xvals.lower() == 'area':
        x = size
        xlabel = 'Mask area' + (
            f'- ${length_units}^2$' if length_units else '')
    else:
        raise ValueError('xvals must be "d_eq" or "area"')

    if yvals.lower() == 'cvf':
        weight = multiplicity * (4.0 / 3.0) * size ** 1.5 / np.sqrt(np.pi)
        ylabel = 'cumulative volume fraction'
    elif yvals.lower() == 'counts':
        weight = multiplicity.astype(np.float64)
        ylabel = 'counts (cumulative)'
    else:
        raise ValueError('yvals must be "cvf" or "counts"')

    y = weight.cumsum()
    y /= y[-1]

    if plot or ax is not None:
        if ax is None:
            _, ax = plt.subplots(dpi=300)
        ax.grid(axis='both', which='both', color=(0.85, 0.85, 0.85),
                linewidth=1, linestyle='--')
        ax.plot(x, y, '-.k')
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
    if plot:
        plt.show()

    if return_results:
        return {'x': x, 'y': y, 'x_label': xlabel, 'y_label': ylabel}


# -------------------------------------------------- aggregate statistics

def satellite_measurements(psi, print_summary=True, output_dict=False):
    """Aggregate satellite content measurements over a list of images.

    Reference: powder.py:463-569, including its conservation asserts.
    ``n_satellited_particels`` is the reference's typo-key, kept
    deliberately so downstream consumers of the dict keep working.
    """
    if isinstance(psi, PowderSatelliteImage):
        psi = [psi]
    assert all(isinstance(x, PowderSatelliteImage) for x in psi), \
        'psi must be list of PowderSatelliteImage objects!'
    for x in psi:
        if x.matches is None:
            x.compute_matches()

    matches = [x.matches for x in psi]
    # satellites-per-particle, one entry per satellited particle
    spp = np.asarray([len(sats) for m in matches
                      for sats in m['match_pairs'].values()], np.int64)

    n_satellited = len(spp)
    n_particles = n_satellited + sum(len(m['particles_unmatched'])
                                     for m in matches)
    n_sat_matched = int(spp.sum())
    n_sat_unmatched = sum(len(m['satellites_unmatched']) for m in matches)

    # conservation checks (reference powder.py:543-545)
    assert n_particles == sum(len(x.particles.instances) for x in psi)
    assert n_sat_matched + n_sat_unmatched == sum(
        len(x.satellites.instances) for x in psi)

    spp_values, spp_counts = np.unique(spp, return_counts=True)
    assert spp_counts.sum() == n_satellited
    spp_cdf = (spp_counts.cumsum() / spp_counts.sum()
               if spp_counts.size else spp_counts)

    stats = {
        'n_images': len(psi),
        'n_particles': n_particles,
        'n_satellites': n_sat_matched,
        'n_satellites_unmatched': n_sat_unmatched,
        'n_satellited_particels': n_satellited,  # reference typo-key
        'sat_frac': n_satellited / n_particles if n_particles else 0.0,
        'mspp': float(np.median(spp)) if spp.size else 0.0,
        'unique_satellites_per_particle': spp_values,
        'counts_satellites_per_particle': spp_cdf,
    }

    if print_summary:
        labels = {
            'n_images': 'number of images',
            'n_particles': 'number of particles',
            'n_satellites': 'number of matched satellites',
            'n_satellites_unmatched': 'number of unmatched satellites',
            'n_satellited_particels': 'number of satellited particles',
            'sat_frac': 'fraction of satellited particles',
            'mspp': 'median number of satellites per\n'
                    'satellited particle             ',
        }
        for key, label in labels.items():
            print('{:35}\t{}'.format(label, stats[key]))
    if output_dict:
        return stats
