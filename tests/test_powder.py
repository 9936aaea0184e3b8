import numpy as np
import pytest

from ampis_tpu import rle
from ampis_tpu.applications import powder
from ampis_tpu.structures import InstanceSet, Instances, RLEMasks


def _iset(mask_list, size=(32, 32), filepath="im.png"):
    rles = [rle.encode(np.asfortranarray(m.astype(np.uint8)))
            for m in mask_list]
    bbs = rle.toBbox(rles)
    boxes = np.stack([bbs[:, 0], bbs[:, 1], bbs[:, 0] + bbs[:, 2],
                      bbs[:, 1] + bbs[:, 3]], axis=1)
    iset = InstanceSet(filepath=filepath, randomstate=0)
    iset.instances = Instances(size, masks=RLEMasks(rles), boxes=boxes)
    return iset


@pytest.fixture
def psi():
    h = w = 32
    p1 = np.zeros((h, w), bool)
    p1[4:16, 4:16] = True
    p2 = np.zeros((h, w), bool)
    p2[20:30, 20:30] = True
    # satellite fully on p1
    s1 = np.zeros((h, w), bool)
    s1[6:9, 6:9] = True
    # satellite half-on p2 (overlap fraction > 0.5)
    s2 = np.zeros((h, w), bool)
    s2[19:23, 21:24] = True  # rows 20:23 overlap of 4 rows -> 9/12
    # satellite nowhere
    s3 = np.zeros((h, w), bool)
    s3[0:3, 28:31] = True
    obj = powder.PowderSatelliteImage(
        particles=_iset([p1, p2]), satellites=_iset([s1, s2, s3]))
    obj.compute_matches()
    return obj


def test_satellite_match(psi):
    m = psi.matches
    assert sorted(map(tuple, m['satellite_matches'])) == [(0, 0), (1, 1)]
    assert list(m['satellites_unmatched']) == [2]
    assert list(m['particles_unmatched']) == []
    assert m['match_pairs'] == {0: [0], 1: [1]}
    np.testing.assert_allclose(m['intersection_scores'], [1.0, 9 / 12])


def test_satellite_match_threshold(psi):
    psi.compute_matches(thresh=0.9)
    m = psi.matches
    assert list(m['satellite_matches'].flatten()) == [0, 0]
    assert sorted(m['satellites_unmatched']) == [1, 2]


def test_compute_satellite_metrics(psi):
    res = psi.compute_satellite_metrics()
    assert res['n_satellites'] == 3
    assert res['n_particles_matched'] == 2
    assert res['n_particles_all'] == 2
    assert np.array_equal(res['mask_areas_all'], [144, 100])
    assert np.array_equal(res['mask_areas_matched'], [144, 100])


def test_satellite_measurements(psi, capsys):
    out = powder.satellite_measurements([psi], print_summary=True,
                                        output_dict=True)
    captured = capsys.readouterr().out
    assert 'number of particles' in captured
    assert out['n_images'] == 1
    assert out['n_particles'] == 2
    assert out['n_satellites'] == 2
    assert out['n_satellites_unmatched'] == 1
    assert out['sat_frac'] == 1.0
    assert out['mspp'] == 1.0


def test_psd_counts_pixels(psi):
    res = powder.psd([psi.particles], xvals='area', yvals='counts',
                     distance='pixels', plot=False, return_results=True)
    assert res['y'][-1] == 1.0
    assert set(res['x']) == {100.0, 144.0}


def test_psd_d_eq_cvf_with_hfw():
    m = np.zeros((10, 20), bool)
    m[2:6, 3:8] = True
    iset = _iset([m], size=(10, 20))
    iset.HFW = 40.0
    iset.HFW_units = 'um'
    res = powder.psd([iset], xvals='d_eq', yvals='cvf', plot=False,
                     return_results=True)
    # c = 40/20 = 2 um/px; area 20 px = 80 um^2; d_eq = 2*sqrt(80/pi)
    np.testing.assert_allclose(res['x'], [2 * np.sqrt(80 / np.pi)])
    assert res['x_label'].endswith('um')
    assert res['y'][-1] == 1.0


def test_psd_accepts_raw_areas():
    res = powder.psd([np.array([10.0, 20.0, 30.0])], xvals='area',
                     yvals='counts', c=1.0, plot=False, return_results=True)
    assert len(res['x']) == 3
    np.testing.assert_allclose(res['y'], [1 / 3, 2 / 3, 1.0])


def test_shipped_powder_pipeline(reference_root):
    """End-to-end: shipped particle+satellite predictions -> matching ->
    satellite stats (BASELINE config 3 without the model)."""
    from ampis_tpu.compat import load_pickle
    particles = load_pickle(
        reference_root / "examples/powder/data/sample_particle_outputs.pickle")
    satellites = load_pickle(
        reference_root /
        "examples/powder/data/sample_satellite_outputs.pickle")
    p_sets = [InstanceSet(randomstate=0).read_from_model_out(o, inplace=False)
              for o in particles]
    s_sets = [InstanceSet(randomstate=0).read_from_model_out(o, inplace=False)
              for o in satellites]
    from ampis_tpu import analyze
    p_sets, s_sets = analyze.align_instance_sets(p_sets, s_sets)
    assert len(p_sets) >= 2
    psis = []
    for p, s in zip(p_sets[:2], s_sets[:2]):
        obj = powder.PowderSatelliteImage(particles=p, satellites=s)
        obj.compute_matches()
        psis.append(obj)
    out = powder.satellite_measurements(psis, print_summary=False,
                                        output_dict=True)
    assert out['n_particles'] > 100
    assert 0 < out['sat_frac'] < 1
    assert out['n_satellites'] > 0
