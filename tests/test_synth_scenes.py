"""Generator invariants for the synthetic pretraining scenes.

tools/synth_scenes.py supplies the full-detector pretraining data
(docs/parity.md "Synthetic-scene full-detector pretraining"); these pin
the annotation contract the trainer depends on: visible-region masks
are disjoint per annotation set, attached satellites merge into their
host particle instance (the convention measured from the shipped GT),
and every satellite's mask lies inside some particle instance's mask.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import synth_scenes as sg  # noqa: E402


def _scene(seed=3, size=256):
    rng = np.random.default_rng(seed)
    img, idmap, parts, rendered = sg.make_scene(rng, size=size,
                                                max_parts=40, max_sats=20)
    return img, idmap, parts, rendered


def test_scene_renders_dense_instances():
    img, idmap, parts, rendered = _scene()
    assert img.shape == (256, 256) and img.dtype == np.uint8
    pm, sm = sg.masks_from_idmap(idmap, parts, rendered)
    assert len(pm) >= 5
    # nonempty, bounded coverage (diameters scale with scene size, so a
    # 256-px test scene is sparser than the 704-px production scenes)
    union = np.zeros_like(pm[0])
    for m in pm:
        union |= m
    assert 0.05 < union.mean() < 0.95


def test_particle_masks_disjoint_and_satellites_covered():
    img, idmap, parts, rendered = _scene(seed=11)
    pm, sm = sg.masks_from_idmap(idmap, parts, rendered)
    acc = np.zeros(idmap.shape, np.int32)
    for m in pm:
        acc += m
    assert acc.max() <= 1, "visible particle masks must be disjoint"
    acc_s = np.zeros(idmap.shape, np.int32)
    for m in sm:
        acc_s += m
    assert acc_s.max() <= 1, "satellite masks must be disjoint"
    if sm:
        punion = acc > 0
        for m in sm:
            # attached satellites merge into the host instance, so the
            # satellite's visible area is inside the particle union
            assert (m & punion).sum() == m.sum()


def test_generation_is_deterministic():
    a = _scene(seed=7)
    b = _scene(seed=7)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_rle_encoding_roundtrip():
    from ampis_tpu import rle as RLE
    img, idmap, parts, rendered = _scene(seed=5)
    pm, _ = sg.masks_from_idmap(idmap, parts, rendered)
    segs = sg.encode(pm[:5])
    for seg, m in zip(segs, pm[:5]):
        dec = RLE.decode({"size": seg["size"],
                          "counts": seg["counts"].encode("ascii")})
        assert np.array_equal(np.asarray(dec, bool), m)
