"""DeviceBatcher (engine.device_cache) vs the streaming loader.

The device-resident cache must yield batches identical to
DetectionLoader.infinite() — same plan RNG, same pixel content — while
uploading each (image, min_size, flip) variant host->device exactly once
and assembling batches on-device.
"""
import numpy as np
import pytest
from PIL import Image

from ampis_tpu import rle as RLE

# compile-heavy layer: full model programs compile for minutes on
# the CPU mesh; run via the full suite, not `pytest -m 'not slow'`
pytestmark = pytest.mark.slow
from ampis_tpu.engine.config import get_cfg
from ampis_tpu.engine.data import DetectionLoader
from ampis_tpu.engine.device_cache import DeviceBatcher
from ampis_tpu.structures import BoxMode


@pytest.fixture(scope="module")
def ddicts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("devcache")
    rs = np.random.RandomState(3)
    out = []
    for i in range(3):
        img = (rs.rand(60, 80) * 255).astype(np.uint8)
        p = str(tmp / f"im{i}.png")
        Image.fromarray(img).save(p)
        annos = []
        for _ in range(2):
            r0, c0 = rs.randint(2, 30), rs.randint(2, 40)
            m = np.zeros((60, 80), np.uint8, order="F")
            m[r0:r0 + 20, c0:c0 + 25] = 1
            annos.append({"bbox": np.array([c0, r0, c0 + 25, r0 + 20],
                                           np.float64),
                          "bbox_mode": BoxMode.XYXY_ABS,
                          "segmentation": RLE.encode(np.asfortranarray(m)),
                          "category_id": 0})
        out.append({"file_name": p, "height": 60, "width": 80,
                    "mask_format": "bitmask", "image_id": i,
                    "annotations": annos, "num_instances": 2})
    return out


def _cfg():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (48, 60)
    cfg.INPUT.MAX_SIZE_TRAIN = 80
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.MASK_CANVAS = 32
    return cfg


ARRAY_KEYS = ("images", "gt_boxes", "gt_classes", "gt_valid", "gt_masks",
              "gt_mask_meta")


def test_batches_identical_to_streaming(ddicts):
    cfg = _cfg()
    stream = DetectionLoader(ddicts, cfg, train=True, seed=7)
    cached = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True, seed=7))
    it_s, it_c = stream.infinite(prefetch=0), cached.infinite()
    for _ in range(6):
        bs, bc = next(it_s), next(it_c)
        assert tuple(bs["new_shape"]) == tuple(bc["new_shape"])
        assert tuple(bs["canvas"]) == tuple(bc["canvas"])
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)


def test_uploads_bounded_by_variant_count(ddicts):
    cfg = _cfg()
    loader = DetectionLoader(ddicts, cfg, train=True, seed=0)
    batcher = DeviceBatcher(loader)
    it = batcher.infinite()
    for _ in range(30):
        next(it)
    # 3 images x 2 min_sizes x 2 flips
    assert batcher.n_cached <= 12
    assert batcher.cached_bytes > 0
    # cached entries are reused, not re-uploaded: pulling more batches
    # cannot grow the cache beyond the variant space
    n = batcher.n_cached
    for _ in range(30):
        next(it)
    assert batcher.n_cached <= 12 and batcher.n_cached >= n


def test_cap_streams_with_one_warning(ddicts):
    cfg = _cfg()
    stream = DetectionLoader(ddicts, cfg, train=True, seed=5)
    batcher = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True, seed=5),
                            max_bytes=1)
    it_s, it_c = stream.infinite(prefetch=0), batcher.infinite()
    with pytest.warns(UserWarning, match="device data cache full"):
        bs, bc = next(it_s), next(it_c)
    for k in ARRAY_KEYS:
        np.testing.assert_array_equal(np.asarray(bs[k]), np.asarray(bc[k]))
    assert batcher.n_cached == 0
    # warning fires once; batches keep flowing
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        next(it_c)


def test_cap_overflow_materializes_once(ddicts):
    """Over-cap variants come from the host-side materialization cache:
    the expensive augmentation pipeline runs once per variant even when
    HBM residency is exhausted (each draw then pays only the upload)."""
    cfg = _cfg()
    loader = DetectionLoader(ddicts, cfg, train=True, seed=5)
    calls = {}
    orig = loader.sample

    def counting_sample(idx, min_size, flip=False):
        key = (int(idx), int(min_size), int(flip))
        calls[key] = calls.get(key, 0) + 1
        return orig(idx, min_size, flip=flip)

    loader.sample = counting_sample
    batcher = DeviceBatcher(loader, max_bytes=1)
    it = batcher.infinite()
    with pytest.warns(UserWarning):
        for _ in range(25):
            next(it)
    assert batcher.n_cached == 0
    assert calls and all(v == 1 for v in calls.values()), calls
    # and batches still match the plain streaming loader bit-for-bit
    stream = DetectionLoader(ddicts, cfg, train=True, seed=5)
    it_s = stream.infinite(prefetch=0)
    it_c = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True, seed=5),
                         max_bytes=1).infinite()
    with pytest.warns(UserWarning):
        for _ in range(6):
            bs, bc = next(it_s), next(it_c)
            for k in ARRAY_KEYS:
                np.testing.assert_array_equal(np.asarray(bs[k]),
                                              np.asarray(bc[k]))


def test_footprint_estimate_matches_measured(ddicts):
    """variant_nbytes() (the upfront cap-sizing warning's estimate) is
    the true per-variant host->device footprint."""
    cfg = _cfg()
    loader = DetectionLoader(ddicts, cfg, train=True, seed=0)
    arrays, _ = loader.sample(0, loader.min_sizes[0], flip=0)
    measured = sum(a.nbytes for a in arrays.values())
    assert loader.variant_nbytes() == measured
    assert loader.n_variants() == len(ddicts) * len(loader.min_sizes) * 2


def test_validation_single_pass_unchanged(ddicts):
    """__iter__ (validation path) is untouched by the refactor."""
    cfg = _cfg()
    loader = DetectionLoader(ddicts, cfg, train=False, batch_size=2)
    batches = list(loader)
    assert len(batches) == 2  # 3 images wrap to 2 batches of 2
    assert batches[0]["images"].shape[0] == 2


def test_mixed_raw_sizes_batch_and_cache(tmp_path):
    """Images of slightly different raw sizes share one raw canvas.

    Regression: spheroidite images vary 481-484 px in height; batches
    must stack (streaming and cached) with GT scaled consistently off
    the shared canvas.
    """
    rs = np.random.RandomState(0)
    dd = []
    for i, (h, w) in enumerate([(60, 80), (57, 80), (59, 78)]):
        img = (rs.rand(h, w) * 255).astype(np.uint8)
        p = str(tmp_path / f"m{i}.png")
        Image.fromarray(img).save(p)
        m = np.zeros((h, w), np.uint8, order="F")
        m[5:25, 10:30] = 1
        dd.append({"file_name": p, "height": h, "width": w,
                   "mask_format": "bitmask", "image_id": i,
                   "annotations": [{
                       "bbox": np.array([10, 5, 30, 25], np.float64),
                       "bbox_mode": BoxMode.XYXY_ABS,
                       "segmentation": RLE.encode(np.asfortranarray(m)),
                       "category_id": 0}],
                   "num_instances": 1})
    cfg = _cfg()
    loader = DetectionLoader(dd, cfg, train=True, seed=1)
    assert loader.raw_shape == (60, 80)
    batcher = DeviceBatcher(DetectionLoader(dd, cfg, train=True, seed=1))
    it_s = loader.infinite(prefetch=0)
    it_c = batcher.infinite()
    for _ in range(4):
        bs, bc = next(it_s), next(it_c)
        assert bs["images"].shape[1:3] == (60, 80)
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
    # GT stays anchored to the original pixels inside the shared canvas
    arrays, ns = loader.sample(1, 48, False)   # 57x80 image in 60x80
    sy, sx = ns[0] / 60, ns[1] / 80
    np.testing.assert_allclose(
        arrays["gt_boxes"][0],
        np.array([10 * sx, 5 * sy, 30 * sx, 25 * sy], np.float32),
        rtol=1e-5)


def test_vertical_and_both_flip_consistency(ddicts):
    """v/h+v flips keep image, boxes, and mask canvases consistent."""
    cfg = _cfg()
    cfg.INPUT.RANDOM_FLIP = "both"
    loader = DetectionLoader(ddicts, cfg, train=True, seed=2)
    a, ns = loader.sample(0, 48, 0)
    H, W = ns
    n = int(a["gt_valid"].sum())
    for code in (1, 2, 3):
        b, _ = loader.sample(0, 48, code)
        img = a["images"]
        if code & 1:
            img = img[:, ::-1]
        if code & 2:
            img = img[::-1, :]
        np.testing.assert_array_equal(b["images"], img, err_msg=f"img {code}")
        bx = a["gt_boxes"][:n].copy()
        if code & 1:
            bx = np.stack([W - bx[:, 2], bx[:, 1], W - bx[:, 0], bx[:, 3]], 1)
        if code & 2:
            bx = np.stack([bx[:, 0], H - bx[:, 3], bx[:, 2], H - bx[:, 1]], 1)
        np.testing.assert_allclose(b["gt_boxes"][:n], bx, atol=1e-4,
                                   err_msg=f"boxes {code}")
        assert (b["gt_boxes"][:n, 0] < b["gt_boxes"][:n, 2]).all()
        assert (b["gt_boxes"][:n, 1] < b["gt_boxes"][:n, 3]).all()
        # mask pixel count is flip-invariant
        np.testing.assert_array_equal(b["gt_masks"][:n].sum((1, 2)),
                                      a["gt_masks"][:n].sum((1, 2)))


def test_both_flip_cache_equivalence(ddicts):
    """cached == streaming with RANDOM_FLIP='both' (4 flip states)."""
    cfg = _cfg()
    cfg.INPUT.RANDOM_FLIP = "both"
    stream = DetectionLoader(ddicts, cfg, train=True, seed=11)
    batcher = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True,
                                            seed=11))
    it_s, it_c = stream.infinite(prefetch=0), batcher.infinite()
    for _ in range(12):
        bs, bc = next(it_s), next(it_c)
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
    assert batcher.n_cached <= 3 * 2 * 4  # img x min_size x flip states


@pytest.fixture(scope="module")
def rot_ddicts(tmp_path_factory):
    """Square 64x64 images whose bright rectangle IS the instance, once as
    a polygon annotation and once as RLE — for rotation registration."""
    tmp = tmp_path_factory.mktemp("rot")
    out = []
    m = np.zeros((64, 64), np.uint8)
    m[18:34, 24:46] = 1
    img = m * 200
    poly = [[24.0, 18.0, 46.0, 18.0, 46.0, 34.0, 24.0, 34.0]]
    rle = RLE.encode(np.asfortranarray(m))
    for i, seg in enumerate([poly, rle]):
        p = str(tmp / f"rot{i}.png")
        Image.fromarray(img).save(p)
        out.append({"file_name": p, "height": 64, "width": 64,
                    "mask_format": "polygon" if i == 0 else "bitmask",
                    "image_id": i, "num_instances": 1,
                    "annotations": [{
                        "bbox": np.array([24, 18, 46, 34], np.float64),
                        "bbox_mode": BoxMode.XYXY_ABS,
                        "segmentation": seg, "category_id": 0}]})
    return out


def _rot_cfg(angles=(0, 30, -30)):
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.RANDOM_ROTATION = angles
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.MASK_CANVAS = 0
    return cfg


def _iou(a, b):
    a, b = a.astype(bool), b.astype(bool)
    return (a & b).sum() / max((a | b).sum(), 1)


def test_rotation_gt_registered_with_image(rot_ddicts):
    """Rotated GT masks/boxes stay registered with the rotated pixels:
    the instance in rot_ddicts is exactly the bright image region, so at
    scale 1 the GT mask must overlap the rotated bright pixels, for both
    polygon (analytic rotation) and RLE (dense rotation) annotations."""
    loader = DetectionLoader(rot_ddicts, _rot_cfg(), train=True, seed=0)
    for idx in (0, 1):  # polygon, RLE
        base, ns = loader.sample(idx, 64, 0)   # angle index 0 = 0 deg
        assert _iou(base["gt_masks"][0, :ns[0], :ns[1]],
                    base["images"][..., 0] > 100) > 0.97
        for code in (1 << 2, 2 << 2):          # +30, -30 deg
            s, ns = loader.sample(idx, 64, code)
            assert s["gt_valid"][0]
            bright = s["images"][..., 0] > 100
            gt = s["gt_masks"][0, :ns[0], :ns[1]]
            assert _iou(gt, bright) > 0.9, (idx, code)
            # box bounds the mask (with 2 px rasterization slack)
            ys, xs = np.nonzero(gt)
            x0, y0, x1, y1 = s["gt_boxes"][0]
            assert x0 - 2 <= xs.min() and xs.max() <= x1 + 2
            assert y0 - 2 <= ys.min() and ys.max() <= y1 + 2


def test_rotation_polygon_rle_agree(rot_ddicts):
    """The same instance rotates to (nearly) the same GT whether it is
    annotated as a polygon or as RLE."""
    loader = DetectionLoader(rot_ddicts, _rot_cfg(), train=True, seed=0)
    for code in (1 << 2, 2 << 2):
        a, ns = loader.sample(0, 64, code)
        b, _ = loader.sample(1, 64, code)
        assert _iou(a["gt_masks"][0, :ns[0], :ns[1]],
                    b["gt_masks"][0, :ns[0], :ns[1]]) > 0.85


def test_rotation_with_flip_composes(rot_ddicts):
    """Flip bits compose with rotation bits: rotate first, flip after."""
    loader = DetectionLoader(rot_ddicts, _rot_cfg(), train=True, seed=0)
    loader.flip_h = loader.flip_v = loader.flip = True
    rot, ns = loader.sample(0, 64, 1 << 2)          # +30, no flip
    both, _ = loader.sample(0, 64, (1 << 2) | 3)    # +30, h+v flip
    np.testing.assert_array_equal(both["images"],
                                  rot["images"][::-1, ::-1])
    np.testing.assert_array_equal(
        both["gt_masks"][0, :ns[0], :ns[1]],
        rot["gt_masks"][0, :ns[0], :ns[1]][::-1, ::-1])


def test_rotation_cache_equivalence(rot_ddicts):
    """cached == streaming with rotation on; variant space bounded by
    images x min_sizes x flips x angles."""
    cfg = _rot_cfg()
    cfg.INPUT.RANDOM_FLIP = "both"
    stream = DetectionLoader(rot_ddicts, cfg, train=True, seed=4)
    batcher = DeviceBatcher(DetectionLoader(rot_ddicts, cfg, train=True,
                                            seed=4))
    it_s, it_c = stream.infinite(prefetch=0), batcher.infinite()
    for _ in range(10):
        bs, bc = next(it_s), next(it_c)
        for k in ("images", "gt_boxes", "gt_classes", "gt_valid",
                  "gt_masks"):
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
    assert batcher.n_cached <= 2 * 1 * 4 * 3


def test_rotation_drops_out_of_frame(tmp_path):
    """An instance in a far corner rotates out of the frame and is
    dropped rather than kept with a degenerate box."""
    img = np.zeros((64, 64), np.uint8)
    p = str(tmp_path / "corner.png")
    Image.fromarray(img).save(p)
    dd = [{"file_name": p, "height": 64, "width": 64,
           "mask_format": "polygon", "image_id": 0, "num_instances": 1,
           "annotations": [{
               "bbox": np.array([60, 0, 64, 4], np.float64),
               "bbox_mode": BoxMode.XYXY_ABS,
               "segmentation": [[60.0, 0.0, 64.0, 0.0, 64.0, 4.0,
                                 60.0, 4.0]],
               "category_id": 0}]}]
    loader = DetectionLoader(dd, _rot_cfg(angles=(0, 45)), train=True,
                             seed=0)
    s0, _ = loader.sample(0, 64, 0)
    assert s0["gt_valid"][0]
    s45, _ = loader.sample(0, 64, 1 << 2)
    assert not s45["gt_valid"].any()


def test_flip_dense_mask_path(ddicts):
    """Dense (MASK_CANVAS=0) GT masks flip with the image."""
    cfg = _cfg()
    cfg.INPUT.RANDOM_FLIP = "both"
    cfg.TPU.MASK_CANVAS = 0
    loader = DetectionLoader(ddicts, cfg, train=True, seed=2)
    a, ns = loader.sample(1, 48, 0)
    H, W = ns
    n = int(a["gt_valid"].sum())
    for code in (1, 2, 3):
        b, _ = loader.sample(1, 48, code)
        m = a["gt_masks"][:n, :H, :W]
        if code & 1:
            m = m[:, :, ::-1]
        if code & 2:
            m = m[:, ::-1, :]
        np.testing.assert_array_equal(b["gt_masks"][:n, :H, :W], m,
                                      err_msg=f"dense {code}")


# ---------------------------------------------------------------- copy-paste

@pytest.fixture(scope="module")
def cp_ddicts(tmp_path_factory):
    """Images with per-image constant brightness so pasted patches carry
    their donor's pixel value (paste provenance is checkable)."""
    tmp = tmp_path_factory.mktemp("cp")
    out = []
    for i in range(3):
        img = np.full((64, 96), 40 + 60 * i, np.uint8)
        p = str(tmp / f"cp{i}.png")
        Image.fromarray(img).save(p)
        annos = []
        for j in range(3):
            m = np.zeros((64, 96), np.uint8, order="F")
            y, x = 6 + 18 * j, 8 + 26 * j
            m[y:y + 12, x:x + 16] = 1
            annos.append({"bbox": np.array([x, y, x + 15, y + 11],
                                           np.float64),
                          "bbox_mode": BoxMode.XYXY_ABS,
                          "segmentation": RLE.encode(np.asfortranarray(m)),
                          "category_id": 0})
        out.append({"file_name": p, "height": 64, "width": 96,
                    "mask_format": "bitmask", "image_id": i,
                    "annotations": annos, "num_instances": 3})
    return out


def _cp_cfg(scale=(1.0, 1.0), crop=0):
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.COPY_PASTE = 1.0
    cfg.INPUT.COPY_PASTE_MAX = 4
    cfg.INPUT.COPY_PASTE_SCALE = scale
    cfg.INPUT.CROP_SIZE = crop
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.MASK_CANVAS = 0
    return cfg


def test_copy_paste_annotation_invariants(cp_ddicts):
    """Pixels change only under pasted masks; pasted pixels carry donor
    brightness; occlusion never leaves overlapping GT."""
    loader = DetectionLoader(cp_ddicts, _cp_cfg(), train=True, seed=0)
    raw = loader._raw_image(0).copy()
    any_pasted = False
    for code in range(4):
        rng = loader._variant_rng(0, 64, code)
        assert rng.rand() < 1.0
        img, annos = loader._copy_paste(
            raw.copy(), cp_ddicts[0]["annotations"], rng)
        union = np.zeros((64, 96), bool)
        stack = []
        for a in annos:
            m = RLE.decode(a["segmentation"]).astype(bool)
            union |= m
            stack.append(m)
        changed = (img != raw).any(axis=2)
        assert not (changed & ~union).any()
        # pasted-from-other-donor pixels have the donor's brightness
        vals = np.unique(img[changed][..., 0]) if changed.any() else []
        assert all(v in (40, 100, 160) for v in vals)
        any_pasted = any_pasted or changed.any()
        # occlusion: masks are pairwise disjoint after paste
        total = sum(m.sum() for m in stack)
        assert total == union.sum(), "overlapping GT after copy-paste"
    assert any_pasted


def test_copy_paste_cache_equivalence(cp_ddicts):
    cfg = _cp_cfg(scale=(0.7, 1.3))
    cfg.INPUT.RANDOM_FLIP = "both"
    stream = DetectionLoader(cp_ddicts, cfg, train=True, seed=9)
    batcher = DeviceBatcher(DetectionLoader(cp_ddicts, cfg, train=True,
                                            seed=9))
    it_s, it_c = stream.infinite(prefetch=0), batcher.infinite()
    for _ in range(8):
        bs, bc = next(it_s), next(it_c)
        for k in ("images", "gt_boxes", "gt_classes", "gt_valid",
                  "gt_masks"):
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
    # copy-paste adds ZERO cache variants: 3 imgs x 1 size x 4 flips
    assert batcher.n_cached <= 12


def test_copy_paste_fresh_loader_reproduces(cp_ddicts):
    a, _ = DetectionLoader(cp_ddicts, _cp_cfg(), train=True,
                           seed=3).sample(1, 64, 0)
    b, _ = DetectionLoader(cp_ddicts, _cp_cfg(), train=True,
                           seed=3).sample(1, 64, 0)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_copy_paste_bumps_max_gt(cp_ddicts):
    plain = DetectionLoader(cp_ddicts, get_cfg(), train=True)
    pasted = DetectionLoader(cp_ddicts, _cp_cfg(), train=True)
    assert pasted.max_gt >= plain.max_gt  # room for pasted instances


# ----------------------------------------------------------------- cropping

def test_crop_gt_registered_with_pixels(rot_ddicts):
    """Crop training: GT masks equal the bright pixels inside the sampled
    window (instance IS the bright region), boxes inside the window."""
    cfg = _rot_cfg(angles=())
    cfg.INPUT.CROP_SIZE = 32
    cfg.INPUT.MIN_SIZE_TRAIN = (32,)
    cfg.INPUT.MAX_SIZE_TRAIN = 32
    loader = DetectionLoader(rot_ddicts, cfg, train=True, seed=0)
    assert loader.canvas == (32, 32)
    seen_partial = False
    for idx in (0, 1):       # polygon, RLE annotations
        for code in range(2):
            s, ns = loader.sample(idx, 32, code)
            assert ns == (32, 32)
            bright = s["images"][..., 0] > 100
            n = int(s["gt_valid"].sum())
            if n == 0:
                assert bright.sum() <= 64  # tiny sliver allowed to drop
                continue
            gt = s["gt_masks"][0, :32, :32] > 0
            inter = (gt & bright).sum()
            assert inter / max(gt.sum(), 1) > 0.95
            assert inter / max(bright.sum(), 1) > 0.95
            x0, y0, x1, y1 = s["gt_boxes"][0]
            assert -1 <= x0 <= x1 <= 33 and -1 <= y0 <= y1 <= 33
            if bright.sum() < (34 - 18) * (46 - 24):
                seen_partial = True
    assert seen_partial  # at least one window clipped the instance


def test_crop_cache_equivalence(cp_ddicts):
    cfg = _cp_cfg(crop=48)
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MAX_SIZE_TRAIN = 48
    cfg.INPUT.RANDOM_FLIP = "both"
    stream = DetectionLoader(cp_ddicts, cfg, train=True, seed=6)
    batcher = DeviceBatcher(DetectionLoader(cp_ddicts, cfg, train=True,
                                            seed=6))
    it_s, it_c = stream.infinite(prefetch=0), batcher.infinite()
    for _ in range(8):
        bs, bc = next(it_s), next(it_c)
        assert np.asarray(bs["images"]).shape[1:3] == (48, 48)
        for k in ("images", "gt_boxes", "gt_classes", "gt_valid",
                  "gt_masks"):
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
    assert batcher.n_cached <= 12  # crop adds no new variants either


def test_crop_validation_path_unaffected(cp_ddicts):
    """CROP_SIZE only applies to training loaders."""
    cfg = _cp_cfg(crop=32)
    val = DetectionLoader(cp_ddicts, cfg, train=False, batch_size=1)
    batch = next(iter(val))
    assert batch["images"].shape[1:3] == (64, 96)


# ------------------------------------------------------------- mesh path

def test_mesh_batches_identical_and_sharded(ddicts):
    """VERDICT r5 #6: the device cache on the data mesh — batch content
    identical to streaming, stacked batch sharded over 'data', and zero
    steady-state host->device uploads after warm-up."""
    import jax
    from jax.sharding import PartitionSpec as P
    from ampis_tpu.parallel.mesh import data_parallel_mesh

    cfg = _cfg()
    mesh = data_parallel_mesh(2)  # batch 2 -> 1 sample per device
    stream = DetectionLoader(ddicts, cfg, train=True, seed=11)
    cached = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True,
                                           seed=11), mesh=mesh)
    it_s, it_c = stream.infinite(prefetch=0), cached.infinite()
    for _ in range(6):
        bs, bc = next(it_s), next(it_c)
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(np.asarray(bs[k]),
                                          np.asarray(bc[k]), err_msg=k)
            sh = bc[k].sharding
            assert sh.mesh.axis_names == ("data",)
            assert sh.spec == P("data"), (k, sh.spec)


def test_mesh_zero_steady_state_uploads(ddicts, monkeypatch):
    import jax
    from ampis_tpu.parallel.mesh import data_parallel_mesh
    from ampis_tpu.engine import device_cache as dc

    cfg = _cfg()
    mesh = data_parallel_mesh(2)
    batcher = DeviceBatcher(DetectionLoader(ddicts, cfg, train=True,
                                            seed=4), mesh=mesh)
    uploads = [0]
    orig = jax.device_put

    def counting_put(x, *a, **k):
        uploads[0] += 1
        return orig(x, *a, **k)

    monkeypatch.setattr(dc.jax, "device_put", counting_put)
    it = batcher.infinite()
    # warm up until the random draw stops discovering new variants
    # (40 consecutive upload-free batches: P[specific variant unseen in
    # 40 batches] ~ 1e-3, and the seed is fixed)
    quiet = 0
    for _ in range(400):
        before = uploads[0]
        next(it)
        quiet = quiet + 1 if uploads[0] == before else 0
        if quiet >= 40:
            break
    warm = uploads[0]
    assert warm > 0 and quiet >= 40
    for _ in range(20):
        next(it)
    assert uploads[0] == warm, "steady-state H2D uploads on the mesh path"
