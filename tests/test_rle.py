"""Golden tests for the RLE codec against the COCO format.

The shipped prediction pickles in the reference's examples/ were written with
pycocotools, so byte-identical round-trips through our codec prove bit
compatibility (SURVEY.md §4 test strategy, item b).
"""
import pickle

import numpy as np
import pytest

from ampis_tpu import rle as RLE
from ampis_tpu.compat import reference_unpickle


def _random_masks(n, h, w, seed=0):
    rs = np.random.RandomState(seed)
    masks = np.zeros((h, w, n), dtype=np.uint8, order="F")
    for i in range(n):
        # random blobby mask: a few rectangles
        for _ in range(rs.randint(1, 4)):
            r0, c0 = rs.randint(0, h), rs.randint(0, w)
            r1, c1 = rs.randint(r0, h + 1), rs.randint(c0, w + 1)
            masks[r0:r1, c0:c1, i] = 1
    return masks


def test_encode_decode_roundtrip_random():
    m = _random_masks(8, 37, 53)
    rles = RLE.encode(m)
    dec = RLE.decode(rles)
    assert np.array_equal(dec, m)


def test_encode_single_vs_batch():
    m = _random_masks(3, 20, 30)
    single = RLE.encode(np.asfortranarray(m[:, :, 0]))
    batch = RLE.encode(m)
    assert single["counts"] == batch[0]["counts"]
    assert single["size"] == [20, 30]


def test_area_matches_dense():
    m = _random_masks(6, 41, 29, seed=3)
    rles = RLE.encode(m)
    areas = RLE.area(rles)
    assert np.array_equal(areas, m.sum(axis=(0, 1)).astype(areas.dtype))
    # single-dict form
    assert int(RLE.area(rles[0])) == int(m[:, :, 0].sum())


def test_merge_union_intersect():
    m = _random_masks(4, 32, 32, seed=7).astype(bool)
    rles = RLE.encode(np.asfortranarray(m.astype(np.uint8)))
    union = RLE.decode(RLE.merge(rles, intersect=False)).astype(bool)
    inter = RLE.decode(RLE.merge(rles, intersect=True)).astype(bool)
    assert np.array_equal(union, np.logical_or.reduce(m, axis=2))
    assert np.array_equal(inter, np.logical_and.reduce(m, axis=2))


def test_iou_matches_dense():
    a = _random_masks(10, 48, 64, seed=1).astype(bool)
    b = _random_masks(7, 48, 64, seed=2).astype(bool)
    ra = RLE.encode(np.asfortranarray(a.astype(np.uint8)))
    rb = RLE.encode(np.asfortranarray(b.astype(np.uint8)))
    got = RLE.iou(ra, rb, np.zeros(7, bool))
    af = a.reshape(-1, 10).astype(np.float64)
    bf = b.reshape(-1, 7).astype(np.float64)
    inter = af.T @ bf
    union = af.sum(0)[:, None] + bf.sum(0)[None, :] - inter
    want = np.where(inter > 0, inter / np.where(union > 0, union, 1), 0.0)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_iou_crowd_semantics():
    a = _random_masks(4, 30, 30, seed=4).astype(bool)
    b = _random_masks(3, 30, 30, seed=5).astype(bool)
    ra = RLE.encode(np.asfortranarray(a.astype(np.uint8)))
    rb = RLE.encode(np.asfortranarray(b.astype(np.uint8)))
    got = RLE.iou(ra, rb, np.ones(3, bool))
    af = a.reshape(-1, 4).astype(np.float64)
    bf = b.reshape(-1, 3).astype(np.float64)
    inter = af.T @ bf
    da = af.sum(0)[:, None]
    want = np.where(inter > 0, inter / np.where(da > 0, da, 1), 0.0)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_tobbox():
    m = np.zeros((20, 30), dtype=np.uint8, order="F")
    m[3:8, 10:17] = 1
    r = RLE.encode(m)
    bb = RLE.toBbox(r)
    assert list(bb) == [10, 3, 7, 5]
    # empty mask
    empty = RLE.encode(np.zeros((20, 30), dtype=np.uint8, order="F"))
    assert list(RLE.toBbox(empty)) == [0, 0, 0, 0]


def test_frpyobjects_polygon_matches_known():
    # a simple axis-aligned square; COCO's rasterizer includes the pixel
    # centers covered by the polygon
    poly = [[2.0, 2.0, 2.0, 7.0, 7.0, 7.0, 7.0, 2.0]]
    rles = RLE.frPyObjects(poly, 10, 10)
    dec = RLE.decode(rles[0]).astype(bool)
    # pixels fully inside the square boundary
    want = np.zeros((10, 10), bool)
    want[2:7, 2:7] = True
    assert np.array_equal(dec, want)


def test_frpyobjects_uncompressed_rle():
    obj = {"size": [4, 4], "counts": [2, 3, 11]}
    r = RLE.frPyObjects(obj, 4, 4)
    dec = RLE.decode(r)
    flat = dec.flatten(order="F")
    want = np.zeros(16, np.uint8)
    want[2:5] = 1
    assert np.array_equal(flat, want)


@pytest.fixture(scope="module")
def shipped_masks(reference_root):
    p = reference_root / "examples/powder/data/sample_particle_outputs.pickle"
    with open(p, "rb") as f:
        data = reference_unpickle(f)
    masks = []
    for entry in data:
        masks.extend(entry["pred"]["instances"].pred_masks)
    return masks


def test_roundtrip_shipped_pickles_bit_identical(shipped_masks):
    subset = shipped_masks[:100]
    dec = RLE.decode(subset)
    re = RLE.encode(np.asfortranarray(dec))
    for orig, new in zip(subset, re):
        assert new["counts"] == orig["counts"]
        assert new["size"] == [int(s) for s in orig["size"]]


def test_shipped_bbox_close_to_predicted_boxes(reference_root):
    p = reference_root / "examples/powder/data/sample_particle_outputs.pickle"
    with open(p, "rb") as f:
        data = reference_unpickle(f)
    inst = data[0]["pred"]["instances"]
    bbs = RLE.toBbox(inst.pred_masks[:20])
    # mask-derived boxes should sit inside/near the regression boxes
    pred = inst.pred_boxes[:20]
    x0, y0 = bbs[:, 0], bbs[:, 1]
    x1, y1 = bbs[:, 0] + bbs[:, 2], bbs[:, 1] + bbs[:, 3]
    assert np.all(x0 >= pred[:, 0] - 2)
    assert np.all(y0 >= pred[:, 1] - 2)
    assert np.all(x1 <= pred[:, 2] + 2)
    assert np.all(y1 <= pred[:, 3] + 2)


def test_paste_masks_to_rle_matches_reference_bilinear():
    # one soft mask pasted into a box; compare to an independent numpy
    # implementation of grid_sample(align_corners=False) + threshold
    rs = np.random.RandomState(0)
    soft = rs.rand(1, 28, 28).astype(np.float32)
    box = np.array([[10.3, 5.7, 50.9, 40.2]], np.float32)
    h, w = 64, 80
    rles = RLE.paste_masks_to_rle(soft, box, (h, w))
    got = RLE.decode(rles[0]).astype(bool)

    x0, y0, x1, y1 = box[0]
    ys = (np.arange(h) + 0.5 - y0) / (y1 - y0) * 2 - 1
    xs = (np.arange(w) + 0.5 - x0) / (x1 - x0) * 2 - 1
    fy = ((ys + 1) * 28 - 1) / 2
    fx = ((xs + 1) * 28 - 1) / 2
    want = np.zeros((h, w))
    for r in range(h):
        for c in range(w):
            yf, xf = fy[r], fx[c]
            yi, xi = int(np.floor(yf)), int(np.floor(xf))
            wy, wx = yf - yi, xf - xi
            val = 0.0
            for dy, wyv in ((0, 1 - wy), (1, wy)):
                for dx, wxv in ((0, 1 - wx), (1, wx)):
                    yy, xx = yi + dy, xi + dx
                    if 0 <= yy < 28 and 0 <= xx < 28:
                        val += soft[0, yy, xx] * wyv * wxv
            want[r, c] = val
    assert np.array_equal(got, want > 0.5)


def test_label_connected_components():
    img = np.zeros((10, 10), bool)
    img[1:3, 1:3] = True
    img[5:7, 5:8] = True
    img[3, 3] = True  # diagonal touch to first blob -> same label (8-conn)
    labels, n = RLE.label(img)
    assert n == 2
    assert labels[1, 1] == labels[3, 3]  # 8-connectivity merges diagonal
    assert labels[5, 5] != labels[1, 1]
    assert labels[0, 0] == 0


def test_intersect_areas():
    m = _random_masks(5, 25, 25, seed=9).astype(bool)
    rles = RLE.encode(np.asfortranarray(m.astype(np.uint8)))
    got = RLE.intersect_areas(rles[0], rles)
    want = [(m[:, :, 0] & m[:, :, i]).sum() for i in range(5)]
    assert np.array_equal(got, np.asarray(want, dtype=got.dtype))
