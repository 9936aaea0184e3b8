"""Per-instance mask crop canvases vs dense full-resolution GT masks.

The canvas representation (ops.roi_align.instance_mask_canvas +
crop_resize_instance_canvases) replaces dense (G, H, W) GT mask stacks in
the training pipeline (~60x less host->device traffic for the powder
workload). Targets must match the dense crop path exactly for instances
stored at native resolution, including at image borders.
"""
import jax.numpy as jnp
import numpy as np

from ampis_tpu.ops.roi_align import (crop_and_resize_masks,
                                     crop_resize_instance_canvases,
                                     instance_mask_canvas)

H, W, T = 200, 300, 64


def _blob_masks(rs, g):
    masks = np.zeros((g, H, W), np.uint8)
    for i in range(g):
        r0, c0 = rs.randint(0, H - 50), rs.randint(0, W - 50)
        rh, cw = rs.randint(5, 48), rs.randint(5, 48)
        yy, xx = np.mgrid[0:rh, 0:cw]
        blob = (((yy - rh / 2) / (rh / 2)) ** 2
                + ((xx - cw / 2) / (cw / 2)) ** 2) < 1
        masks[i, r0:r0 + rh, c0:c0 + cw] = blob
    return masks


def _pack(masks):
    canv = np.zeros((len(masks), T, T), np.uint8)
    meta = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        canv[i], meta[i] = instance_mask_canvas(m, T)
    return jnp.asarray(canv), jnp.asarray(meta)


def _crop_both(masks, boxes, idx):
    canv, meta = _pack(masks)
    dense = np.asarray(crop_and_resize_masks(
        jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(idx),
        output_size=28, max_sr=2))
    from_canvas = np.asarray(crop_resize_instance_canvases(
        canv, meta, jnp.asarray(boxes), jnp.asarray(idx),
        jnp.asarray([H, W], jnp.float32), output_size=28, max_sr=2))
    return dense, from_canvas


def test_native_resolution_exact():
    rs = np.random.RandomState(0)
    masks = _blob_masks(rs, 12)
    idx = rs.randint(0, 12, 40)
    boxes = []
    for i in idx:
        ys, xs = np.nonzero(masks[i])
        jit = rs.randn(4) * 6
        boxes.append([xs.min() + jit[0], ys.min() + jit[1],
                      xs.max() + 1 + jit[2], ys.max() + 1 + jit[3]])
    boxes = np.clip(np.asarray(boxes, np.float32), -5, None)
    dense, from_canvas = _crop_both(masks, boxes, idx)
    np.testing.assert_allclose(from_canvas, dense, atol=1e-5)


def test_image_border_instance_exact():
    # instance flush against the image corner; box extends past the border
    masks = np.zeros((1, H, W), np.uint8)
    masks[0, 0:30, 0:40] = 1
    boxes = np.asarray([[-6.0, -4.0, 45.0, 33.0]], np.float32)
    dense, from_canvas = _crop_both(masks, boxes, np.zeros(1, np.int32))
    np.testing.assert_allclose(from_canvas, dense, atol=1e-5)


def test_oversized_instance_downscales():
    masks = np.zeros((1, H, W), np.uint8)
    masks[0, 10:190, 20:280] = 1  # 180x260 >> T-2
    boxes = np.asarray([[15.0, 5.0, 285.0, 195.0]], np.float32)
    dense, from_canvas = _crop_both(masks, boxes, np.zeros(1, np.int32))
    agree = ((dense >= 0.5) == (from_canvas >= 0.5)).mean()
    assert agree > 0.96  # low-passed targets; binarized edges wobble only


def test_empty_mask_zero_targets():
    masks = np.zeros((1, H, W), np.uint8)
    boxes = np.asarray([[10.0, 10.0, 50.0, 50.0]], np.float32)
    _, from_canvas = _crop_both(masks, boxes, np.zeros(1, np.int32))
    assert (from_canvas == 0).all()
