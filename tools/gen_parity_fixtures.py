#!/usr/bin/env python
"""Generate recorded-activation parity fixtures (VERDICT r5 item 4).

Pins the model-path ops against implementations that are independent of
this package — torch (CPU) where core torch provides the op, explicit
float64 loops otherwise — and freezes the results as an npz consumed by
tests/test_parity_fixtures.py. The fixtures make the parity claims in
docs/parity.md executable in ANY environment (the npz is committed;
regenerating needs torch, which this image ships CPU-only).

Pinned semantics (reference dependency surface, SURVEY.md §2b):
- mask paste:   torch grid_sample(align_corners=False) on the
                detectron2 _do_paste_mask grid
- image resize: torch F.interpolate(bilinear, antialias=True) — the
                PIL-BILINEAR semantics detectron2's ResizeShortestEdge
                uses for uint8 images
- RoIAlignV2:   explicit float64 quadruple loop over bins and sample
                points (aligned=True half-pixel offset, bilinear with
                border clamping + out-of-range zeroing)
- deconv:       torch conv_transpose2d stride 2 (mask head layout)
- greedy NMS:   float64 loop, torchvision semantics (suppress
                iou > threshold, stable score order)

Run: python tools/gen_parity_fixtures.py  (writes tests/fixtures/)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def gen_paste(rng):
    masks = rng.random((8, 28, 28), dtype=np.float32)
    h, w = 64, 96
    boxes = np.stack([
        rng.uniform(0, w - 32, 8), rng.uniform(0, h - 32, 8),
        np.zeros(8), np.zeros(8)], axis=1).astype(np.float32)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(4, 31, 8)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(4, 31, 8)
    # one box partially off-canvas, one sub-pixel thin
    boxes[0] = [-5.3, -2.1, 20.7, 25.2]
    boxes[1] = [80.0, 50.0, 102.5, 70.0]

    ys = torch.arange(h, dtype=torch.float64) + 0.5
    xs = torch.arange(w, dtype=torch.float64) + 0.5
    out = np.zeros((8, h, w), np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes.astype(np.float64)):
        gy = (ys - y0) / (y1 - y0) * 2 - 1
        gx = (xs - x0) / (x1 - x0) * 2 - 1
        grid = torch.stack(
            [gx[None, :].expand(h, w), gy[:, None].expand(h, w)],
            dim=-1)[None]
        m = torch.from_numpy(masks[i]).double()[None, None]
        out[i] = F.grid_sample(m, grid, align_corners=False,
                               padding_mode="zeros")[0, 0].numpy()
    return {"paste_masks": masks, "paste_boxes": boxes,
            "paste_size": np.asarray([h, w]), "paste_soft": out}


def gen_resize(rng):
    img = (rng.random((123, 157, 3)) * 255).astype(np.uint8)
    entries = {"resize_img": img}
    for tag, (nh, nw) in {"down": (61, 78), "up": (246, 314),
                          "aniso": (100, 130)}.items():
        t = torch.from_numpy(img.astype(np.float32)).permute(
            2, 0, 1)[None]
        r = F.interpolate(t, size=(nh, nw), mode="bilinear",
                          align_corners=False, antialias=True)
        entries[f"resize_{tag}"] = r[0].permute(1, 2, 0).numpy()
    return entries


def _roi_align_v2_f64(feat, boxes, stride, out_size, sr):
    """Explicit-loop RoIAlignV2 (aligned=True), float64."""
    H, W, C = feat.shape
    feat = feat.astype(np.float64)
    R = len(boxes)
    out = np.zeros((R, out_size, out_size, C))

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat[y0, x0]
                + (1 - ly) * lx * feat[y0, x1]
                + ly * (1 - lx) * feat[y1, x0]
                + ly * lx * feat[y1, x1])

    for r, (bx0, by0, bx1, by1) in enumerate(boxes.astype(np.float64)):
        x0 = bx0 / stride - 0.5
        y0 = by0 / stride - 0.5
        bw = max((bx1 - bx0) / stride, 1e-12)
        bh = max((by1 - by0) / stride, 1e-12)
        bin_w, bin_h = bw / out_size, bh / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(C)
                for iy in range(sr):
                    for ix in range(sr):
                        sy = y0 + (oy + (iy + 0.5) / sr) * bin_h
                        sx = x0 + (ox + (ix + 0.5) / sr) * bin_w
                        acc += bilinear(sy, sx)
                out[r, oy, ox] = acc / (sr * sr)
    return out.astype(np.float32)


def gen_roi_align(rng):
    feat = rng.random((24, 32, 8), dtype=np.float32)
    boxes = np.asarray([
        [4.0, 4.0, 60.0, 60.0],
        [10.5, 7.25, 30.0, 77.9],
        [0.0, 0.0, 127.9, 95.9],
        [33.33, 21.7, 57.01, 44.44],
        [100.0, 80.0, 126.0, 94.0],
    ], np.float32)
    want = _roi_align_v2_f64(feat, boxes, stride=4, out_size=7, sr=2)
    return {"ra_feat": feat, "ra_boxes": boxes,
            "ra_meta": np.asarray([4, 7, 2]), "ra_out": want}


def gen_deconv(rng):
    x = rng.random((1, 8, 5, 7), dtype=np.float32)       # NCHW
    w = (rng.random((8, 4, 2, 2), dtype=np.float32) - 0.5)  # IOHW
    b = (rng.random(4, dtype=np.float32) - 0.5)
    y = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=2).numpy()
    return {"dc_x": x, "dc_w": w, "dc_b": b, "dc_y": y}


def _greedy_nms_f64(boxes, scores, thr):
    boxes = boxes.astype(np.float64)
    order = np.argsort(-scores, kind="mergesort")
    keep = np.zeros(len(boxes), bool)
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep[i] = True
        x0 = np.maximum(boxes[i, 0], boxes[:, 0])
        y0 = np.maximum(boxes[i, 1], boxes[:, 1])
        x1 = np.minimum(boxes[i, 2], boxes[:, 2])
        y1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
        a = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        ai = a[i]
        iou = inter / (ai + a - inter)
        kill = (iou > thr) & alive
        kill[i] = False
        alive[kill] = False
    return keep


def gen_nms(rng):
    # engineered ties: duplicate boxes (IoU exactly 1), tied scores
    # (stable order decides), a suppression chain, boxes at exactly the
    # threshold IoU (strict > must NOT suppress)
    base = np.asarray([10.0, 10.0, 30.0, 30.0])
    chain = [base + i * np.asarray([8.0, 0.0, 8.0, 0.0]) for i in range(6)]
    # IoU(base, base shifted by 10) = 10*20/(2*400-200) = 1/3
    at_thr = base + np.asarray([10.0, 0.0, 10.0, 0.0])
    boxes = np.stack([base, base.copy(), at_thr] + chain
                     + [np.asarray([50.0, 50.0, 70.0, 70.0])]).astype(
                         np.float32)
    scores = np.asarray([0.9, 0.9, 0.9, 0.8, 0.8, 0.7, 0.7, 0.6, 0.6,
                         0.5], np.float32)
    keep_third = _greedy_nms_f64(boxes, scores, 1.0 / 3.0)
    keep_half = _greedy_nms_f64(boxes, scores, 0.5)
    rb = rng.uniform(0, 90, (64, 2))
    rboxes = np.concatenate(
        [rb, rb + rng.uniform(5, 30, (64, 2))], axis=1).astype(np.float32)
    rscores = np.round(rng.random(64), 1).astype(np.float32)  # many ties
    keep_rand = _greedy_nms_f64(rboxes, rscores, 0.5)
    return {"nms_boxes": boxes, "nms_scores": scores,
            "nms_keep_third": keep_third, "nms_keep_half": keep_half,
            "nms_rboxes": rboxes, "nms_rscores": rscores,
            "nms_keep_rand": keep_rand}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260821)
    data = {}
    for gen in (gen_paste, gen_resize, gen_roi_align, gen_deconv,
                gen_nms):
        data.update(gen(rng))
    path = OUT / "parity_fixtures.npz"
    np.savez_compressed(path, **data)
    print(f"wrote {path} ({path.stat().st_size / 1024:.0f} KiB, "
          f"{len(data)} arrays)")


if __name__ == "__main__":
    main()
