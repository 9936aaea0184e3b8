"""Host-side detection data loading for training and validation.

Replaces detectron2's DatasetMapper + detection loaders that the reference
wires into its trainer (reference data_utils.py:171-175, call stack
SURVEY.md §3.2). Design for TPU static shapes:

* one fixed canvas per loader (max resize target over the scale-jitter
  range, rounded to /32) — every batch compiles against a single program;
* GT instances padded to a fixed MAX_GT with validity masks;
* GT polygon masks are rasterized at the *resized* scale by the C++ COCO
  rasterizer (coordinates scaled host-side), RLE bitmask GT is decoded and
  resampled — then each instance is packed into a small (T, T) crop
  canvas + affine meta (cfg.TPU.MASK_CANVAS; ~60x less host->device
  traffic than a dense (G, Hc, Wc) stack for high-instance-density SEM
  images) for in-graph mask-target cropping; cfg.TPU.MASK_CANVAS = 0
  falls back to the dense stack;
* images ship as raw uint8; resize + normalize + pad run inside the jitted
  step (fused into the XLA graph).
"""
from __future__ import annotations

import numpy as np

from .. import rle as RLE
from ..input.transforms import get_resize_shape, pad_to_canvas_shape
from ..ops.roi_align import instance_mask_canvas
from ..structures import BoxMode
from ..utils.io import imread_bgr
from .catalog import DatasetCatalog


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class DetectionLoader:
    """Iterable of fixed-shape training/validation batches."""

    def __init__(self, ddicts, cfg, train: bool, batch_size: int = None,
                 seed: int = 0, max_gt: int = None):
        self.ddicts = list(ddicts)
        self.cfg = cfg
        self.train = train
        self.batch_size = batch_size or (cfg.SOLVER.IMS_PER_BATCH if train
                                         else 1)
        self.rng = np.random.RandomState(seed)
        if train:
            sizes = cfg.INPUT.MIN_SIZE_TRAIN
            self.min_sizes = [sizes] if isinstance(sizes, int) \
                else list(sizes)
            self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        else:
            self.min_sizes = [cfg.INPUT.MIN_SIZE_TEST]
            self.max_size = cfg.INPUT.MAX_SIZE_TEST
        # Flip augmentation, encoded as a 2-bit code: bit 0 = horizontal,
        # bit 1 = vertical. cfg.INPUT.RANDOM_FLIP: "horizontal"
        # (detectron2 default) | "vertical" | "both" (independent 0.5
        # draws — microscopy images are orientation-free) | "none".
        mode = cfg.INPUT.RANDOM_FLIP if train else "none"
        self.flip_h = mode in ("horizontal", "both")
        self.flip_v = mode in ("vertical", "both")
        self.flip = self.flip_h or self.flip_v
        # rotation augmentation: per-sample angle drawn uniformly from
        # cfg.INPUT.RANDOM_ROTATION (degrees; () = off). Encoded in the
        # same per-sample augmentation code as the flips (bits 2+), so
        # the device cache keys variants without new plumbing.
        self.angles = (list(getattr(cfg.INPUT, "RANDOM_ROTATION", ()) or ())
                       if train else [])
        # copy-paste + crop augmentation: layouts are a pure function of
        # the cache key (idx, min_size, aug code) via _variant_rng — each
        # cached variant gets one fixed arrangement, so these add ZERO new
        # cache entries (no key-space blowup, no extra host
        # materializations; ~hundreds of distinct layouts come free from
        # the existing scale x flip x rotation variants).
        self.seed = seed
        self.paste_p = (float(getattr(cfg.INPUT, "COPY_PASTE", 0.0) or 0.0)
                        if train else 0.0)
        self.paste_max = int(getattr(cfg.INPUT, "COPY_PASTE_MAX", 20) or 0)
        self.paste_scale = tuple(getattr(cfg.INPUT, "COPY_PASTE_SCALE",
                                         (1.0, 1.0)))
        crop = getattr(cfg.INPUT, "CROP_SIZE", 0) if train else 0
        self.crop = (None if not crop
                     else (int(crop), int(crop)) if np.isscalar(crop)
                     else (int(crop[0]), int(crop[1])))
        self._img_cache = {} if train else None

        # static shapes: ONE raw canvas per dataset (max H x W over the
        # ddicts; images with smaller raw sizes are placed top-left with
        # zero padding) so every batch stacks and compiles against a
        # single program regardless of per-image size jitter. The resize
        # scale is computed from the raw canvas — a deliberate deviation
        # from detectron2's per-image shortest-edge scale, negligible for
        # the near-uniform image sizes of microscopy datasets
        # (docs/parity.md).
        self.raw_shape = (max(d["height"] for d in self.ddicts),
                          max(d["width"] for d in self.ddicts))
        # the pre-resize frame: the crop window when crop training is on,
        # else the raw canvas (paste/rotate always run in the raw frame)
        pre = self.crop or self.raw_shape
        canvases = []
        for ms in self.min_sizes:
            canvases.append(pad_to_canvas_shape(
                *get_resize_shape(*pre, ms, self.max_size),
                fixed=cfg.INPUT.FIXED_SIZE))
        self.canvas = (max(c[0] for c in canvases),
                       max(c[1] for c in canvases))
        n_inst = max((d.get("num_instances", 0) for d in self.ddicts),
                     default=1)
        if self.paste_p:
            n_inst += self.paste_max
        self.max_gt = max_gt or max(_round_up(max(n_inst, 1), 16), 16)
        self.mask_canvas = int(getattr(cfg.TPU, "MASK_CANVAS", 0) or 0)

    def __len__(self):
        return len(self.ddicts)

    def n_variants(self):
        """Distinct (image, min_size, aug code) sample variants this
        loader can emit — the device cache's working-set size."""
        codes = ((2 if self.flip_h else 1) * (2 if self.flip_v else 1)
                 * max(len(self.angles), 1))
        return len(self.ddicts) * len(self.min_sizes) * codes

    def variant_nbytes(self):
        """Per-variant host->device footprint in bytes (static shapes)."""
        h, w = self.crop or self.raw_shape
        n = h * w * 3                                   # raw uint8 image
        g = self.max_gt
        n += g * (4 * 4 + 4 + 1)                        # boxes/classes/valid
        if self.mask_canvas:
            n += g * (self.mask_canvas ** 2 + 4 * 4)    # crops + meta
        else:
            n += g * self.canvas[0] * self.canvas[1]
        return n + 8                                    # image_hw

    @staticmethod
    def _scaled_bbox(a, sx, sy):
        bbox = np.asarray(a["bbox"], np.float64)
        if a.get("bbox_mode", BoxMode.XYXY_ABS) == BoxMode.XYWH_ABS:
            bbox = np.asarray(
                [bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1] + bbox[3]])
        return bbox * np.asarray([sx, sy, sx, sy])

    @staticmethod
    def _instance_crop(a, box, sx, sy, new_shape):
        """Rasterize one instance's mask locally: (crop uint8, (y0, x0)).

        The crop window covers the union of the annotated bbox and the
        segmentation's own extent (annotations with loose boxes must not
        lose mask pixels). Polygons rasterize at crop size in shifted
        coordinates (COCO scanline rasterization is integer-shift
        invariant) — O(instance area), no full-image plane. RLE GT
        decodes and resizes its full plane (exactly the dense-path
        pixels) before cropping; that is O(image area) per instance but
        RLE-annotated datasets (binary/label formats) are small images.
        """
        seg = a["segmentation"]
        ys0, xs0 = box[1], box[0]
        ys1, xs1 = box[3], box[2]
        polys = None
        if not isinstance(seg, dict):
            polys = []
            for p in seg:
                p = np.asarray(p, np.float64).copy()
                p[0::2] *= sx
                p[1::2] *= sy
                polys.append(p)
                if p.size >= 4:
                    xs0 = min(xs0, p[0::2].min())
                    xs1 = max(xs1, p[0::2].max())
                    ys0 = min(ys0, p[1::2].min())
                    ys1 = max(ys1, p[1::2].max())
        iy0 = max(int(np.floor(ys0)) - 1, 0)
        ix0 = max(int(np.floor(xs0)) - 1, 0)
        iy1 = min(int(np.ceil(ys1)) + 2, new_shape[0])
        ix1 = min(int(np.ceil(xs1)) + 2, new_shape[1])
        ch, cw = max(iy1 - iy0, 1), max(ix1 - ix0, 1)
        if polys is None:  # RLE at original resolution
            from PIL import Image
            dense = RLE.decode(seg).astype(np.float32)
            m = np.asarray(Image.fromarray(dense).resize(
                (new_shape[1], new_shape[0]), Image.BILINEAR)) >= 0.5
            ys_e, xs_e = np.nonzero(m)
            if ys_e.size:  # widen to the segmentation's true extent
                iy0 = max(min(iy0, int(ys_e.min()) - 1), 0)
                ix0 = max(min(ix0, int(xs_e.min()) - 1), 0)
                iy1 = min(max(iy1, int(ys_e.max()) + 2), new_shape[0])
                ix1 = min(max(ix1, int(xs_e.max()) + 2), new_shape[1])
                ch, cw = max(iy1 - iy0, 1), max(ix1 - ix0, 1)
            crop = m[iy0:iy0 + ch, ix0:ix0 + cw].astype(np.uint8)
        else:  # polygons: shift scaled coords, rasterize at crop size
            shifted = []
            for p in polys:
                q = p.copy()
                q[0::2] -= ix0
                q[1::2] -= iy0
                shifted.append(q.tolist())
            rles = RLE.frPyObjects(shifted, ch, cw)
            merged = RLE.merge(rles) if len(rles) > 1 else rles[0]
            crop = RLE.decode(merged)
        return crop, (iy0, ix0)

    @staticmethod
    def _rotate_point_matrix(angle_deg):
        """Input->output point map of PIL Image.rotate(angle) (CCW on
        screen, y-down): p_out = R @ (p_in - c) + c."""
        a = np.radians(angle_deg)
        return np.asarray([[np.cos(a), np.sin(a)],
                           [-np.sin(a), np.cos(a)]], np.float64)

    def _rotate_sample(self, img, annos, angle):
        """Rotate image + annotations in the raw frame (fixed extent).

        detectron2 RandomRotation expand=False semantics: the frame stays
        (h0, w0), corners clip, fill is black. Polygons rotate
        analytically around the raw center; RLE segmentations rotate as
        dense masks (PIL nearest). Annotations whose rotated extent
        leaves the frame (or degenerates under 2 px) are dropped.
        """
        from PIL import Image
        h0, w0 = self.raw_shape
        img = np.asarray(Image.fromarray(img).rotate(
            angle, resample=Image.BILINEAR))
        # PIL rotates about the pixel-index center ((w-1)/2, (h-1)/2),
        # which in COCO polygon coordinates (pixel centers at
        # half-integers) is exactly (w/2, h/2).
        c = np.asarray([w0 / 2.0, h0 / 2.0])
        rot = self._rotate_point_matrix(angle)
        out = []
        for a in annos:
            seg = a["segmentation"]
            if isinstance(seg, dict):
                dense = RLE.decode(seg)
                if dense.shape != (h0, w0):  # pad like the image (top-left)
                    padded = np.zeros((h0, w0), dense.dtype)
                    padded[:dense.shape[0], :dense.shape[1]] = dense
                    dense = padded
                m = np.asarray(Image.fromarray(dense * np.uint8(255)).rotate(
                    angle, resample=Image.NEAREST)) > 127
                ys, xs = np.nonzero(m)
                if ys.size < 4:
                    continue
                bbox = [float(xs.min()), float(ys.min()),
                        float(xs.max() + 1), float(ys.max() + 1)]
                seg_t = RLE.encode(np.asfortranarray(m.astype(np.uint8)))
            else:
                polys, ext = [], []
                for p in seg:
                    p = np.asarray(p, np.float64).reshape(-1, 2)
                    q = (p - c) @ rot.T + c
                    polys.append(q.reshape(-1))
                    ext.append(q)
                pts = np.concatenate(ext, axis=0)
                x0 = max(float(pts[:, 0].min()), 0.0)
                y0 = max(float(pts[:, 1].min()), 0.0)
                x1 = min(float(pts[:, 0].max()), float(w0))
                y1 = min(float(pts[:, 1].max()), float(h0))
                if x1 - x0 < 2 or y1 - y0 < 2:
                    continue
                bbox = [x0, y0, x1, y1]
                seg_t = [q.tolist() for q in polys]
            out.append({**a, "segmentation": seg_t, "bbox": bbox,
                        "bbox_mode": BoxMode.XYXY_ABS})
        return img, out

    def _rasterize_raw(self, a, ddict_hw):
        """One annotation's mask at raw scale: (bool crop, (y0, x0))."""
        box = self._scaled_bbox(a, 1.0, 1.0)
        crop, origin = self._instance_crop(a, box, 1.0, 1.0, ddict_hw)
        return crop.astype(bool), origin

    @staticmethod
    def _rle_from_window(window, origin, frame_hw):
        """Full-frame RLE + tight XYXY bbox from a bool crop window."""
        y0, x0 = origin
        full = np.zeros(frame_hw, np.uint8)
        full[y0:y0 + window.shape[0], x0:x0 + window.shape[1]] = window
        ys, xs = np.nonzero(window)
        bbox = np.asarray([x0 + xs.min(), y0 + ys.min(),
                           x0 + xs.max(), y0 + ys.max()], np.float64)
        return RLE.encode(np.asfortranarray(full)), bbox

    def _copy_paste(self, img, annos, rng):
        """Instance copy-paste in the raw frame (Ghiasi et al. 2021).

        Pastes 1..COPY_PASTE_MAX instances drawn from random training
        images (donor pixels under the donor's mask) at uniform random
        positions, each rescaled by a COPY_PASTE_SCALE draw; occluded
        pixels are removed from pre-existing ground truth and instances
        left with fewer than 4 visible pixels are dropped. All layout
        randomness comes from ``rng`` (see _variant_rng). ``img`` must be
        a private copy (pixels are written in place).
        """
        from PIL import Image
        h_frame, w_frame = img.shape[:2]
        union = np.zeros((h_frame, w_frame), bool)
        pasted = []
        for _ in range(rng.randint(1, self.paste_max + 1)):
            d_idx = int(rng.randint(len(self.ddicts)))
            donor = self.ddicts[d_idx]
            donor_annos = donor.get("annotations", [])
            if not donor_annos:
                continue
            a = donor_annos[int(rng.randint(len(donor_annos)))]
            crop, (iy0, ix0) = self._rasterize_raw(
                a, (donor["height"], donor["width"]))
            patch = self._raw_image(d_idx)[iy0:iy0 + crop.shape[0],
                                           ix0:ix0 + crop.shape[1]]
            s = float(rng.uniform(*self.paste_scale))
            if abs(s - 1.0) > 1e-6:
                ch = max(int(round(crop.shape[0] * s)), 1)
                cw = max(int(round(crop.shape[1] * s)), 1)
                crop = np.asarray(Image.fromarray(
                    crop.astype(np.uint8) * 255).resize(
                        (cw, ch), Image.BILINEAR)) > 127
                patch = np.asarray(Image.fromarray(patch).resize(
                    (cw, ch), Image.BILINEAR))
            ch, cw = crop.shape
            if ch >= h_frame or cw >= w_frame or crop.sum() < 4:
                continue
            y0 = int(rng.randint(0, h_frame - ch + 1))
            x0 = int(rng.randint(0, w_frame - cw + 1))
            img[y0:y0 + ch, x0:x0 + cw][crop] = patch[crop]
            union[y0:y0 + ch, x0:x0 + cw] |= crop
            pasted.append((crop, (y0, x0), a["category_id"]))
        if not pasted:
            return img, annos

        # later pastes occlude earlier ones: walk back-to-front tracking
        # the pixels already claimed by later instances
        later = np.zeros((h_frame, w_frame), bool)
        pasted_annos = []
        for crop, (y0, x0), cat in reversed(pasted):
            window = later[y0:y0 + crop.shape[0], x0:x0 + crop.shape[1]]
            visible = crop & ~window
            window |= crop
            if visible.sum() < 4:
                continue
            seg, bbox = self._rle_from_window(visible, (y0, x0),
                                              (h_frame, w_frame))
            pasted_annos.append({"bbox": bbox,
                                 "bbox_mode": BoxMode.XYXY_ABS,
                                 "segmentation": seg,
                                 "category_id": cat})
        pasted_annos.reverse()

        kept = []
        for a in annos:
            box = self._scaled_bbox(a, 1.0, 1.0)
            wy0 = max(int(box[1]) - 2, 0)
            wx0 = max(int(box[0]) - 2, 0)
            wy1 = min(int(box[3]) + 3, h_frame)
            wx1 = min(int(box[2]) + 3, w_frame)
            if not union[wy0:wy1, wx0:wx1].any():
                kept.append(a)  # no pasted pixels near it: unchanged
                continue
            crop, (iy0, ix0) = self._rasterize_raw(a, (h_frame, w_frame))
            visible = crop & ~union[iy0:iy0 + crop.shape[0],
                                    ix0:ix0 + crop.shape[1]]
            n_vis = int(visible.sum())
            if n_vis < 4:
                continue  # (almost) fully occluded
            if n_vis == int(crop.sum()):
                kept.append(a)
                continue
            seg, bbox = self._rle_from_window(visible, (iy0, ix0),
                                              (h_frame, w_frame))
            kept.append({**a, "segmentation": seg, "bbox": bbox,
                         "bbox_mode": BoxMode.XYXY_ABS})
        return img, kept + pasted_annos

    def _crop_sample(self, img, annos, rng):
        """One fixed random CROP_SIZE window at native scale.

        Annotations are clipped to the window: polygons shift
        analytically (the scanline rasterizer clips out-of-frame
        vertices), RLE masks re-encode their visible window; instances
        clipped below 2 px extent or 4 visible pixels are dropped.
        """
        ch, cw = self.crop
        h_frame, w_frame = img.shape[:2]
        y0 = int(rng.randint(0, max(h_frame - ch, 0) + 1))
        x0 = int(rng.randint(0, max(w_frame - cw, 0) + 1))
        img = img[y0:y0 + ch, x0:x0 + cw]
        out = []
        for a in annos:
            box = self._scaled_bbox(a, 1.0, 1.0)
            nb = np.asarray([box[0] - x0, box[1] - y0,
                             box[2] - x0, box[3] - y0], np.float64)
            clipped = np.asarray([max(nb[0], 0.0), max(nb[1], 0.0),
                                  min(nb[2], float(cw)),
                                  min(nb[3], float(ch))])
            if clipped[2] - clipped[0] < 2 or clipped[3] - clipped[1] < 2:
                continue
            seg = a["segmentation"]
            if isinstance(seg, dict):
                dense = RLE.decode(seg).astype(bool)
                if dense.shape != (h_frame, w_frame):
                    padded = np.zeros((h_frame, w_frame), bool)
                    padded[:dense.shape[0], :dense.shape[1]] = dense
                    dense = padded
                window = dense[y0:y0 + ch, x0:x0 + cw]
                if window.sum() < 4:
                    continue
                seg_t, clipped = self._rle_from_window(
                    window, (0, 0), (ch, cw))
            else:
                seg_t = []
                for p in seg:
                    q = np.asarray(p, np.float64).copy()
                    q[0::2] -= x0
                    q[1::2] -= y0
                    seg_t.append(q.tolist())
            out.append({**a, "segmentation": seg_t, "bbox": clipped,
                        "bbox_mode": BoxMode.XYXY_ABS})
        return img, out

    def _variant_rng(self, idx, min_size, code):
        """Deterministic RNG for a sample's stochastic host augs
        (copy-paste layout, crop window): a pure function of the cache key
        so the streaming loader and the device-resident cache materialize
        identical pixels for the same (idx, min_size, code)."""
        mix = (int(idx) * 1000003 ^ int(min_size) * 7919
               ^ int(code) * 104729 ^ (self.seed + 1) * 2654435761)
        return np.random.RandomState(mix & 0x7fffffff)

    def _raw_image(self, idx):
        """Raw BGR image of one ddict, zero-padded to the raw canvas.
        Cached for training loaders (copy-paste re-reads donors)."""
        if self._img_cache is not None and idx in self._img_cache:
            return self._img_cache[idx]
        img = imread_bgr(self.ddicts[idx]["file_name"])
        if img.shape[:2] != self.raw_shape:
            padded = np.zeros(self.raw_shape + img.shape[2:], img.dtype)
            padded[:img.shape[0], :img.shape[1]] = img
            img = padded
        if self._img_cache is not None:
            if len(self._img_cache) >= 64:
                self._img_cache.pop(next(iter(self._img_cache)))
            self._img_cache[idx] = img
        return img

    def _load_one(self, idx, min_size, flip=False):
        ddict = self.ddicts[idx]
        img = self._raw_image(idx)

        annos = ddict.get("annotations", [])
        rng = (self._variant_rng(idx, min_size, flip)
               if (self.paste_p or self.crop) else None)
        # rotation BEFORE copy-paste: rotating polygon GT is analytic
        # (matrix multiply), while pasted/occluded instances carry RLE
        # segmentations whose rotation dense-decodes a full-resolution
        # plane per instance — paste-then-rotate costs ~10 s/variant on
        # the high-density powder images, rotate-then-paste ~1 s. Both
        # orders are equally valid augmentation laws (pastes land
        # axis-aligned in the rotated frame).
        angle_idx = int(flip) >> 2
        if self.angles and angle_idx < len(self.angles) \
                and self.angles[angle_idx]:
            img, annos = self._rotate_sample(img, annos,
                                             self.angles[angle_idx])
        if self.paste_p and rng.rand() < self.paste_p:
            img, annos = self._copy_paste(img.copy(), annos, rng)
        if self.crop:
            img, annos = self._crop_sample(img, annos, rng)

        h0, w0 = img.shape[:2]
        new_shape = get_resize_shape(h0, w0, min_size, self.max_size)
        sy = new_shape[0] / h0
        sx = new_shape[1] / w0
        g = self.max_gt
        boxes = np.zeros((g, 4), np.float32)
        classes = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        n = min(len(annos), g)

        if self.mask_canvas:
            t = self.mask_canvas
            masks = np.zeros((g, t, t), np.uint8)
            mask_meta = np.zeros((g, 4), np.float32)
            mask_meta[:, 2:4] = 1.0
        else:
            masks = np.zeros((g,) + self.canvas, np.uint8)
            mask_meta = None

        fh, fv = bool(int(flip) & 1), bool(int(flip) & 2)
        for i, a in enumerate(annos[:n]):
            boxes[i] = self._scaled_bbox(a, sx, sy)
            classes[i] = a["category_id"]
            valid[i] = True
            crop, (iy0, ix0) = self._instance_crop(
                a, boxes[i], sx, sy, new_shape)
            if self.mask_canvas:
                if fh:
                    crop = crop[:, ::-1]
                    ix0 = new_shape[1] - (ix0 + crop.shape[1])
                if fv:
                    crop = crop[::-1, :]
                    iy0 = new_shape[0] - (iy0 + crop.shape[0])
                masks[i], mask_meta[i] = instance_mask_canvas(
                    crop, self.mask_canvas, origin=(iy0, ix0))
            else:
                ch, cw = crop.shape
                masks[i, iy0:iy0 + ch, ix0:ix0 + cw] = crop
        if not self.mask_canvas:
            if fh:
                masks[:n, :, :new_shape[1]] = \
                    masks[:n, :, :new_shape[1]][:, :, ::-1]
            if fv:
                masks[:n, :new_shape[0]] = \
                    masks[:n, :new_shape[0]][:, ::-1]

        if fh:
            img = img[:, ::-1].copy()
            x0 = boxes[:n, 0].copy()
            x1 = boxes[:n, 2].copy()
            boxes[:n, 0] = new_shape[1] - x1
            boxes[:n, 2] = new_shape[1] - x0
        if fv:
            img = img[::-1, :].copy()
            y0 = boxes[:n, 1].copy()
            y1 = boxes[:n, 3].copy()
            boxes[:n, 1] = new_shape[0] - y1
            boxes[:n, 3] = new_shape[0] - y0

        return img, new_shape, boxes, classes, valid, masks, mask_meta

    def sample(self, idx, min_size, flip=False):
        """Materialize one sample: ({name: array}, new_shape).

        Pure function of (idx, min_size, flip) — the addressable unit the
        device-resident cache (engine.device_cache.DeviceBatcher) keys on.
        """
        img, ns, b, c, v, m, mm = self._load_one(idx, min_size, flip=flip)
        arrays = {"images": img, "gt_boxes": b, "gt_classes": c,
                  "gt_valid": v, "gt_masks": m,
                  "image_hw": self._true_hw(idx)}
        if mm is not None:
            arrays["gt_mask_meta"] = mm
        return arrays, ns

    def _true_hw(self, idx):
        """True raw extent of one sample (before fixed-canvas padding):
        the in-graph photometric jitter masks its mean/blend to this.
        Crop training emits full-valid crop-sized frames."""
        if self.crop:
            return np.asarray(self.crop, np.int32)
        d = self.ddicts[idx]
        return np.asarray([d["height"], d["width"]], np.int32)

    def draw_flips(self, n):
        """n per-sample augmentation codes from the loader's RNG stream:
        bit 0 = h flip, bit 1 = v flip (independent 0.5 draws, detectron2
        RandomFlip semantics), bits 2+ = rotation index into
        cfg.INPUT.RANDOM_ROTATION (uniform draw)."""
        codes = np.zeros(n, np.int64)
        if self.flip_h:
            codes |= (self.rng.rand(n) < 0.5).astype(np.int64)
        if self.flip_v:
            codes |= (self.rng.rand(n) < 0.5).astype(np.int64) << 1
        if self.angles:
            codes |= self.rng.randint(len(self.angles),
                                      size=n).astype(np.int64) << 2
        return [int(c) for c in codes]

    def _make_batch(self, indices, min_size, flips=None):
        imgs, boxes, classes, valids, masks, metas = [], [], [], [], [], []
        new_shape = None
        if flips is None:
            flips = self.draw_flips(len(indices))
        for idx, flip in zip(indices, flips):
            img, ns, b, c, v, m, mm = self._load_one(idx, min_size,
                                                     flip=flip)
            new_shape = ns
            imgs.append(img)
            boxes.append(b)
            classes.append(c)
            valids.append(v)
            masks.append(m)
            metas.append(mm)
        batch = {
            "images": np.stack(imgs),
            "new_shape": new_shape,
            "canvas": self.canvas,
            "gt_boxes": np.stack(boxes),
            "gt_classes": np.stack(classes),
            "gt_valid": np.stack(valids),
            "gt_masks": np.stack(masks),
            "image_hw": np.stack([self._true_hw(i) for i in indices]),
        }
        if metas[0] is not None:
            batch["gt_mask_meta"] = np.stack(metas)
        return batch

    def __iter__(self):
        """Validation-style single pass, batch size self.batch_size."""
        order = np.arange(len(self.ddicts))
        bs = self.batch_size
        for i in range(0, len(order), bs):
            idx = order[i:i + bs]
            if len(idx) < bs:
                idx = np.concatenate(
                    [idx, order[:bs - len(idx)]])  # wrap to keep shape
            yield self._make_batch(idx, self.min_sizes[0])

    def plan_epochs(self):
        """Infinite (indices, min_size, flips) batch plans.

        The augmentation schedule (shuffled epochs, per-batch scale
        jitter, per-sample flips) separated from materialization so the
        streaming path (_epochs) and the device-resident cache
        (engine.device_cache.DeviceBatcher) sample identically.
        """
        while True:
            order = self.rng.permutation(len(self.ddicts))
            bs = self.batch_size
            for i in range(0, len(order) - bs + 1, bs):
                min_size = self.min_sizes[
                    self.rng.randint(len(self.min_sizes))]
                yield (order[i:i + bs], min_size, self.draw_flips(bs))

    def _epochs(self):
        for indices, min_size, flips in self.plan_epochs():
            yield self._make_batch(indices, min_size, flips)

    def infinite(self, prefetch: int = 2):
        """Training stream: shuffled epochs, per-batch scale jitter.

        Batches are prepared on a background thread (image decode, polygon
        rasterization, GT padding) so host input work overlaps the device
        step — the double-buffered host pipeline of the TPU design
        (SURVEY.md §7 step 7). prefetch=0 disables the thread.
        """
        if prefetch <= 0:
            yield from self._epochs()
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def worker():
            try:
                for batch in self._epochs():
                    if stop.is_set():
                        return
                    q.put(batch)
            except BaseException as e:  # surface loader errors to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def loader_from_config(cfg, dataset_name, train: bool, **kwargs):
    """Build a DetectionLoader for one dataset name or a tuple of names
    (detectron2 semantics: cfg.DATASETS.TRAIN is a tuple and all listed
    datasets concatenate into one training pool)."""
    names = ([dataset_name] if isinstance(dataset_name, str)
             else list(dataset_name))
    ddicts = [d for n in names for d in DatasetCatalog.get(n)]
    return DetectionLoader(ddicts, cfg, train=train, **kwargs)
