"""Single/batched-image inference driver (detectron2 DefaultPredictor
replacement; reference call stack SURVEY.md §3.3).

Takes cv2-convention BGR uint8 images, resizes shortest-edge in-graph,
runs the jitted Mask R-CNN, and returns a detectron2-shaped output
``{'instances': Instances(pred_boxes, scores, pred_classes, pred_masks)}``
with ``pred_masks`` as lazy SoftMasks (28x28 soft masks + boxes; the fused
host C++ paste+RLE kicks in on consumption, e.g. in
data_utils.compress_pred).

Compilation is cached per (raw image shape -> canvas) pair; datasets with a
single image size compile exactly one program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..input.transforms import (get_resize_shape, pad_to_canvas_shape,
                                preprocess_image)
from ..models.mask_rcnn import MaskRCNN, build_model, init_params
from ..structures import Instances, SoftMasks
from ..utils.compile_cache import enable_persistent_cache
from .checkpoint import load_weights


def maskness_rescore(scores, soft_masks, alpha):
    """Training-free score recalibration from mask confidence.

    ``maskness`` (SOLOv2, arXiv:2003.10152 §3.3) is the mean foreground
    probability of a predicted soft mask — a free proxy for the learned
    mask-IoU head of Mask Scoring R-CNN. Classification scores rank
    detections by *box* confidence only; multiplying in ``maskness**alpha``
    demotes detections whose mask the head itself is unsure about, which
    is exactly what mask AP integrates over.

    scores: (N,) classification scores.
    soft_masks: (N, M, M) sigmoid probabilities.
    Returns the rescored (N,) array (alpha == 0 returns scores unchanged).
    """
    if not alpha or not len(scores):
        return scores
    if alpha < 0:
        # 0.0 ** negative == inf for zero-foreground masks, which would
        # silently corrupt the score ordering.
        raise ValueError(f"maskness alpha must be >= 0, got {alpha}")
    fg = soft_masks > 0.5
    npix = fg.sum(axis=(1, 2))
    maskness = np.where(
        npix > 0,
        (soft_masks * fg).sum(axis=(1, 2)) / np.maximum(npix, 1), 0.0)
    return scores * maskness.astype(scores.dtype) ** alpha


class DefaultPredictor:
    """predictor = DefaultPredictor(cfg); outputs = predictor(bgr_image)."""

    def __init__(self, cfg, params=None):
        enable_persistent_cache()
        self.cfg = cfg
        self.model = build_model(cfg)
        if params is None:
            if cfg.MODEL.WEIGHTS:
                params = load_weights(cfg.MODEL.WEIGHTS, self.model)
            else:
                params = init_params(self.model, jax.random.PRNGKey(0))
        self.params = params
        self.input_format = cfg.INPUT.FORMAT
        self._compiled = {}
        # cfg.TPU.INT8_MASK_HEAD == "static" auto-calibrates activation
        # scales on the first batch (one extra compile) unless the
        # checkpoint already carries a calibrated "quant" collection.
        # A fresh init DOES carry the collection (all-zero scales), so
        # "missing" and "all-zero" both mean un-calibrated.
        quant = (self.params.get("quant")
                 if isinstance(self.params, dict) else None)
        statics = {
            k: "calib"
            for k in ("int8_mask_head", "int8_backbone", "int8_neck")
            if getattr(self.model, k, False) == "static"}
        # all-leaves check: with several independent int8 groups, a tree
        # calibrated for one group but zero for a newly enabled one must
        # recalibrate (quantize_static(x, 0) yields clipped garbage)
        self._needs_calib = bool(statics) and (
            quant is None
            or not all(float(s) > 0 for s in jax.tree.leaves(quant)))
        if self._needs_calib:
            self._calib_model = self.model.clone(**statics)

    # -- jitted core --------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "new_shape", "canvas"))
    def _run(self, images, new_shape, canvas):
        mean = tuple(self.cfg.MODEL.PIXEL_MEAN)
        std = tuple(self.cfg.MODEL.PIXEL_STD)

        def prep(img):
            return preprocess_image(img, new_shape, canvas, mean, std)

        batch = jax.vmap(prep)(images)
        sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                         (images.shape[0], 1))
        return self.model.apply(self.params, batch, sizes,
                                method=MaskRCNN.inference)

    @partial(jax.jit, static_argnames=("self", "new_shape", "canvas"))
    def _run_calib(self, images, new_shape, canvas):
        """Float forward that records int8 activation scales ("quant")."""
        mean = tuple(self.cfg.MODEL.PIXEL_MEAN)
        std = tuple(self.cfg.MODEL.PIXEL_STD)
        batch = jax.vmap(
            lambda im: preprocess_image(im, new_shape, canvas, mean, std)
        )(images)
        sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                         (images.shape[0], 1))
        _, mut = self._calib_model.apply(
            self.params, batch, sizes, method=MaskRCNN.inference,
            mutable=["quant"])
        return mut["quant"]

    def __hash__(self):  # allow self as static arg
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- public API ---------------------------------------------------------

    def __call__(self, original_image: np.ndarray):
        return self.predict_batch([original_image])[0]

    def predict_batch(self, images):
        """Run inference on a list of same-shape BGR uint8 images."""
        raw = np.stack([np.ascontiguousarray(im) for im in images])
        if raw.ndim == 3:
            raw = raw[..., None]
        h0, w0 = raw.shape[1:3]
        new_shape = get_resize_shape(h0, w0, self.cfg.INPUT.MIN_SIZE_TEST,
                                     self.cfg.INPUT.MAX_SIZE_TEST)
        canvas = pad_to_canvas_shape(*new_shape,
                                     fixed=self.cfg.INPUT.FIXED_SIZE)
        if self._needs_calib:
            quant = self._run_calib(jnp.asarray(raw), new_shape, canvas)
            if not all(float(s) > 0 for s in jax.tree.leaves(quant)):
                import warnings
                warnings.warn(
                    "int8 calibration batch produced no valid detections; "
                    "activation scales are degenerate (masks will be "
                    "garbage). Calibrate on images the model detects "
                    "objects in, or use INT8_MASK_HEAD=False.",
                    stacklevel=2)
            self.params = {**self.params, "quant": quant}
            self._needs_calib = False
        out = self._run(jnp.asarray(raw), new_shape, canvas)
        out = jax.tree.map(np.asarray, out)
        if int(out.get("mask_dropped", 0)) > 0:
            import warnings
            warnings.warn(
                f"mask-stage capacity overflow: {int(out['mask_dropped'])} "
                f"valid detections in this batch got empty masks — raise "
                f"cfg.TPU.MASK_CAPACITY_PER_IMAGE (or set 0 for the exact "
                f"path).", stacklevel=2)

        sy = h0 / new_shape[0]
        sx = w0 / new_shape[1]
        results = []
        for i in range(raw.shape[0]):
            valid = out["valid"][i]
            boxes = out["boxes"][i][valid]
            # back to original image coordinates
            boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w0)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h0)
            scores = out["scores"][i][valid]
            classes = out["classes"][i][valid].astype(np.int64)
            soft = out["masks"][i][valid]
            alpha = float(getattr(self.cfg.TEST, "MASKNESS_RESCORE", 0.0))
            if alpha:
                scores = maskness_rescore(scores, soft, alpha)
                order = np.argsort(-scores, kind="stable")
                boxes, scores, classes, soft = (
                    boxes[order], scores[order], classes[order], soft[order])
            masks = SoftMasks(soft, boxes, (h0, w0))
            inst = Instances((h0, w0), pred_boxes=boxes.astype(np.float32),
                             scores=scores.astype(np.float32),
                             pred_classes=classes, pred_masks=masks)
            results.append({"instances": inst})
        return results
