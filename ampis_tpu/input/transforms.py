"""Input pipeline: resize / normalize / pad, fused into the XLA graph.

Replaces detectron2's DatasetMapper + ResizeShortestEdge host-side pipeline
(reference data_utils.py:174, SURVEY.md §2b). Shape policy for TPU: the
resize target for a given raw image shape is a *static* Python computation
(get_resize_shape), so each distinct raw shape compiles one program whose
output canvas is fixed (rounded up to a multiple of 32); the actual resized
extent travels alongside as data.

Resize uses jax.image.resize(bilinear, antialias=True), which matches the
PIL bilinear filter detectron2 applies to uint8 inputs.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SIZE_DIVISIBILITY = 32


def get_resize_shape(h: int, w: int, min_size: int, max_size: int):
    """New (h, w) after shortest-edge resize capped by max_size (static)."""
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    newh, neww = h * scale, w * scale
    # detectron2 rounds each side half-up
    return int(newh + 0.5), int(neww + 0.5)


def pad_to_canvas_shape(h: int, w: int, fixed=None):
    if fixed is not None:
        return tuple(fixed)
    d = SIZE_DIVISIBILITY
    return (math.ceil(h / d) * d, math.ceil(w / d) * d)


@partial(jax.jit, static_argnames=("new_shape", "canvas", "fmt"))
def preprocess_image(image, new_shape, canvas, pixel_mean, pixel_std,
                     fmt="BGR"):
    """uint8 (H, W, 3|1) image -> normalized float padded (Hc, Wc, 3).

    ``image`` channel order must already match ``fmt`` (the reference uses
    cv2 BGR reads + caffe-style BGR pixel means). Grayscale images are
    stacked to 3 channels (SEM micrographs are grayscale).
    """
    img = image
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[-1] == 1:
        img = jnp.repeat(img, 3, axis=-1)
    img = img.astype(jnp.float32)
    nh, nw = new_shape
    if (nh, nw) != img.shape[:2]:
        img = jax.image.resize(img, (nh, nw, 3), method="bilinear",
                               antialias=True)
    img = (img - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    ch, cw = canvas
    img = jnp.pad(img, ((0, ch - nh), (0, cw - nw), (0, 0)))
    return img


def resize_scale(orig_shape, new_shape):
    """(sy, sx) mapping resized coords back to original coords."""
    return (orig_shape[0] / new_shape[0], orig_shape[1] / new_shape[1])


def flip_image_and_boxes(image: np.ndarray, boxes: np.ndarray):
    """Host-side horizontal flip (train augmentation), boxes XYXY."""
    w = image.shape[1]
    flipped = image[:, ::-1].copy()
    out = boxes.copy()
    out[:, 0] = w - boxes[:, 2]
    out[:, 2] = w - boxes[:, 0]
    return flipped, out
