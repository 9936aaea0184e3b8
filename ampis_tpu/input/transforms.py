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


_RESIZE_MAT_CACHE = {}


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear/antialias weight matrix.

    Reproduces jax.image.resize(method='bilinear', antialias=True) — a
    triangle kernel at scale min(out/in, 1) with total-sum normalization —
    as an explicit matrix, so the separable resize runs as two MXU matmuls
    instead of the generic lowering (3-channel images tile terribly on the
    VPU path; measured 3x faster end-to-end on v5e). Verified against
    jax.image.resize in tests/test_transforms.py.
    """
    key = (n_in, n_out)
    if key not in _RESIZE_MAT_CACHE:
        scale = n_out / n_in
        kscale = min(scale, 1.0)
        x = (np.arange(n_out) + 0.5) / scale - 0.5
        j = np.arange(n_in)
        w = np.maximum(0.0, 1.0 - np.abs((j[None, :] - x[:, None]) * kscale))
        _RESIZE_MAT_CACHE[key] = (w / w.sum(axis=1, keepdims=True)).astype(
            np.float32)
    return _RESIZE_MAT_CACHE[key]


def _resize_matmul(img, new_shape):
    """Separable bilinear+antialias resize of (H, W, C) via two matmuls.

    On TPU this runs in bf16 with f32 accumulation: uint8 pixel values are
    exact in bf16 and the result feeds a bf16 backbone, so the ~0.4%
    weight rounding is below the compute precision downstream. Off-TPU
    (CPU parity tests, GPU) the matrices stay f32 — the 3-channel tiling
    rationale for bf16 doesn't apply there.
    """
    h, w, c = img.shape
    nh, nw = new_shape
    mat_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    ry = jnp.asarray(_resize_matrix(h, nh)).astype(mat_dtype)
    rx = jnp.asarray(_resize_matrix(w, nw)).astype(mat_dtype)
    x = img.astype(mat_dtype)
    t = jnp.einsum("oh,hwc->owc", ry, x,
                   preferred_element_type=jnp.float32).astype(mat_dtype)
    return jnp.einsum("pw,owc->opc", rx, t,
                      preferred_element_type=jnp.float32)


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
        img = _resize_matmul(img, (nh, nw))
    img = (img - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    ch, cw = canvas
    img = jnp.pad(img, ((0, ch - nh), (0, cw - nw), (0, 0)))
    return img


def photometric_jitter(image, key, brightness=(1.0, 1.0),
                       contrast=(1.0, 1.0), valid_hw=None):
    """Random brightness/contrast on one raw (H, W, C) image, in-graph.

    detectron2 transform semantics (T.RandomBrightness: img * w;
    T.RandomContrast: mean(img) * (1 - w) + img * w, each w ~ U[min, max],
    clipped to [0, 255] like BlendTransform on uint8 images) applied on
    the raw pixel scale *before* resize/normalize, matching where
    DatasetMapper applies them host-side. ``valid_hw`` (h, w) restricts
    the contrast mean and the blend to the true image extent so the
    fixed-canvas zero padding neither biases the mean nor becomes
    nonzero; None means the whole canvas is valid. Train-only; identity
    ranges are the caller's signal to skip the call entirely.
    """
    kb, kc = jax.random.split(key)
    img = image.astype(jnp.float32)
    wb = jax.random.uniform(kb, (), minval=brightness[0],
                            maxval=brightness[1])
    wc = jax.random.uniform(kc, (), minval=contrast[0], maxval=contrast[1])
    if valid_hw is None:
        valid = jnp.ones(img.shape[:2], jnp.float32)[:, :, None]
    else:
        valid = ((jnp.arange(img.shape[0]) < valid_hw[0])[:, None]
                 & (jnp.arange(img.shape[1]) < valid_hw[1])[None, :]
                 ).astype(jnp.float32)[:, :, None]
    # brightness first, then contrast blends toward the *brightened*
    # image's valid-extent mean (mean is linear: mean(img * wb) = wb * m)
    mean = wb * jnp.sum(img * valid) / jnp.maximum(
        jnp.sum(valid) * img.shape[-1], 1.0)
    out = (img * wb) * wc + mean * (1.0 - wc)
    return jnp.clip(out, 0.0, 255.0) * valid


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
