"""Image IO helpers (replacing the reference's skimage.io / cv2 reads).

``imread`` follows skimage.io.imread conventions (RGB channel order,
grayscale images stay 2-D); ``imread_bgr`` follows cv2.imread (always
3-channel BGR) because the reference's visualizer reads images that way
(reference visualize.py:154) and channel order is part of output parity.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def imread(path, as_gray: bool = False) -> np.ndarray:
    img = Image.open(Path(path))
    if as_gray:
        if img.mode not in ("L", "I", "F", "1"):
            img = img.convert("F")  # luminance, float
            arr = np.asarray(img, dtype=np.float64) / 255.0
            return arr
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            return arr.astype(np.float64) / 255.0
        return arr.astype(np.float64)
    arr = np.asarray(img)
    return arr


def imread_bgr(path) -> np.ndarray:
    """cv2.imread-style read: uint8 BGR, 3 channels."""
    img = Image.open(Path(path)).convert("RGB")
    arr = np.asarray(img)
    return arr[:, :, ::-1].copy()


def gray2rgb(img: np.ndarray) -> np.ndarray:
    """Stack a 2-D image to 3 channels (skimage.color.gray2rgb)."""
    if img.ndim == 3:
        return img
    return np.stack([img] * 3, axis=-1)


def imsave(path, img: np.ndarray):
    Image.fromarray(img).save(Path(path))
