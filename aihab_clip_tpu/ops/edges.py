"""Edge-map augmentations (Canny) and multi-view transforms.

Capability parity with `/root/reference/data/data_utils.py:33-210`.  Canny
hysteresis is inherently sequential/host work, so these operate on uint8
numpy batches *before* device upload; the multi-view helpers express the
reference's SupCon two-view idea with explicit PRNG keys on the device
augmentation path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def canny_rgb(images_u8: np.ndarray, threshold1: int = 10,
              threshold2: int = 50) -> np.ndarray:
    """Per-channel Canny edge maps for a [B, H, W, 3] (or [H, W, 3]) batch.

    Reference ``CannyTransformRGB``: Canny on each of R/G/B independently,
    merged back into a 3-channel edge image."""
    import cv2

    single = images_u8.ndim == 3
    batch = images_u8[None] if single else images_u8
    out = np.empty_like(batch)
    for i, img in enumerate(batch):
        chans = [cv2.Canny(img[:, :, c], threshold1, threshold2)
                 for c in range(img.shape[2])]
        out[i] = np.stack(chans, axis=-1)
    return out[0] if single else out


def canny_grayscale(images_u8: np.ndarray, threshold1: int = 10,
                    threshold2: int = 50) -> np.ndarray:
    """Grayscale Canny edge map (reference ``CannyTransformGS``).
    [B, H, W, 3] -> [B, H, W] uint8."""
    import cv2

    single = images_u8.ndim == 3
    batch = images_u8[None] if single else images_u8
    out = np.empty(batch.shape[:3], np.uint8)
    for i, img in enumerate(batch):
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        out[i] = cv2.Canny(gray, threshold1, threshold2)
    return out[0] if single else out


def edge_augment(images_u8: np.ndarray, threshold1: int = 10,
                 threshold2: int = 50,
                 alpha: float = 0.5, beta: float = 0.5,
                 gamma: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Reference ``EdgeAug``: returns (original, edge-map) pairs — callers
    concatenate along batch (doubling the effective batch size)."""
    edges = canny_rgb(images_u8, threshold1, threshold2)
    return images_u8, edges


def edge_blend(images_u8: np.ndarray, threshold1: int = 10,
               threshold2: int = 50, alpha: float = 0.5, beta: float = 0.5,
               gamma: float = 0.0) -> np.ndarray:
    """Weighted blend of image and its RGB edge map
    (cv2.addWeighted semantics)."""
    import cv2

    single = images_u8.ndim == 3
    batch = images_u8[None] if single else images_u8
    edges = canny_rgb(batch, threshold1, threshold2)
    out = np.empty_like(batch)
    for i in range(len(batch)):
        out[i] = cv2.addWeighted(batch[i], alpha, edges[i], beta, gamma)
    return out[0] if single else out


def two_view_batch(images_u8, key, transform, transform2=None, **kw):
    """Two augmented views of the same batch (SupCon-style).

    ``transform(images, key, **kw)`` is the device train transform; the two
    views use independent folds of the key (reference
    ``SupConTwoViewTransform`` / ``TwoViewTransform``)."""
    import jax

    k1, k2 = jax.random.split(key)
    t2 = transform2 or transform
    return [transform(images_u8, k1, **kw), t2(images_u8, k2, **kw)]
