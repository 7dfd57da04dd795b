"""Matmul-formulated image warping (TPU-fast train augmentation).

The naive affine warp (``preprocess.affine_warp``) is a 16-tap gather per
output pixel — measured ~2.2 s per 256-image batch on TPU v5e, because
TPUs execute gathers on the scalar path.  This module reformulates the
augmentation pipeline as dense MXU work:

  * crop + flip + resize are *separable*: per-image 1-D bicubic weight
    matrices Wy [B, out, H] and Wx [B, out, W] are built with broadcasted
    arithmetic (no gathers) and applied as two batched matmuls
    (~0.4 GFLOP/image — microseconds on the MXU).  Antialiasing is exact:
    the kernel support widens with the per-image downscale factor, like
    PIL/torchvision.
  * rotation uses the classic 3-shear decomposition
    R(θ) = Shx(-tan θ/2) · Shy(sin θ) · Shx(-tan θ/2); each shear is a
    per-row (or per-column) 1-D fractional translation, expressed as one
    [S, S, S] weight tensor shared across the batch and applied with a
    batched matmul.  The angle is therefore sampled *per batch step*
    rather than per image (a documented distributional relaxation —
    every image still sees fresh angles across steps/epochs; set
    ``rotation_mode='per_image'`` on the slow path for reference-exact
    per-image angles).

Zero fill outside the source (torchvision rotate semantics) falls out of
the shear matrices naturally (rows whose support leaves the image get
zero weight mass).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    _cubic_kernel as _cubic_weight,  # ONE Keys-kernel implementation
    _random_resized_crop_params,
    normalize,
)


def _linear_weight(t: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _resample_matrix(starts: jax.Array, scales: jax.Array, out_size: int,
                     in_size: int, method: str = "bicubic",
                     antialias: bool = True) -> jax.Array:
    """Per-image 1-D resampling weights W [B, out_size, in_size].

    Sample o maps to source coord starts + (o + 0.5) * scales - 0.5; the
    kernel support widens by max(scale, 1) when antialiasing."""
    o = jnp.arange(out_size, dtype=jnp.float32)
    i = jnp.arange(in_size, dtype=jnp.float32)
    src = starts[:, None] + (o[None, :] + 0.5) * scales[:, None] - 0.5  # [B,O]
    widen = jnp.maximum(scales, 1.0) if antialias else jnp.ones_like(scales)
    t = (i[None, None, :] - src[:, :, None]) / widen[:, None, None]
    w = _cubic_weight(t) if method == "bicubic" else _linear_weight(t)
    # normalize so rows sum to 1 (AA widening + edge clamping)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    return w


def separable_resize_crop(
    images: jax.Array,
    boxes: jax.Array,
    out_size: int,
    flip_mask: Optional[jax.Array] = None,
    method: str = "bicubic",
    antialias: bool = True,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Crop + (flip) + resize via two batched matmuls.

    images: [B, H, W, C] (uint8/float); boxes: [B, 4] float (top, left,
    crop_h, crop_w); flip_mask: [B] bool horizontal mirror."""
    b, h, w, c = images.shape
    top, left, ch, cw = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    wy = _resample_matrix(top, ch / out_size, out_size, h, method, antialias)
    wx = _resample_matrix(left, cw / out_size, out_size, w, method, antialias)
    if flip_mask is not None:
        wx = jnp.where(flip_mask[:, None, None], wx[:, ::-1, :], wx)

    img = images.astype(jnp.float32)
    tmp = jnp.einsum("boh,bhwc->bowc", wy, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bpw,bowc->bopc", wx, tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _shear_matrix_x(offsets: jax.Array, size: int,
                    method: str = "bicubic") -> jax.Array:
    """Per-row 1-D translation weights S [size(y), size(x_out), size(x_in)]
    for out[y, x] = in[y, x + offsets[y]]."""
    x = jnp.arange(size, dtype=jnp.float32)
    src = x[None, :] + offsets[:, None]            # [Y, X_out]
    t = x[None, None, :] - src[:, :, None]         # [Y, X_out, X_in]
    w = _cubic_weight(t) if method == "bicubic" else _linear_weight(t)
    # do NOT renormalize: rows leaving the image lose mass -> zero fill
    return w


def rotate_shear(images: jax.Array, theta: jax.Array,
                 method: str = "bicubic") -> jax.Array:
    """Rotate a square batch about its center by a (traced) scalar angle
    using the 3-shear decomposition; zero fill outside the source."""
    b, s, s2, c = images.shape
    assert s == s2, "rotate_shear expects square images"
    cy = (s - 1) / 2.0
    y = jnp.arange(s, dtype=jnp.float32) - cy

    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)

    sx1 = _shear_matrix_x(alpha * y, s, method)       # [Y, Xo, Xi]
    sy = _shear_matrix_x(beta * y, s, method)         # reused for y-shear
    sx2 = sx1

    x = images.astype(jnp.float32)
    # shear x: per-row matmul over the x axis
    x = jnp.einsum("yxj,byjc->byxc", sx1, x,
                   preferred_element_type=jnp.float32)
    # shear y: per-column matmul over the y axis (offsets indexed by x)
    x = jnp.einsum("xyj,bjxc->byxc", sy, x,
                   preferred_element_type=jnp.float32)
    # shear x again
    x = jnp.einsum("yxj,byjc->byxc", sx2, x,
                   preferred_element_type=jnp.float32)
    return x


@partial(jax.jit, static_argnames=("resolution", "crop_mode", "flip",
                                  "rotation", "dtype", "method",
                                  "antialias"))
def fast_train_transform(
    images_u8: jax.Array,
    key: jax.Array,
    resolution: int,
    crop_mode: str = "random",
    flip: bool = False,
    rotation: bool = False,
    dtype=jnp.float32,
    method: str = "bicubic",
    antialias: bool = True,
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jax.Array:
    """MXU-formulated train augmentation: per-image random crop/flip
    (separable matmuls) + per-batch-angle rotation (shear matmuls) +
    normalize. Matches the reference's augmentation distributions (see
    module docstring for the rotation-angle relaxation)."""
    b, h, w, _ = images_u8.shape
    k_imgs, k_rot = jax.random.split(key)
    keys = jax.random.split(k_imgs, b)

    def per_image_box(k):
        k_crop, k_flip = jax.random.split(k)
        if crop_mode == "random":
            top, left, ch, cw = _random_resized_crop_params(k_crop, h, w)
        elif crop_mode == "bottom":
            side = float(min(h, w, resolution))
            top = jnp.asarray(float(h) - side)
            left = jnp.asarray((w - side) // 2.0)
            ch = cw = jnp.asarray(side)
        else:
            side = float(min(h, w))
            top = jnp.asarray((h - side) / 2.0)
            left = jnp.asarray((w - side) / 2.0)
            ch = cw = jnp.asarray(side)
        do_flip = jax.random.bernoulli(k_flip) if flip else jnp.asarray(False)
        return jnp.stack([top, left, ch, cw]).astype(jnp.float32), do_flip

    boxes, flips = jax.vmap(per_image_box)(keys)
    out = separable_resize_crop(images_u8, boxes, resolution,
                                flip_mask=flips if flip else None,
                                method=method, antialias=antialias)
    if rotation:
        theta = jnp.deg2rad(jax.random.uniform(k_rot, minval=-30.0,
                                               maxval=30.0))
        out = rotate_shear(out, theta, method=method)
    out = jnp.clip(out, 0.0, 255.0)
    return normalize(out, mean, std, dtype=dtype)
