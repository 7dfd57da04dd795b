"""On-device image preprocessing (pure JAX + Pallas fast paths).

Replaces the reference's host-side torchvision-v2 transform stacks
(`/root/reference/data/clip_transforms.py:26-56`,
`/root/reference/clip/clip.py:74-81`, `/root/reference/data/data_utils.py:9-31`)
with batched, jit-compiled device code:

  * eval path  — deterministic: antialiased bicubic resize (shorter side) +
    center crop + CLIP normalization; matches PIL/torchvision semantics
    (jax.image.resize uses the same Keys a=-0.5 kernel with antialias
    support scaling).
  * train path — one *composed affine warp* per image instead of the
    reference's sequential RandomResizedCrop -> flip -> rotate: the three
    augmentations are affine maps, so they compose into a single 2x3 matrix
    and the image is resampled exactly once (bicubic), which is both faster
    (one gather pass) and higher quality (one resampling).  The random
    parameter *distributions* match the reference flags: random_crop =
    RandomResizedCrop(scale=(0.5, 1.0), ratio=(3/4, 4/3)), flip = p 0.5
    horizontal, rotation = uniform(-30, 30) degrees with zero fill,
    bottom_crop = bottom-aligned square crop.

All functions take NHWC uint8 batches of a fixed size (static shapes for
XLA) and return normalized float (bf16/f32) batches.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CLIP visual normalization statistics
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(images: jax.Array, mean=CLIP_MEAN, std=CLIP_STD,
              dtype=jnp.float32) -> jax.Array:
    """[.., 3] pixels in 0..255 (uint8 or float) -> CLIP-normalized float."""
    x = images.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def resize_bicubic(images: jax.Array, size: Tuple[int, int],
                   antialias: bool = True) -> jax.Array:
    """Batched antialiased bicubic resize to (H, W) (float32 output)."""
    b, _, _, c = images.shape
    x = images.astype(jnp.float32)
    return jax.image.resize(x, (b, size[0], size[1], c), method="bicubic",
                            antialias=antialias)


def center_crop(images: jax.Array, size: int) -> jax.Array:
    h, w = images.shape[1:3]
    top = (h - size) // 2
    left = (w - size) // 2
    return images[:, top:top + size, left:left + size, :]


def bottom_square_crop(images: jax.Array, size: Optional[int] = None) -> jax.Array:
    """Bottom-aligned, horizontally centered square crop
    (reference `data/data_utils.py:9-31`)."""
    h, w = images.shape[1:3]
    side = min(h, w) if size is None else size
    top = h - side
    left = (w - side) // 2
    return images[:, top:top + side, left:left + side, :]


def _np_keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w1 = (a + 2) * x3 - (a + 3) * x2 + 1
    w2 = a * x3 - 5 * a * x2 + 8 * a * x - 4 * a
    return np.where(x <= 1, w1, np.where(x < 2, w2, 0.0))


def _resize_weight_mat(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] antialiased-bicubic resize weights — replicates
    ``jax.image.resize``'s ``compute_weight_mat`` (scale = out/in,
    translation 0, Keys a=-0.5 kernel, antialias support scaling)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[:, None] - np.arange(in_size)[None, :]) / kernel_scale
    w = _np_keys_cubic(x)
    total = w.sum(axis=1, keepdims=True)
    w = np.where(np.abs(total) > 1000 * np.finfo(np.float32).eps,
                 w / np.where(total != 0, total, 1), 0)
    ok = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return np.where(ok[:, None], w, 0).astype(np.float32)


def _eval_weight_mats(h: int, w: int, resolution: int):
    """Rh [res, h], Rw [res, w]: the resize-shorter-side + center-crop
    composition as two 1-D weight matrices (crop = row slice of the full
    resize matrix)."""
    # torchvision Resize(size:int) semantics: shorter side = size, longer
    # side TRUNCATED (`int(size * long / short)`,
    # torchvision _compute_resized_output_size) — round() deviates by one
    # pixel for many source sizes and shifts the center-crop window
    if h <= w:
        nh, nw = resolution, int(resolution * w / h)
    else:
        nh, nw = int(resolution * h / w), resolution
    mh = _resize_weight_mat(h, nh)
    mw = _resize_weight_mat(w, nw)
    # torchvision center_crop: crop_top = int(round((H - crop_h) / 2.0)) —
    # Python banker's rounding, NOT floor division: for odd differences
    # with an odd half (diff % 4 == 3) round() lands one row LOWER than
    # floor-div (round(17.5) = 18), and the reference's crop window
    # shifts with it (torchvision _geometry.center_crop)
    top, left = (int(round((nh - resolution) / 2.0)),
                 int(round((nw - resolution) / 2.0)))
    return (mh[top:top + resolution], mw[left:left + resolution])


def normalize_stats_for(config):
    """Per-model-family pixel normalization stats: SigLIP checkpoints use
    0.5/0.5 (`models/siglip.py:siglip_normalize_stats`), everything else
    CLIP's stats.  Pass the result as (mean, std) to the transforms —
    hardcoded CLIP stats silently degrade every SigLIP pipeline."""
    from ..models.siglip import SigLIPConfig  # lazy: models imports ops

    if isinstance(config, SigLIPConfig):
        from ..models.siglip import siglip_normalize_stats

        return siglip_normalize_stats()
    return CLIP_MEAN, CLIP_STD


def eval_transform(images_u8: jax.Array, resolution: int,
                   dtype=jnp.float32, mean=CLIP_MEAN,
                   std=CLIP_STD) -> jax.Array:
    """Deterministic CLIP eval transform: resize(shorter side, bicubic AA)
    -> center crop -> normalize.

    The separable AA-bicubic resize and the center crop compose into two
    1-D weight matrices applied as channels-first einsums — measured
    1.95 ms vs 4.63 ms for ``jax.image.resize`` on NHWC (256x439² -> 224,
    v5e; the channels-minor layout forces XLA into bad contractions).
    ``precision='high'`` (bf16x3 MXU passes) keeps parity with the f32
    reference to <0.01 pixel levels; 'highest' measured as slow as the
    old path and 'default' drifts ~0.2 levels (PERF_NOTES.md)."""
    h, w = images_u8.shape[1:3]
    rh, rw = _eval_weight_mats(h, w, resolution)
    x = images_u8.astype(jnp.float32).transpose(0, 3, 1, 2)  # [B, C, H, W]
    t = jnp.einsum("oh,bchw->bcow", jnp.asarray(rh), x, precision="high",
                   preferred_element_type=jnp.float32)
    o = jnp.einsum("pw,bcow->bcop", jnp.asarray(rw), t, precision="high",
                   preferred_element_type=jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    o = (o * (1.0 / 255.0) - mean[:, None, None]) / std[:, None, None]
    return o.astype(dtype).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# Composed affine train augmentation
# ---------------------------------------------------------------------------

def _cubic_kernel(t: jax.Array, a: float = -0.5) -> jax.Array:
    """Keys cubic convolution kernel (a=-0.5 = Catmull-Rom, PIL's BICUBIC)."""
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _gather_pixels(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img [H, W, C]; iy/ix [...] int32 -> pixels [..., C] with clamping."""
    h, w = img.shape[:2]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    flat = img.reshape(h * w, img.shape[2])
    return flat[iy * w + ix]


def _sample_bicubic(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at float coords ys/xs [N] -> [N, C] (separable
    4x4 cubic; edge-clamped)."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0

    acc = 0.0
    wsum = 0.0
    for dy in range(-1, 3):
        wy = _cubic_kernel(ty - dy)
        for dx in range(-1, 3):
            wx = _cubic_kernel(tx - dx)
            wgt = (wy * wx)[:, None]
            px = _gather_pixels(img, (y0 + dy).astype(jnp.int32),
                                (x0 + dx).astype(jnp.int32))
            acc = acc + wgt * px.astype(jnp.float32)
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-8)


def _sample_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = (ys - y0)[:, None]
    tx = (xs - x0)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    p00 = _gather_pixels(img, y0i, x0i).astype(jnp.float32)
    p01 = _gather_pixels(img, y0i, x0i + 1).astype(jnp.float32)
    p10 = _gather_pixels(img, y0i + 1, x0i).astype(jnp.float32)
    p11 = _gather_pixels(img, y0i + 1, x0i + 1).astype(jnp.float32)
    top = p00 * (1 - tx) + p01 * tx
    bot = p10 * (1 - tx) + p11 * tx
    return top * (1 - ty) + bot * ty


def affine_warp(
    images: jax.Array,
    matrices: jax.Array,
    out_size: int,
    method: str = "bicubic",
    fill: float = 0.0,
) -> jax.Array:
    """Warp a batch with per-image affine maps (output coords -> input coords).

    images: [B, H, W, C] (uint8 or float); matrices: [B, 2, 3] mapping
    homogeneous output pixel coords (x, y, 1) to input (x_in, y_in).
    Out-of-bounds samples get ``fill`` (torchvision rotate semantics).
    """
    b, h, w, c = images.shape
    ys, xs = jnp.meshgrid(jnp.arange(out_size, dtype=jnp.float32),
                          jnp.arange(out_size, dtype=jnp.float32),
                          indexing="ij")
    ones = jnp.ones_like(xs)
    # pixel centers at +0.5 (continuous image coordinates)
    coords = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5, ones.ravel()], 0)  # [3, N]

    def warp_one(img, mat):
        src = mat @ coords  # [2, N] -> x_in, y_in (continuous, center-based)
        sx = src[0] - 0.5
        sy = src[1] - 0.5
        sample = _sample_bicubic if method == "bicubic" else _sample_bilinear
        out = sample(img, sy, sx)  # [N, C]
        inside = ((src[0] >= 0.0) & (src[0] <= w) &
                  (src[1] >= 0.0) & (src[1] <= h))[:, None]
        out = jnp.where(inside, out, fill)
        return out.reshape(out_size, out_size, c)

    return jax.vmap(warp_one)(images, matrices)


def _crop_matrix(top, left, ch, cw, out_size: int):
    """Affine map from output pixel coords to a crop box (resize semantics)."""
    sx = cw / out_size
    sy = ch / out_size
    zeros = jnp.zeros_like(sx)
    return jnp.stack([
        jnp.stack([sx, zeros, left], -1),
        jnp.stack([zeros, sy, top], -1),
    ], -2)  # [..., 2, 3]


def _rotation_matrix(theta, out_size: int):
    """Rotate about the output center (in output pixel coords)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx = out_size / 2.0
    # x' = c*(x-cx) - s*(y-cx) + cx ; y' = s*(x-cx) + c*(y-cx) + cx
    tx = cx - c * cx + s * cx
    ty = cx - s * cx - c * cx
    return jnp.stack([
        jnp.stack([c, -s, tx], -1),
        jnp.stack([s, c, ty], -1),
    ], -2)


def _compose(a, b):
    """Compose 2x3 affines: result(x) = a(b(x))."""
    a3 = jnp.concatenate([a, jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, 1.0]]), a.shape[:-2] + (1, 3))], -2)
    b3 = jnp.concatenate([b, jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, 1.0]]), b.shape[:-2] + (1, 3))], -2)
    return (a3 @ b3)[..., :2, :]


def _random_resized_crop_params(key, h: int, w: int,
                                scale=(0.5, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Sample a crop box following torchvision RandomResizedCrop: 10 attempts
    of (area, log-ratio) sampling vectorized via masked first-success, with
    the center-crop fallback."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    n = 10
    area = h * w
    target_area = jax.random.uniform(k_area, (n,), minval=scale[0],
                                     maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (n,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.round(jnp.sqrt(target_area * aspect))
    ch = jnp.round(jnp.sqrt(target_area / aspect))
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    # first successful attempt (or fallback center crop)
    idx = jnp.argmax(ok)
    any_ok = jnp.any(ok)
    cw_s, ch_s = cw[idx], ch[idx]
    u_top = jax.random.uniform(k_top)
    u_left = jax.random.uniform(k_left)
    top = jnp.floor(u_top * (h - ch_s + 1))
    left = jnp.floor(u_left * (w - cw_s + 1))

    # fallback: largest center crop respecting the ratio bounds
    in_ratio = w / h
    fb_w = jnp.where(in_ratio < ratio[0], w, jnp.where(in_ratio > ratio[1],
                                                       jnp.round(h * ratio[1]), w))
    fb_h = jnp.where(in_ratio < ratio[0], jnp.round(w / ratio[0]), h)
    fb_top = jnp.round((h - fb_h) / 2.0)
    fb_left = jnp.round((w - fb_w) / 2.0)

    top = jnp.where(any_ok, top, fb_top)
    left = jnp.where(any_ok, left, fb_left)
    ch_s = jnp.where(any_ok, ch_s, fb_h)
    cw_s = jnp.where(any_ok, cw_s, fb_w)
    return top, left, ch_s, cw_s


@partial(jax.jit, static_argnames=("resolution", "crop_mode", "flip",
                                  "rotation", "dtype", "method"))
def train_transform(
    images_u8: jax.Array,
    key: jax.Array,
    resolution: int,
    crop_mode: str = "random",   # "random" | "bottom" | "center"
    flip: bool = False,
    rotation: bool = False,
    dtype=jnp.float32,
    method: str = "bicubic",
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jax.Array:
    """Batched random augmentation: one fused affine warp + normalize.

    images_u8: [B, H, W, 3] uint8. key: one PRNG key for the batch (split
    per-image internally)."""
    b, h, w, _ = images_u8.shape
    keys = jax.random.split(key, b)

    def per_image_matrix(k):
        k_crop, k_flip, k_rot = jax.random.split(k, 3)
        if crop_mode == "random":
            top, left, ch, cw = _random_resized_crop_params(k_crop, h, w)
        elif crop_mode == "bottom":
            # BottomSquareCrop(resolution): exact crop of the output size,
            # bottom-aligned and horizontally centered (no resampling)
            side = float(min(h, w, resolution))
            top = jnp.asarray(float(h) - side)
            left = jnp.asarray((w - side) // 2.0)
            ch = jnp.asarray(side)
            cw = jnp.asarray(side)
        else:  # center
            side = float(min(h, w))
            top = jnp.asarray((h - side) / 2.0)
            left = jnp.asarray((w - side) / 2.0)
            ch = jnp.asarray(side)
            cw = jnp.asarray(side)
        mat = _crop_matrix(top, left, ch, cw, resolution)

        if flip:
            do = jax.random.bernoulli(k_flip)
            flip_mat = jnp.asarray([[-1.0, 0.0, float(resolution)],
                                    [0.0, 1.0, 0.0]])
            ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
            mat = _compose(mat, jnp.where(do, flip_mat, ident))

        if rotation:
            theta = jax.random.uniform(k_rot, minval=-30.0, maxval=30.0)
            rot = _rotation_matrix(jnp.deg2rad(theta), resolution)
            mat = _compose(mat, rot)
        else:
            rot = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        return mat, rot

    mats, rots = jax.vmap(per_image_matrix)(keys)
    warped = affine_warp(images_u8, mats, resolution, method=method)
    if rotation:
        # the reference rotates the CROPPED image with fill=0
        # (`/root/reference/data/clip_transforms.py`): black corners
        # whenever the rotated grid leaves the crop FRAME — mask at the
        # output frame, not just the source-image bounds (an interior
        # crop would otherwise sample real pixels beyond the crop box)
        ys, xs = jnp.meshgrid(
            jnp.arange(resolution, dtype=jnp.float32),
            jnp.arange(resolution, dtype=jnp.float32), indexing="ij")
        coords = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5,
                            jnp.ones_like(xs).ravel()], 0)

        def frame_mask(rot):
            src = rot @ coords
            return ((src[0] >= 0.0) & (src[0] <= resolution)
                    & (src[1] >= 0.0) & (src[1] <= resolution))

        mask = jax.vmap(frame_mask)(rots).reshape(b, resolution,
                                                  resolution, 1)
        warped = jnp.where(mask, warped, 0.0)
    warped = jnp.clip(warped, 0.0, 255.0)
    return normalize(warped, mean, std, dtype=dtype)


@partial(jax.jit, static_argnames=("resolution", "dtype", "mean", "std"))
def eval_transform_jit(images_u8: jax.Array, resolution: int,
                       dtype=jnp.float32, mean=CLIP_MEAN,
                       std=CLIP_STD) -> jax.Array:
    return eval_transform(images_u8, resolution, dtype=dtype, mean=mean,
                          std=std)
