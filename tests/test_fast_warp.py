"""Matmul-formulated augmentation vs the gather-based reference path."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from aihab_clip_tpu.ops.fast_warp import (
    fast_train_transform,
    rotate_shear,
    separable_resize_crop,
)
from aihab_clip_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    affine_warp,
    train_transform,
)


def _rand_u8(rng, b=2, h=64, w=64):
    return rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8)


def test_separable_matches_gather_warp(rng):
    """Same crop box, no AA: separable matmuls == 16-tap gather bicubic."""
    img = _rand_u8(rng, b=2)
    boxes = jnp.asarray([[8.0, 16.0, 40.0, 40.0], [0.0, 0.0, 64.0, 64.0]])
    sep = np.asarray(separable_resize_crop(jnp.asarray(img), boxes, 32,
                                           antialias=False))
    mats = []
    for b in range(2):
        top, left, ch, cw = np.asarray(boxes[b])
        mats.append([[cw / 32, 0.0, left], [0.0, ch / 32, top]])
    gat = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(mats), 32))
    # interior agreement (edges differ: renormalize vs clamp)
    diff = np.abs(sep[:, 2:-2, 2:-2] - gat[:, 2:-2, 2:-2])
    assert diff.max() < 1.0


def test_separable_antialias_matches_pil(rng):
    """Full-image box with AA vs PIL bicubic downscale."""
    img = _rand_u8(rng, b=1, h=96, w=96)[0]
    boxes = jnp.asarray([[0.0, 0.0, 96.0, 96.0]])
    ours = np.asarray(separable_resize_crop(jnp.asarray(img[None]), boxes, 48,
                                            antialias=True))[0]
    ref = np.asarray(Image.fromarray(img).resize((48, 48), Image.BICUBIC)
                     ).astype(np.float32)
    err = np.abs(ours - ref)
    assert err.mean() < 1.0
    assert np.percentile(err, 99) < 4.0


def test_separable_flip(rng):
    img = _rand_u8(rng, b=2)
    boxes = jnp.asarray([[0.0, 0.0, 64.0, 64.0]] * 2)
    flips = jnp.asarray([False, True])
    out = np.asarray(separable_resize_crop(jnp.asarray(img), boxes, 64,
                                           flip_mask=flips, antialias=False))
    np.testing.assert_allclose(out[0], img[0].astype(np.float32), atol=1.0)
    np.testing.assert_allclose(out[1], img[1, :, ::-1].astype(np.float32),
                               atol=1.0)


def _structured_img(h=48, w=48):
    """Smooth gradients + a bar: resampling schemes agree on structured
    content (noise comparisons are meaningless across interpolators)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([2.0 * x, 2.0 * y, 100 + 50 * np.sin(x / 6)], -1)
    img[10:20, 5:40] += 60.0
    return np.clip(img, 0, 255).astype(np.uint8)


def test_rotate_shear_matches_gather_rotation(rng):
    """3-shear rotation vs the affine-matrix gather rotation at 12 deg."""
    img = np.stack([_structured_img(), _structured_img()[::-1]], 0)
    theta = np.deg2rad(12.0)
    shear = np.asarray(rotate_shear(jnp.asarray(img).astype(jnp.float32),
                                    jnp.asarray(theta)))

    c, s = np.cos(theta), np.sin(theta)
    cx = 48 / 2.0
    mats = np.asarray([[[c, -s, cx - c * cx + s * cx],
                        [s, c, cx - s * cx - c * cx]]] * 2)
    gat = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(mats), 48))

    # compare away from borders (fill handling differs slightly at edges)
    a = shear[:, 10:-10, 10:-10]
    b = gat[:, 10:-10, 10:-10]
    assert np.abs(a - b).mean() < 6.0
    # same orientation: strong pixel correlation
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98


def test_rotate_shear_zero_angle_identity(rng):
    img = jnp.asarray(_rand_u8(rng, b=1, h=32, w=32)).astype(jnp.float32)
    out = np.asarray(rotate_shear(img, jnp.asarray(0.0)))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)


def test_fast_train_transform_contract(rng):
    img = jnp.asarray(_rand_u8(rng, b=4, h=96, w=96))
    key = jax.random.key(0)
    out = np.asarray(fast_train_transform(img, key, 64, crop_mode="random",
                                          flip=True, rotation=True))
    assert out.shape == (4, 64, 64, 3)
    assert np.isfinite(out).all()
    # deterministic per key
    out2 = np.asarray(fast_train_transform(img, key, 64, crop_mode="random",
                                           flip=True, rotation=True))
    np.testing.assert_array_equal(out, out2)
    # constant image stays constant under crop-only augmentation
    const = jnp.asarray(np.full((2, 96, 96, 3), 128, np.uint8))
    o = np.asarray(fast_train_transform(const, key, 64, crop_mode="random"))
    px = (o * np.array(CLIP_STD) + np.array(CLIP_MEAN)) * 255.0
    np.testing.assert_allclose(px, 128.0, atol=1.0)


def test_fast_vs_slow_distributional(rng):
    """Fast (matmul) and slow (gather) paths produce pixel stats in the
    same range under identical flags."""
    img = jnp.asarray(_rand_u8(rng, b=8, h=64, w=64))
    f = np.asarray(fast_train_transform(img, jax.random.key(1), 32,
                                        crop_mode="random", antialias=False))
    s = np.asarray(train_transform(img, jax.random.key(1), 32,
                                   crop_mode="random"))
    assert abs(f.mean() - s.mean()) < 0.2
    assert abs(f.std() - s.std()) < 0.2
