"""Pallas fused normalize kernel (interpret mode on CPU) vs the jnp path."""

import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.ops.pallas_preprocess import (
    _phase_tables,
    normalize_u8_pallas,
)
from aihab_clip_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, normalize


def test_phase_tables():
    scale, shift = _phase_tables(CLIP_MEAN, CLIP_STD, 384)
    assert scale.shape == (384,)
    # lane 0,3,6.. carry channel 0; 1,4,.. channel 1
    assert scale[0] == pytest.approx(1.0 / (255 * CLIP_STD[0]))
    assert scale[4] == pytest.approx(1.0 / (255 * CLIP_STD[1]))
    assert shift[2] == pytest.approx(-CLIP_MEAN[2] / CLIP_STD[2])


@pytest.mark.parametrize("shape", [(2, 32, 32, 3), (1, 17, 13, 3),
                                   (3, 224, 224, 3)])
def test_pallas_normalize_matches_jnp(rng, shape):
    imgs = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ref = np.asarray(normalize(jnp.asarray(imgs), dtype=jnp.float32))
    out = np.asarray(normalize_u8_pallas(jnp.asarray(imgs),
                                         dtype=jnp.float32,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_normalize_bf16(rng):
    imgs = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)
    out = normalize_u8_pallas(jnp.asarray(imgs), dtype=jnp.bfloat16,
                              interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = normalize(jnp.asarray(imgs), dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)


def test_rejects_bad_inputs(rng):
    with pytest.raises(ValueError):
        normalize_u8_pallas(jnp.zeros((1, 4, 4, 3), jnp.float32))
    with pytest.raises(ValueError):
        normalize_u8_pallas(jnp.zeros((1, 4, 4, 1), jnp.uint8))
