"""Standalone numerics goldens: recorded reference-torch activations.

These tests carry the same evidence as test_model_parity.py but do not
need /root/reference mounted — the oracle outputs (tiny random models,
fixed seeds) are recorded npz files under tests/golden/
(regenerate with tests/golden/generate_goldens.py where the reference
is available)."""

import json
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = pathlib.Path(__file__).parent / "golden"

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "vit_golden.npz").is_file(),
    reason="golden files not generated")


def _load(name):
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel
    from aihab_clip_tpu.models.convert import load_params_npz

    data = np.load(GOLDEN / f"{name}_golden.npz")
    params = load_params_npz(GOLDEN / f"{name}_params.npz")
    cfg_d = json.loads(str(data["config"]))
    if isinstance(cfg_d["vision_layers"], list):
        cfg_d["vision_layers"] = tuple(cfg_d["vision_layers"])
    cfg = CLIPConfig(**cfg_d)
    return CLIPModel(cfg), params, data


@pytest.mark.parametrize("name", ["vit", "rn"])
def test_golden_image_features(name):
    from aihab_clip_tpu.models import CLIPModel

    model, params, data = _load(name)
    images = jnp.asarray(np.transpose(data["images"], (0, 2, 3, 1)))
    out = model.apply({"params": params}, images,
                      method=CLIPModel.encode_image)
    np.testing.assert_allclose(np.asarray(out), data["image_features"],
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("name", ["vit", "rn"])
def test_golden_text_features(name):
    from aihab_clip_tpu.models import CLIPModel

    model, params, data = _load(name)
    pre, post = model.apply({"params": params}, jnp.asarray(data["tokens"]),
                            method=CLIPModel.encode_text)
    np.testing.assert_allclose(np.asarray(pre), data["text_pre"],
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post), data["text_post"],
                               atol=5e-5, rtol=1e-4)
