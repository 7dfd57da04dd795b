#!/usr/bin/env python
"""Example: ProLIP from cached features, step by step.

Runnable counterpart of the reference's `notebooks/load_cached_features.ipynb`
— loads a pre-projection feature cache, trains the projector, and evaluates
on the test split, showing each stage explicitly.

Run after generating the synthetic dataset + cache:
    python -c "from aihab_clip_tpu.data import make_synthetic_cs_dataset; \
               make_synthetic_cs_dataset('./data', name='synth_cs')"
    python main.py --dataset_config configs/synthetic_smoke.yaml \
        --opts clip_backend openai backbone random:Tiny search_lr False \
               save_features True train_epoch 1
    python examples/prolip_cached_features.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from aihab_clip_tpu.utils import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax.numpy as jnp
import numpy as np

from aihab_clip_tpu.cache import (
    feature_cache_dir,
    feature_cache_exists,
    read_preprojection_cache,
)
from aihab_clip_tpu.config import load_configs
from aihab_clip_tpu.data import build_loaders
from aihab_clip_tpu.runner import init_clip_and_text_head
from aihab_clip_tpu.train.prolip import (
    ProjectorSpec,
    projector_accuracy,
    train_projector,
)


def main():
    cfg = load_configs("configs/base.yaml", "configs/synthetic_smoke.yaml")
    cfg.clip_backend = "openai"
    cfg.backbone = "random:Tiny"
    cfg.aug_views = 3

    # 1) model + text head
    bundle = init_clip_and_text_head(cfg)
    print(f"model: {bundle['backbone_name']} ({bundle['source']}), "
          f"text head {tuple(bundle['text_weights'].shape)}")

    # 2) cached features
    cache_dir = feature_cache_dir(cfg)
    if not feature_cache_exists(cache_dir, cfg.aug_views):
        raise SystemExit(f"cache missing at {cache_dir}; see module docstring")
    views, labels = read_preprojection_cache(cache_dir, cfg.aug_views,
                                             max_label=20)
    print(f"cache: {len(views)} views of {views[0].shape} + labels "
          f"{labels.shape} from {cache_dir}")

    # 3) projector init from the model's own visual projection
    init = ProjectorSpec.from_clip_params(bundle["params"],
                                          bundle["config"].is_vit)
    tw = jnp.asarray(bundle["text_weights"], jnp.float32)
    acc0 = projector_accuracy(init, views[0], labels, tw)
    print(f"pre-training (zero-shot projector) train-view acc: {acc0:.2f}%")

    # 4) train
    proj, stats = train_projector(views, labels, tw, init, lr=1e-3, lam=0.1,
                                  epochs=10)
    acc1 = projector_accuracy(proj, views[0], labels, tw)
    print(f"post-training train-view acc: {acc1:.2f}% "
          f"(final loss {stats['final_loss']:.4f})")

    # 5) test evaluation through the encoder
    loaders = build_loaders(cfg)
    import jax

    from aihab_clip_tpu.ops.preprocess import eval_transform

    model = bundle["model"]

    @jax.jit
    def encode(images_u8):
        x = eval_transform(images_u8, bundle["resolution"])
        return model.apply({"params": bundle["params"]}, x,
                           method=type(model).encode_image)

    feats, labs = [], []
    for batch in loaders.test.batches():
        pre = np.asarray(encode(jnp.asarray(batch.images)))[batch.valid]
        feats.append(pre)
        labs.append(batch.labels[batch.valid])
    acc_test = projector_accuracy(proj, np.concatenate(feats),
                                  np.concatenate(labs), tw)
    print(f"test accuracy: {acc_test:.2f}%")


if __name__ == "__main__":
    main()
