"""Checkpoint save / restore / eval_only wiring through the runner."""

import numpy as np
import pytest
from flax import traverse_util

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import make_synthetic_cs_dataset
from aihab_clip_tpu.runner import run
from aihab_clip_tpu.utils import (
    latest_checkpoint,
    load_checkpoint,
    load_projector,
    save_checkpoint,
    save_projector,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    return make_synthetic_cs_dataset(root, n_train_per_class=4,
                                     n_test_per_class=2, image_size=40)


def _cfg(synth, tmp_path, **over):
    cfg = ConfigNode({
        "root_path": str(tmp_path),
        "dataset": "synth", "seed": 1, "shots": 0, "subset_l3": [],
        "clip_backend": "openclip", "open_clip_model": "random:Tiny",
        "backbone": "random:Tiny",
        "wandb_project": None,
        "use_hierarchical_prompts": False, "use_descriptive_prompts": False,
        "remat": False, "train_epoch": 1, "lr_v": 0.001,
        "lambda_v": 0.1, "lambda_funct_1_N": False, "lambda_funct_1_N2": False,
        "search_lr": False, "feat_batch_size": 0, "save_checkpoints": False,
        "save_features": False, "aug_views": 1,
        "finetune": {
            "enabled": True, "tune_text": False, "unlocked_groups": 1,
            "unlocked_layers": 1, "val_interval": 0, "eval_l2": False,
            "eval_only": False, "checkpoint": None,
            "require_cached_features": True,
            "save_model": True, "save_model_dir": str(tmp_path / "model_ckpt"),
            "save_optimizer": True, "cache_embeddings": False,
        },
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8, "shuffle": True, "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "use_l2_label": False,
            "preprocessing": {"resize": 40, "resolution": 32,
                              "augmentations": {"random_crop": False}},
        },
    })
    for k, v in over.items():
        cfg[k] = v
    return cfg


def test_checkpoint_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    cfg = ConfigNode({"root_path": str(tmp_path), "clip_backend": "openai",
                      "backbone": "ViT-B/16",
                      "finetune": {"save_model_dir": "ck"}})
    params = {"a": {"w": jnp.ones((3, 3))}, "b": jnp.zeros((2,))}
    path = save_checkpoint(cfg, params, opt_state=None, epoch=5)
    assert (path / "meta.json").is_file()
    found = latest_checkpoint(cfg)
    assert found == path
    restored = load_checkpoint(path, params)
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]["w"]),
                                  np.ones((3, 3)))
    assert restored["meta"]["epoch"] == 5


def test_projector_save_load(tmp_path):
    w = np.random.randn(4, 2).astype(np.float32)
    b = np.zeros(2, np.float32)
    save_projector(tmp_path / "p.npz", w, b, meta={"lr": 0.1})
    w2, b2 = load_projector(tmp_path / "p.npz")
    np.testing.assert_array_equal(w, w2)
    np.testing.assert_array_equal(b, b2)


@pytest.mark.slow
def test_peft_save_then_eval_only_restore(synth, tmp_path):
    # train one epoch with save_model
    cfg = _cfg(synth, tmp_path)
    result = run(cfg, inspect_only=False)
    trained_test = result["peft"]["test"]

    ck = latest_checkpoint(cfg)
    assert ck is not None

    # eval_only from the saved checkpoint reproduces test metrics
    cfg2 = _cfg(synth, tmp_path)
    cfg2.finetune.eval_only = True
    cfg2.finetune.checkpoint = "latest"
    cfg2.finetune.save_model = False
    result2 = run(cfg2, inspect_only=False)
    eval_test = result2["peft"]["test"]
    assert eval_test["top1"] == pytest.approx(trained_test["top1"], abs=1e-6)
    assert eval_test["f1"] == pytest.approx(trained_test["f1"], abs=1e-6)

    # restored params differ from a fresh random init (training happened)
    flat_trained = traverse_util.flatten_dict(result["peft"]["params"])
    flat_restored = traverse_util.flatten_dict(result2["peft"]["params"])
    for k in flat_trained:
        np.testing.assert_allclose(np.asarray(flat_trained[k]),
                                   np.asarray(flat_restored[k]), atol=1e-6)


def test_periodic_checkpoint_and_resume_continuity(synth, tmp_path):
    """Interrupted-then-resumed training equals uninterrupted training
    exactly: epoch keys, shuffle order, and the cosine schedule all index
    the absolute epoch, and the optimizer state round-trips."""
    import jax.numpy as jnp

    from aihab_clip_tpu.data import build_loaders
    from aihab_clip_tpu.models import build_text_head, load
    from aihab_clip_tpu.templates import gen_prompts
    from aihab_clip_tpu.train.peft import PEFTConfig, finetune

    cfg = _cfg(synth, tmp_path)
    loaders = build_loaders(cfg)
    bundle = load("random:Tiny")
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts, 20, tpc)

    def fresh():
        import jax

        return jax.tree.map(np.array, bundle.params)

    def pcfg(epochs, interval=0):
        return PEFTConfig(resolution=32, num_classes=20, lr=2e-3,
                          epochs=epochs, crop_mode="random", flip=True,
                          checkpoint_interval=interval)

    # uninterrupted 4 epochs
    out_full = finetune(bundle.model, fresh(), loaders.train, None, None,
                        pcfg(4), text_weights=head["text_weights"],
                        unlocked_groups=2, seed=0, verbose=False,
                        track_test=False)

    # 4 epochs with a mid-run save at epoch 2 (simulated interruption)
    saved = {}

    def ckpt_fn(par, opt_state, epoch):
        saved["path"] = save_checkpoint(cfg, par, opt_state, epoch=epoch)

    finetune(bundle.model, fresh(), loaders.train, None, None,
             pcfg(4, interval=2), text_weights=head["text_weights"],
             unlocked_groups=2, seed=0, verbose=False, track_test=False,
             checkpoint_fn=ckpt_fn)
    assert "path" in saved
    meta = saved["path"] / "meta.json"
    assert meta.is_file()

    # resume from epoch 2 and finish
    out_resumed = finetune(bundle.model, fresh(), loaders.train, None, None,
                           pcfg(4), text_weights=head["text_weights"],
                           unlocked_groups=2, seed=0, verbose=False,
                           track_test=False, resume_from=saved["path"])

    flat_a = traverse_util.flatten_dict(out_full["params"])
    flat_b = traverse_util.flatten_dict(out_resumed["params"])
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]),
                                      err_msg="/".join(k))


def test_sigterm_graceful_interrupt_and_resume(synth, tmp_path):
    """SIGTERM mid-training finishes the current epoch, checkpoints, and
    returns; resuming completes training bit-identically to an
    uninterrupted run (elastic preemption recovery)."""
    import signal

    from aihab_clip_tpu.data import build_loaders
    from aihab_clip_tpu.models import build_text_head, load
    from aihab_clip_tpu.templates import gen_prompts
    from aihab_clip_tpu.train.peft import PEFTConfig, finetune

    cfg = _cfg(synth, tmp_path)
    loaders = build_loaders(cfg)
    bundle = load("random:Tiny")
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts, 20, tpc)

    def fresh():
        import jax

        return jax.tree.map(np.array, bundle.params)

    def pcfg(epochs):
        return PEFTConfig(resolution=32, num_classes=20, lr=2e-3,
                          epochs=epochs, crop_mode="random", flip=True,
                          checkpoint_interval=0)

    out_full = finetune(bundle.model, fresh(), loaders.train, None, None,
                        pcfg(4), text_weights=head["text_weights"],
                        unlocked_groups=2, seed=0, verbose=False,
                        track_test=False)

    class TermAtEpoch:
        """Raises SIGTERM from the per-epoch log hook (main thread), so
        the handler runs deterministically during epoch 2's bookkeeping."""

        def log(self, d):
            if d.get("epoch") == 2:
                signal.raise_signal(signal.SIGTERM)

    saved = {}

    def ckpt_fn(par, opt_state, epoch):
        saved["path"] = save_checkpoint(cfg, par, opt_state, epoch=epoch)
        saved["epoch"] = epoch

    out_int = finetune(bundle.model, fresh(), loaders.train, None, None,
                       pcfg(4), text_weights=head["text_weights"],
                       unlocked_groups=2, seed=0, verbose=False,
                       track_test=False, checkpoint_fn=ckpt_fn,
                       logger=TermAtEpoch())
    assert out_int["interrupted_at_epoch"] == 2
    assert saved["epoch"] == 2

    out_resumed = finetune(bundle.model, fresh(), loaders.train, None, None,
                           pcfg(4), text_weights=head["text_weights"],
                           unlocked_groups=2, seed=0, verbose=False,
                           track_test=False, resume_from=saved["path"])
    assert out_resumed["interrupted_at_epoch"] is None

    flat_a = traverse_util.flatten_dict(out_full["params"])
    flat_b = traverse_util.flatten_dict(out_resumed["params"])
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]),
                                      err_msg="/".join(k))


def test_async_checkpoint_roundtrip(synth, tmp_path):
    """async_save returns before the disk write; after
    wait_for_async_saves the checkpoint loads and matches the saved
    values (including mutation of the live arrays after save() returns —
    the device->host copy must happen in the foreground)."""
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.utils import wait_for_async_saves

    cfg = _cfg(synth, tmp_path)
    bundle = load("random:Tiny")
    params = {k: np.array(v) for k, v in
              traverse_util.flatten_dict(bundle.params).items()}
    snapshot = {k: v.copy() for k, v in params.items()}
    tree = traverse_util.unflatten_dict(params)

    path = save_checkpoint(cfg, tree, None, epoch=3, async_save=True)
    # mutate the host buffers after save() returned: the copy the writer
    # persists must be the values at save time
    for v in params.values():
        v += 1000.0
    wait_for_async_saves()

    restored = load_checkpoint(path, bundle.params, None)
    flat = traverse_util.flatten_dict(restored["params"])
    assert restored["meta"]["epoch"] == 3
    for k, v in snapshot.items():
        np.testing.assert_array_equal(np.asarray(flat[k]), v,
                                      err_msg="/".join(k))


def test_runner_resume_flag(synth, tmp_path):
    """finetune.resume=true through the runner: first run saves periodic
    checkpoints, a second run picks up the latest and completes."""
    cfg = _cfg(synth, tmp_path, train_epoch=3)
    cfg.finetune["checkpoint_interval"] = 1
    run(cfg, inspect_only=False)
    found = latest_checkpoint(cfg)
    assert found is not None

    cfg2 = _cfg(synth, tmp_path, train_epoch=3)
    cfg2.finetune["resume"] = True
    cfg2.finetune["save_model"] = False
    result = run(cfg2, inspect_only=False)
    t = result["peft"]["test"]
    assert t is not None and 0.0 <= t["top1"] <= 1.0
