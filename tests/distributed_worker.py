"""Two-process ``jax.distributed`` localhost worker.

Driven by ``tests/test_multiprocess_distributed.py``: each process owns 4
virtual CPU devices (8 global), exercises the real multi-process code
paths that single-process tests can only simulate —

  1. ``jax.distributed.initialize`` over a localhost coordinator,
  2. per-process shard indices -> sharded feature-cache write,
  3. cross-process barrier -> merged cache read on every process,
  4. one data-parallel PEFT train step on the GLOBAL mesh, with the batch
     assembled from process-local halves via
     ``jax.make_array_from_process_local_data``.

Results are written to ``<workdir>/result<pid>.json`` for the parent test
to compare with its own single-process run.  Plan source: SURVEY.md §2.3
"multi-host DCN via jax.distributed.initialize" (absent in the reference,
which is strictly single-device — SURVEY.md §2.3).
"""

import json
import os
import sys


def main() -> None:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from aihab_clip_tpu.parallel.distributed import (
        initialize_distributed,
        global_mesh,
        make_global_batch,
        process_shard_indices,
    )

    initialize_distributed(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from aihab_clip_tpu.cache.feature_cache import (
        read_preprojection_cache,
        write_preprojection_cache,
    )

    # --- sharded cache write: rows are a deterministic fn of global index
    N, D = 24, 16
    idx = process_shard_indices(N, seed=3)
    feats = (np.arange(D)[None, :] + idx[:, None]).astype(np.float16)
    labels = (idx % 5).astype(np.int32)
    cache_dir = os.path.join(workdir, "cache")
    write_preprojection_cache(cache_dir, lambda v: (feats, labels),
                              aug_views=1, shard_index=proc_id,
                              shard_count=nproc)

    # barrier: every shard must be on disk before any process merges
    multihost_utils.sync_global_devices("cache_written")
    views, merged_labels = read_preprojection_cache(cache_dir, 1)
    merged_sum = float(np.asarray(views[0], np.float64).sum())

    # --- one DP train step on the global mesh; each process feeds its half
    from aihab_clip_tpu.models import CLIPConfig, load
    from aihab_clip_tpu.parallel import shard_params
    from aihab_clip_tpu.train.peft import (
        PEFTConfig,
        build_lock_mask,
        make_train_step,
        partition_params,
    )

    tiny = CLIPConfig(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=128, transformer_heads=2, transformer_layers=2)
    bundle = load("random:dryrun-mp", random_cfg=tiny, seed=0)

    mesh = global_mesh()
    batch = 16
    rng = np.random.default_rng(0)
    # identical global batch on every process; each contributes its slice
    g_images = rng.integers(0, 256, size=(batch, 48, 48, 3), dtype=np.uint8)
    g_labels = rng.integers(0, 20, size=batch).astype(np.int32)
    g_valid = np.ones(batch, bool)
    lo, hi = proc_id * batch // nproc, (proc_id + 1) * batch // nproc

    with jax.set_mesh(mesh):
        params = shard_params(mesh, bundle.params)
        mask = build_lock_mask(params, tiny.vision_layers,
                               tiny.transformer_layers, unlocked_groups=2)
        trainable, frozen = partition_params(params, mask)
        text_w = np.eye(tiny.embed_dim, 20, dtype=np.float32)
        cfg = PEFTConfig(resolution=32, num_classes=20, lr=1e-3, epochs=1,
                         crop_mode="random", flip=True)
        opt, step = make_train_step(bundle.model, cfg,
                                    jnp.asarray(text_w), None)
        images, labels_b, valid = make_global_batch(
            mesh, g_images[lo:hi], g_labels[lo:hi], g_valid[lo:hi])
        trainable, _, metrics = step(trainable, frozen, opt.init(trainable),
                                     images, labels_b, valid,
                                     jax.random.key(0), 1e-3)
        loss = float(metrics["loss"])

    out = {
        "process_id": proc_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "shard_rows": int(len(idx)),
        "merged_rows": int(merged_labels.shape[0]),
        "merged_sum": merged_sum,
        "loss": loss,
    }
    with open(os.path.join(workdir, f"result{proc_id}.json"), "w") as f:
        json.dump(out, f)
    multihost_utils.sync_global_devices("done")
    print(f"[worker {proc_id}] ok: {out}")


if __name__ == "__main__":
    main()
