"""Four-process 2x2 (data x model) ``jax.distributed`` worker.

Driven by ``tests/test_multiprocess_distributed.py``: each of 4 processes
owns ONE virtual CPU device, and the global mesh is (data=2, model=2) —
so the MODEL axis spans process boundaries: megatron column/row-sharded
weights live on different processes and the train step's tensor-parallel
collectives cross the (simulated) DCN, not just local ICI.  This is the
topology class the reference cannot express at all (SURVEY.md §2.3) and
the single-process mesh tests can only simulate.

Asserts locally that the attention QKV kernel really is sharded over the
model axis (a per-process shard is half the global tensor), then runs one
DP x TP train step on a deterministic global batch; the parent compares
the loss against its own single-process (data=2, model=2) run.
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
        flags + " --xla_force_host_platform_device_count=1").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from aihab_clip_tpu.parallel.distributed import (
        initialize_distributed,
        global_mesh,
        make_global_batch,
    )

    initialize_distributed(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=proc_id)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 1
    assert len(jax.devices()) == nproc

    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from aihab_clip_tpu.models import CLIPConfig, load
    from aihab_clip_tpu.parallel import shard_params
    from aihab_clip_tpu.parallel.mesh import MODEL_AXIS
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

    mesh = global_mesh(model_parallel=2)
    assert mesh.devices.shape == (nproc // 2, 2)

    batch = 16
    rng = np.random.default_rng(0)
    g_images = rng.integers(0, 256, size=(batch, 48, 48, 3), dtype=np.uint8)
    g_labels = rng.integers(0, 20, size=batch).astype(np.int32)
    g_valid = np.ones(batch, bool)
    # the batch shards over the DATA axis only; the two processes of a
    # model pair hold replicas of the SAME data shard, so each process
    # contributes its data-GROUP's slice (not a per-process slice)
    pos = np.argwhere(mesh.devices == jax.local_devices()[0])
    data_group = int(pos[0][0])
    per = batch // mesh.devices.shape[0]
    lo, hi = data_group * per, (data_group + 1) * per

    with jax.set_mesh(mesh):
        params = shard_params(mesh, bundle.params)

        # the megatron rules must actually shard over the model axis, and
        # with 1 device/process the local shard is half the global kernel
        qkv = params["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
        spec = qkv.sharding.spec
        tp_sharded = MODEL_AXIS in tuple(spec)
        local_shape = qkv.addressable_shards[0].data.shape if tp_sharded else None
        assert tp_sharded, f"qkv not model-sharded: {spec}"
        assert local_shape[-1] * 2 == qkv.shape[-1], (local_shape, qkv.shape)

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
        "mesh_shape": list(mesh.devices.shape),
        "tp_sharded": bool(tp_sharded),
        "qkv_local_cols": int(local_shape[-1]),
        "qkv_global_cols": int(qkv.shape[-1]),
        "loss": loss,
    }
    with open(os.path.join(workdir, f"tp_result{proc_id}.json"), "w") as f:
        json.dump(out, f)
    multihost_utils.sync_global_devices("tp_done")
    print(f"[tp_worker {proc_id}] ok: {out}")


if __name__ == "__main__":
    main()
