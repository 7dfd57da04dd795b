"""Pipeline parallelism (GPipe schedule) for ViT towers.

The reference is single-device (`/root/reference/` has no distributed
code; SURVEY.md §2.3) and DP x TP covers CLIP-ViT-class towers
(``parallel/mesh.py``).  Pipeline parallelism targets towers whose
weights outgrow one chip (ViT-g/14, ViT-bigG class, ``models/clip.py``
presets): the transformer blocks are split into ``n_stages`` contiguous
groups, each stage's parameters live on one device of a 1-D ``stage``
mesh axis, and microbatches stream through the stages with one
``lax.ppermute`` hop per schedule tick inside a ``lax.scan``.

Design notes (TPU-first):

  * the whole schedule is ONE jitted ``shard_map`` program — no host
    round-trips between ticks; XLA overlaps each stage's compute with
    the neighbor ``ppermute`` (ICI) of the previous activation;
  * every hop moves one [mb, S, W] activation between ICI neighbors —
    the classic GPipe bubble of (P-1)/(T) idle ticks applies, amortized
    by the microbatch count;
  * the patch embedding and the final LN/projection are computed
    replicated on every device (they are <1% of tower FLOPs — cheaper
    than special-casing first/last stages);
  * everything is differentiable: ``ppermute``/``psum``/``scan`` carry
    well-defined transposes, so ``jax.grad`` through
    ``pipeline_encode`` yields pipeline-parallel backward for free
    (grad-parity-tested vs the single-device tower).

Scope: CLIP-ViT towers (fused in_proj QKV layout).  SigLIP towers stay
on DP/TP — their serving path is single-chip-fast already.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, device_grid

STAGE_AXIS = "stage"


def make_pipeline_mesh(n_stages: int,
                       devices: Optional[Sequence] = None,
                       data_parallel: int = 1) -> Mesh:
    """(stage,) mesh — or a composed (data, stage) mesh when
    ``data_parallel > 1``: each data-parallel replica owns its own
    ``n_stages``-device pipeline, batch sharded over ``data``; the
    stage-neighbor ``ppermute`` hops stay within one replica's ICI ring
    (the stage axis is minor, so neighbors are physically adjacent)."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_stages * data_parallel
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if data_parallel == 1:
        return Mesh(device_grid(devices[:n_stages], (n_stages,)),
                    (STAGE_AXIS,))
    grid = device_grid(devices[:need], (data_parallel, n_stages))
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def stack_stage_params(params, n_layers: int, n_stages: int):
    """visual transformer block params -> one pytree whose leaves have a
    leading [n_stages, layers_per_stage] axis pair (shard axis 0 over the
    stage mesh).  Requires ``n_layers % n_stages == 0``."""
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} stages")
    per = n_layers // n_stages
    blocks = params["visual"]["transformer"]
    stages = []
    for s in range(n_stages):
        group = [blocks[f"resblocks_{s * per + i}"] for i in range(per)]
        stages.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *group))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *stages)


def place_stage_params(mesh: Mesh, stacked):
    """Shard the stacked stage params along the stage axis (leaf axis 0)."""
    s = NamedSharding(mesh, P(STAGE_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), stacked)


def _ln_f32(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _block(x, blk, heads: int):
    """Canonical CLIP-ViT transformer block (fp32 LN, QuickGELU MLP) —
    reference semantics `/root/reference/clip/model.py:165-186`."""
    from ..ops.attention import _xla_attention

    dtype = x.dtype
    ln1 = _ln_f32(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    qkv = ln1 @ jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype)
    qkv = qkv + jnp.asarray(blk["attn"]["in_proj"]["bias"], dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = _xla_attention(q, k, v, heads)
    out = attn @ jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype)
    x = x + out + jnp.asarray(blk["attn"]["out_proj"]["bias"], dtype)

    ln2 = _ln_f32(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = ln2 @ jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype)
    h = h + jnp.asarray(blk["mlp"]["c_fc"]["bias"], dtype)
    h = (h.astype(jnp.float32) * jax.nn.sigmoid(
        1.702 * h.astype(jnp.float32))).astype(dtype)
    out = h @ jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype)
    return x + out + jnp.asarray(blk["mlp"]["c_proj"]["bias"], dtype)


def _stage_forward(stage_blocks, x, heads: int):
    """Run this stage's stacked blocks ([Lp, ...] leaves) over x."""
    def body(carry, blk):
        return _block(carry, blk, heads), None

    out, _ = jax.lax.scan(body, x, stage_blocks)
    return out


def pipeline_blocks(stacked_params, x, heads: int, mesh: Mesh,
                    num_microbatches: int):
    """[B, S, W] -> [B, S, W] through the pipelined transformer blocks.

    GPipe schedule: T = M + P - 1 ticks; at tick t, stage p computes
    microbatch t - p (when in range).  Stage 0 ingests microbatch t from
    the input; the last stage's results are gathered with a masked
    ``psum`` so every device returns the full output batch.  On a
    composed (data, stage) mesh each data replica pipelines its own
    batch shard (microbatches sharded over ``data``; the schedule and
    ``ppermute`` hops are per-replica)."""
    from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[STAGE_AXIS]
    dp = mesh.shape.get(DATA_AXIS, 1)
    b = x.shape[0]
    m = num_microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    if (b // m) % dp != 0:
        raise ValueError(f"microbatch {b // m} not divisible by "
                         f"data_parallel {dp}")
    xs = x.reshape(m, b // m, *x.shape[1:])              # [M, mb, S, W]
    data_spec = P(None, DATA_AXIS) if dp > 1 else P()
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(stage_blocks, xs):
        stage_blocks = jax.tree_util.tree_map(lambda t: t[0], stage_blocks)
        idx = jax.lax.axis_index(STAGE_AXIS)
        buf = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def tick(carry, t):
            buf, outs = carry
            inject = jnp.clip(t, 0, m - 1)
            x_in = jnp.where(idx == 0,
                             jax.lax.dynamic_index_in_dim(
                                 xs, inject, 0, keepdims=False),
                             buf)
            y = _stage_forward(stage_blocks, x_in, heads)
            # the last stage finished microbatch t - (P-1) this tick
            done = t - (n_stages - 1)
            slot = jnp.clip(done, 0, m - 1)
            write = (idx == n_stages - 1) & (done >= 0) & (done < m)
            prev = jax.lax.dynamic_index_in_dim(outs, slot, 0,
                                                keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, prev), slot, 0)
            buf = jax.lax.ppermute(y, STAGE_AXIS, perm)
            return (buf, outs), None

        (buf, outs), _ = jax.lax.scan(tick, (buf, outs),
                                      jnp.arange(m + n_stages - 1))
        # replicate the last stage's outputs to every device
        mask = (idx == n_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, STAGE_AXIS)

    # P(STAGE_AXIS) leaves the data axis unmentioned -> params are read
    # replicated across data replicas (shard_map semantics).
    out = shard_map(per_device, mesh=mesh,
                    in_specs=(P(STAGE_AXIS), data_spec),
                    out_specs=data_spec, check_rep=False)(stacked_params, xs)
    return out.reshape(b, *x.shape[1:])


def pipeline_encode(params, stacked_params, images, config, mesh, *,
                    num_microbatches: int, project: bool = False,
                    dtype=jnp.bfloat16):
    """Full ViT encode with the transformer blocks pipeline-parallel.

    ``params`` is the canonical CLIPModel param tree (embedding/head
    leaves are read replicated); ``stacked_params`` from
    ``stack_stage_params`` + ``place_stage_params``.  Differentiable —
    ``jax.grad`` through this function yields pipeline-parallel
    backward."""
    from ..models.fast_vit import _vit_embed

    vp = params["visual"]
    x = _vit_embed(vp, images, config, dtype)
    x = pipeline_blocks(stacked_params, x, config.vision_heads, mesh,
                        num_microbatches)
    cls_tok = x[:, 0, :]
    pre = _ln_f32(cls_tok, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(vp["proj"], pre.dtype)
    return pre, projected
