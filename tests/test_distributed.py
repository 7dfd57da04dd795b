import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from aihab_clip_tpu.parallel import make_mesh
from aihab_clip_tpu.parallel.distributed import (
    global_mesh,
    initialize_distributed,
    make_global_batch,
    process_shard_indices,
)


def test_initialize_noop_single_process():
    initialize_distributed(num_processes=1)  # must not raise


def test_global_mesh_spans_devices():
    mesh = global_mesh()
    assert mesh.devices.size == 8


def test_process_shard_indices_partition():
    n = 103
    shards = [process_shard_indices(n, seed=1, process_index=i,
                                    process_count=4) for i in range(4)]
    allidx = np.concatenate(shards)
    assert len(allidx) == n
    assert len(set(allidx.tolist())) == n
    # deterministic
    again = process_shard_indices(n, seed=1, process_index=2, process_count=4)
    np.testing.assert_array_equal(shards[2], again)
    # different seed -> different shard content
    other = process_shard_indices(n, seed=2, process_index=2, process_count=4)
    assert not np.array_equal(shards[2], other)


def test_process_shard_indices_even():
    """even=True: equal per-process counts (lockstep-safe) covering every
    sample, short shards padded by wrapping (no within-process dupes)."""
    n = 103
    shards = [process_shard_indices(n, seed=1, process_index=i,
                                    process_count=4, even=True)
              for i in range(4)]
    per = -(-n // 4)
    assert all(len(s) == per for s in shards)
    assert set(np.concatenate(shards).tolist()) == set(range(n))
    for s in shards:
        assert len(set(s.tolist())) == len(s)
    # n divisible: even matches the uneven partition exactly
    flat = [process_shard_indices(100, seed=1, process_index=i,
                                  process_count=4) for i in range(4)]
    even = [process_shard_indices(100, seed=1, process_index=i,
                                  process_count=4, even=True)
            for i in range(4)]
    for a, b in zip(flat, even):
        np.testing.assert_array_equal(a, b)


def test_make_global_batch_single_process():
    mesh = make_mesh()
    imgs = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    labels = np.arange(16, dtype=np.int32)
    g_imgs, g_labels = make_global_batch(mesh, imgs, labels)
    assert g_imgs.shape == (16, 4)
    assert g_imgs.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(g_imgs), imgs)
    np.testing.assert_array_equal(np.asarray(g_labels), labels)
