"""Multi-host helpers: file partitioning and single-process degradation."""

import numpy as np

import jax

from sh_assembly_tpu.parallel import multihost, sharded


def test_partition_round_robin():
    files = [f"f{i}" for i in range(10)]
    parts = [multihost.partition_files(files, pi, 4) for pi in range(4)]
    # disjoint cover
    flat = [p for part in parts for p in part]
    assert sorted(flat) == sorted(files)
    assert len(set(flat)) == len(files)
    # balanced within 1
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_partition_single_process_is_identity():
    files = ["a", "b", "c"]
    assert multihost.partition_files(files, 0, 1) == files


def test_shard_host_batch_single_process(rng):
    mesh = multihost.make_global_mesh()
    n = mesh.devices.size
    B, L = 2 * n, 16
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    dc, dl = multihost.shard_host_batch(mesh, codes, lengths)
    np.testing.assert_array_equal(np.asarray(dc), codes)
    np.testing.assert_array_equal(np.asarray(dl), lengths)
    # placed with row sharding over the mesh
    assert dc.sharding.spec == jax.sharding.PartitionSpec("shard")


def test_global_mesh_matches_sharded_counter(rng):
    # the global mesh drives the existing collective counter unchanged
    mesh = multihost.make_global_mesh()
    sc = sharded.ShardedCounter(
        mesh=mesh, k=21, key_bits=20, local_capacity=2048,
        local_buf_capacity=4096)
    spec = sc.init()
    step = sc.step_fn()
    codes = rng.integers(0, 4, size=(8 * sc.n_shards, 64)).astype(np.uint8)
    lengths = np.full(codes.shape[0], 64, np.int32)
    dc, dl = multihost.shard_host_batch(mesh, codes, lengths)
    spec = step(spec, dc, dl)
    spec = sc.merge_fn()(spec)
    nd, ne = sc.stats_fn()(spec)
    assert ne > 0 and nd > 0
