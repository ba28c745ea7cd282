"""Sharded counting on a virtual 8-device mesh == single-device counting."""

import numpy as np
import pytest

import jax

from sh_assembly_tpu.parallel import sharded
from sh_assembly_tpu.ops import spectrum as sp
from sh_assembly_tpu.models import counter
from sh_assembly_tpu import config as cfg

from oracle import oracle_count, random_reads


K = 21
QB = 12  # key_bits = 20


def _batchify(reads, B, L):
    from sh_assembly_tpu.io import fastq

    batcher = fastq.Batcher(K, B, L)
    out = []
    for r in reads:
        out.extend(batcher.add_read(r))
    out.extend(batcher.flush())
    return out


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_matches_oracle(rng, n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    reads = random_reads(rng, 64, 90)
    batches = _batchify(reads, 16, 96)

    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(n_shards), k=K, key_bits=QB + 8,
        local_capacity=8192, local_buf_capacity=8192)
    spec = sc.init()
    step = sc.step_fn()
    merge = sc.merge_fn()
    for b in batches:
        codes, lengths = sc.shard_batch(b.codes, b.lengths)
        spec = step(spec, codes, lengths)
        spec = merge(spec)

    keys, counts = sc.gather_spectrum(spec)
    got = dict(zip(keys.tolist(), counts.tolist()))
    expect = oracle_count(reads, K, QB + 8)
    assert got == expect

    # global key order must equal the single-store sorted order
    assert (np.diff(keys.astype(np.int64)) > 0).all()

    nd, ne = sc.stats_fn()(spec)
    assert nd == len(expect)
    assert ne == sum(expect.values())


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_scan_all_to_all(rng, n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    import jax.numpy as jnp

    reads = random_reads(rng, 64, 90)
    batches = _batchify(reads, 16, 96)
    # stack into supers of S=2 batches, padding the tail
    S = 2
    B, L = 16, 96
    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(n_shards), k=K, key_bits=QB + 8,
        local_capacity=8192, local_buf_capacity=1 << 14)
    spec = sc.init()
    fn = sc.append_scan_fn(S)

    i = 0
    total_dropped = 0
    while i < len(batches):
        chunk = batches[i : i + S]
        codes = np.full((S, B, L), 5, np.uint8)
        lengths = np.zeros((S, B), np.int32)
        for s, b in enumerate(chunk):
            codes[s] = b.codes
            lengths[s] = b.lengths
        dcodes = jax.device_put(
            jnp.asarray(codes),
            jax.sharding.NamedSharding(
                sc.mesh, jax.sharding.PartitionSpec(None, "shard")),
        )
        dlengths = jax.device_put(
            jnp.asarray(lengths),
            jax.sharding.NamedSharding(
                sc.mesh, jax.sharding.PartitionSpec(None, "shard")),
        )
        spec, dropped = fn(spec, dcodes, dlengths)
        total_dropped += int(np.asarray(dropped).sum())
        i += S
    assert total_dropped == 0
    spec = sc.merge_fn()(spec)
    keys, counts = sc.gather_spectrum(spec)
    expect = oracle_count(reads, K, QB + 8)
    assert dict(zip(keys.tolist(), counts.tolist())) == expect


def test_sharded_sweep(rng):
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    reads = random_reads(rng, 48, 80)
    batches = _batchify(reads, 16, 96)
    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(4), k=K, key_bits=QB + 8,
        local_capacity=8192, local_buf_capacity=8192)
    spec = sc.init()
    step = sc.step_fn()
    for b in batches:
        codes, lengths = sc.shard_batch(b.codes, b.lengths)
        spec = step(spec, codes, lengths)
    spec = sc.merge_fn(drop_singletons=True)(spec)
    keys, counts = sc.gather_spectrum(spec)
    expect = {k: v for k, v in oracle_count(reads, K, QB + 8).items() if v >= 2}
    assert dict(zip(keys.tolist(), counts.tolist())) == expect


def test_make_counter_buffer_holds_full_scan():
    """Regression: one fused scan appends super_batch routed blocks with
    no in-scan merge; make_counter must size the shard log buffer to hold
    a full stack (it sized for 2 blocks while count_sharded dispatched 4,
    so insert_planes clamped its offset and silently overwrote keys)."""
    from sh_assembly_tpu import config as cfg
    from sh_assembly_tpu.parallel import driver

    sizing = cfg.CounterSizing(
        k=31, qb=20, hb=28, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
        end_deNoise=False, fr=0.0)
    bc = cfg.BatchConfig()  # CLI defaults: 8192 reads x 160 bp
    for n_mesh in (2, 4, 8):
        if len(jax.devices()) < n_mesh:
            continue
        for S in (2, 4, 8):
            sc = driver.make_counter(sizing, n_mesh, bc, super_batch=S)
            per_step = sc.routed_per_step(
                bc.reads_per_batch // sc.n_shards, bc.max_read_len)
            assert S * per_step <= sc.local_buf_capacity, (
                f"mesh={n_mesh} S={S}: scan appends {S * per_step} > "
                f"buffer {sc.local_buf_capacity}")
