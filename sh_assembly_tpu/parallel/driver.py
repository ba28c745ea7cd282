"""Mesh drivers: run the counting / Contiger stages over a device mesh.

This is the user-reachable entry to the multi-chip machinery
(parallel/sharded.py, parallel/sharded_contiger.py): the CLIs call these
with ``--mesh N`` and everything else (key-range sharding, sorted-quota
all_to_all routing, psum'd deNoise triggers) is internal.  On a single
host this uses the local devices (or the CPU virtual mesh under
``XLA_FLAGS=--xla_force_host_platform_device_count=N``); in a
multi-process job (jax.distributed) the same code runs over the global
mesh with each host feeding its own file partition, coordinated so all
hosts issue the same number of collective steps (the reference's shared
chunk queue has no such problem — one process, cqf/CQF_mt.h:334-412).
"""

from __future__ import annotations

import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config as cfg
from ..io import fastq
from ..models import contiger
from ..ops import spectrum as sp
from ..utils.logging import log
from . import multihost, sharded, sharded_contiger


def _pow2_at_least(x: int, lo: int = 1) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), int(np.log2(lo)))


def make_counter(sizing: cfg.CounterSizing, n_mesh: int | None,
                 batch_cfg: cfg.BatchConfig,
                 super_batch: int = 4) -> sharded.ShardedCounter:
    mesh = (multihost.make_global_mesh() if jax.process_count() > 1
            else sharded.make_mesh(n_mesh))
    n = mesh.devices.size
    local_cap = _pow2_at_least(sizing.nslots // n, 1 << 12)
    # per-step routed block on a shard = local windows x quota slack (2.0,
    # append_scan_fn default).  One fused scan appends super_batch blocks
    # with NO merge inside (append_scan_fn), so the log buffer must hold a
    # full stack plus one more block of headroom — sizing for fewer than
    # super_batch blocks would make insert_planes clamp its write offset
    # and silently overwrite earlier routed keys.
    windows_local = (batch_cfg.reads_per_batch // n) * (
        batch_cfg.max_read_len - sizing.k + 1)
    routed = int(np.ceil(windows_local / max(n, 1) * 2.0)) * n if n > 1 \
        else windows_local
    local_buf = _pow2_at_least(
        max((super_batch + 1) * routed + 1, 1 << 16))
    return sharded.ShardedCounter(
        mesh=mesh, k=sizing.k, key_bits=sizing.qb + 8,
        local_capacity=local_cap, local_buf_capacity=local_buf)


def count_sharded(
    files: list[str],
    sizing: cfg.CounterSizing,
    fmode: str = "auto",
    n_mesh: int | None = None,
    batch_cfg: cfg.BatchConfig | None = None,
    n_threads: int = 4,
    super_batch: int = 4,
):
    """Sharded counting over the mesh -> (global keys, counts, stats dict).

    Streams this process's file partition, stacks S row-sharded batches
    per collective dispatch, and runs the fused sharded scan (hash ->
    sorted-quota all_to_all -> per-shard log append / merge / psum-gated
    deNoise sweep).
    """
    batch_cfg = batch_cfg or cfg.BatchConfig()
    sc = make_counter(sizing, n_mesh, batch_cfg, super_batch=super_batch)
    mesh, n = sc.mesh, sc.n_shards
    log(f"[mesh] counting over {n} devices "
        f"(local capacity 2^{int(np.log2(sc.local_capacity))}, "
        f"local buffer 2^{int(np.log2(sc.local_buf_capacity))})")
    B, L = batch_cfg.reads_per_batch, batch_cfg.max_read_len
    if B % n:
        raise ValueError(f"reads_per_batch {B} not divisible by mesh {n}")

    S = super_batch
    scan = sc.append_scan_fn(S)
    merge_sweep = sc.merge_sweep_fn()
    stats_of = sc.stats_fn()
    spec_v = sc.init()
    rounds_v = jax.device_put(
        np.full(n, sizing.num_deNoise, np.int32),
        NamedSharding(mesh, P("shard")))
    threshold = jnp.asarray(sizing.ndistinct_for_deNoise, jnp.int64)
    row = NamedSharding(mesh, P(None, "shard"))

    from ..io import native

    my_files = multihost.partition_files(files)
    local = native.batches_from_files(
        my_files, sizing.k, fmode, B, L, n_threads=n_threads)

    def empty_batch():
        return fastq.Batch(
            np.full((B, L), 5, np.uint8), np.zeros(B, np.int32), 0)

    stream = multihost.coordinated_stream(local, mesh, empty_batch)

    t0 = time.time()
    stack_c = np.full((S, B, L), 5, np.uint8)
    stack_l = np.zeros((S, B), np.int32)
    fill = 0
    n_batches = 0
    dropped = 0
    # HOST-DRIVEN merge cadence: every step appends a fixed routed block
    # per shard (models/counter.build_spectrum design), so all processes
    # mirror the same deterministic fill and dispatch the same collectives
    routed_step = sc.routed_per_step(B // n, L)
    BCl = sc.local_buf_capacity
    host_nbuf = 0

    if S * routed_step > BCl:
        raise ValueError(
            f"one fused scan appends {S * routed_step} buffer slots but "
            f"the shard log buffer holds {BCl}; raise local_buf_capacity "
            f"or lower super_batch")

    def flush():
        nonlocal spec_v, rounds_v, fill, dropped, host_nbuf
        nonlocal stack_c, stack_l
        # the padded stack always appends S blocks regardless of fill
        if host_nbuf + S * routed_step > BCl:
            spec_v, rounds_v = merge_sweep(spec_v, rounds_v, threshold)
            host_nbuf = 0
        spec_v, dropped_v = scan(
            spec_v,
            jax.device_put(stack_c, row), jax.device_put(stack_l, row))
        host_nbuf += S * routed_step
        dropped += int(np.asarray(dropped_v).sum())
        stack_c = np.full((S, B, L), 5, np.uint8)
        stack_l = np.zeros((S, B), np.int32)
        fill = 0

    for b in stream:
        stack_c[fill] = b.codes
        stack_l[fill] = b.lengths
        fill += 1
        n_batches += 1
        if fill == S:
            flush()
    if fill:
        flush()
    if dropped:
        raise RuntimeError(
            f"sharded scan dropped {dropped} routed keys: raise quota_slack "
            f"or local_buf_capacity")

    # finalize merge + end-of-stream trigger parity (CQF_mt.h:858): the
    # merge program itself checks the psum'd threshold and sweeps
    spec_v, rounds_v = merge_sweep(spec_v, rounds_v, threshold)
    nd, ne = stats_of(spec_v)
    rl = int(np.asarray(rounds_v).reshape(-1)[0])
    sweeps = sizing.num_deNoise - rl
    if sizing.end_deNoise:
        spec_v = sc.merge_fn(drop_singletons=True)(spec_v)
        nd, ne = stats_of(spec_v)
        sweeps += 1
    keys, counts = sc.gather_spectrum(spec_v)
    log(f"[mesh] counted {ne} k-mers, {nd} distinct, {sweeps} sweeps, "
        f"{n_batches} local batches in {time.time() - t0:.1f}s")
    return sc, spec_v, keys, counts, {
        "kmers": ne, "distinct": nd, "sweeps": sweeps}


def contiger_sharded(
    sc: sharded.ShardedCounter,
    spec_v: sp.Spectrum,
    files: list[str],
    params: cfg.ContigerParams,
    fmode: str = "auto",
    batch_cfg: cfg.BatchConfig | None = None,
    n_threads: int = 4,
) -> contiger.ArrayUnitigs:
    """Sharded Contiger over an in-mesh spectrum (counting's mesh)."""
    batch_cfg = batch_cfg or cfg.BatchConfig()
    from ..io import native

    Lp = (batch_cfg.max_read_len + 7) // 8 * 8
    my_files = multihost.partition_files(files)

    def stream():
        local = native.packed_batches_from_files(
            my_files, params.k, fmode, batch_cfg.reads_per_batch, Lp,
            n_threads=n_threads)

        def empty_batch():
            B = batch_cfg.reads_per_batch
            return fastq.PackedBatch(
                np.zeros((B, Lp // 4), np.uint8),
                np.full((B, Lp // 8), 0xFF, np.uint8),
                np.zeros(B, np.int32), 0)

        return multihost.coordinated_stream(local, sc.mesh, empty_batch)

    return sharded_contiger.assemble_unitigs_sharded(
        sc, spec_v, stream(), params)
