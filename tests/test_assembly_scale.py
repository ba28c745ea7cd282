"""Scale smoke for the vectorized host assembly: ~1M unitigs from 4M nodes
must finalize in well under a minute of host time (the round-1 per-unitig
Python loop took hours at this size; the reference handles 1e8 nodes in
multithreaded C++ passes, src/contig_assembly.cpp:277-629)."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from sh_assembly_tpu import config as cfg
from sh_assembly_tpu.models import contiger


def synth_chains(rng, N, k, mean_len=4):
    """Random node kmers + a random chain forest over them (mirror-
    symmetric oriented edges, like build_oriented_graph emits)."""
    # distinct random left-aligned k-mers
    bits = 2 * k
    hi = rng.integers(0, 1 << 63, size=N, dtype=np.uint64) << np.uint64(1)
    hi = np.unique(hi)
    while len(hi) < N:
        extra = rng.integers(0, 1 << 63, size=N, dtype=np.uint64) << np.uint64(1)
        hi = np.unique(np.concatenate([hi, extra]))
    hi = hi[:N] & np.uint64(((1 << bits) - 1) << (64 - bits))
    hi = np.unique(hi)
    N = len(hi)
    lo = np.zeros(N, np.uint64)

    perm = rng.permutation(N).astype(np.int64)
    # segment boundaries: ~1/mean_len probability
    brk = rng.random(N - 1) < 1.0 / mean_len
    cur = perm[:-1][~brk]
    nxt = perm[1:][~brk]
    cn = np.full(2 * N, -1, np.int32)
    cn[2 * cur] = 2 * nxt
    cn[2 * nxt + 1] = (2 * cur + 1).astype(np.int32)
    n_paths = int(brk.sum()) + 1
    return hi, lo, cn, N, n_paths


def test_million_unitig_finalize_fast(rng):
    k = 31
    N = 1 << 22  # 4.2M nodes
    hi, lo, cn, N, n_paths = synth_chains(rng, N, k)
    counts = np.full(N, 10, np.int64)
    params = cfg.ContigerParams(k=k, kmer_abundance_min=2)

    t0 = time.time()
    arrays = contiger.finalize_unitigs(
        jnp.asarray(hi), jnp.asarray(lo), np.ones(N, bool),
        jnp.asarray(counts), jnp.asarray(cn), params)
    dt = time.time() - t0

    assert arrays.n == n_paths
    assert int(arrays.offsets[-1]) == N + n_paths * (k - 1)
    assert (arrays.med == 10).all()
    assert np.allclose(arrays.mean, 10.0)
    # host numpy assembly is ~15s of this; the rest is contract_paths'
    # pointer-jump gathers, which are slow on the CPU backend only (fast on
    # TPU).  1e7 unitigs extrapolates to minutes either way — the round-1
    # Python loop took hours at this size.
    assert dt < 150, f"finalize took {dt:.1f}s at {arrays.n} unitigs"
    print(f"finalized {arrays.n} unitigs / {N} nodes in {dt:.1f}s")
