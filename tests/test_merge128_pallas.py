"""Correctness tests for the 128-bit dedup-merge kernel
(ops/merge128_pallas) against a numpy oracle; interpreter mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sh_assembly_tpu.ops import merge128_pallas as m128

ON_TPU = jax.default_backend() in ("tpu", "axon")
L, A = 1024, 256
FULL = np.uint32(0xFFFFFFFF)


def _maybe_interpret():
    if ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def _mk_stream(rng, kmers128, seeds, tag, pad_to):
    """kmers128: (n, 4) u32 key planes (low 2 bits of col 3 zero);
    seeds: bool per entry.  Returns sorted, padded 4-plane tuple."""
    p = kmers128.copy()
    p[:, 3] |= np.where(seeds, 0, 2).astype(np.uint32)  # nflag (bit 1)
    p[:, 3] |= np.uint32(tag)  # source tag (bit 0)
    order = np.lexsort((p[:, 3], p[:, 2], p[:, 1], p[:, 0]))
    p = p[order]
    out = np.full((pad_to, 4), FULL, np.uint32)
    out[: len(p)] = p
    return tuple(jnp.asarray(out[:, i].copy()) for i in range(4))


def _oracle(a_km, a_seed, b_km, b_seed):
    """Dedup-merge by 128-bit kmer, seed OR -> sorted (kmers, seeds)."""
    d = {}
    for km, sd in list(zip(map(tuple, a_km), a_seed)) + \
            list(zip(map(tuple, b_km), b_seed)):
        d[km] = d.get(km, False) | bool(sd)
    items = sorted(d.items())
    kms = np.array([k for k, _ in items], np.uint32).reshape(-1, 4)
    sds = np.array([v for _, v in items], bool)
    return kms, sds


def _rand_kmers(rng, n, k=31):
    """n distinct left-aligned packed kmers as (n, 4) u32 planes."""
    bits = 2 * k
    vals = rng.integers(0, 1 << min(bits, 63), size=n, dtype=np.uint64)
    vals = np.unique(vals)
    hi = vals << np.uint64(64 - min(bits, 63))  # left align within 64
    p = np.zeros((len(vals), 4), np.uint32)
    p[:, 0] = (hi >> np.uint64(32)).astype(np.uint32)
    p[:, 1] = (hi & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return p


@pytest.mark.parametrize("na,nb,overlap", [
    (500, 700, 0.3),
    (1500, 100, 0.9),
    (0, 800, 0.0),
    (800, 0, 0.0),
])
def test_merge128_matches_oracle(rng, na, nb, overlap):
    pool = _rand_kmers(rng, (na + nb) * 2 + 64)
    a_km = pool[:na]
    n_ov = int(nb * overlap)
    b_idx = np.concatenate([
        rng.choice(max(na, 1), size=min(n_ov, na), replace=False)
        if na else np.zeros(0, int),
        np.arange(na, na + nb - min(n_ov, na))])
    b_km = pool[b_idx] if nb else pool[:0]
    a_seed = rng.random(len(a_km)) < 0.4
    b_seed = rng.random(len(b_km)) < 0.4

    pad = max(m128._pad_len(max(len(a_km), len(b_km)), L, A), L)
    ap = _mk_stream(rng, a_km, a_seed, 0, pad)
    bp = _mk_stream(rng, b_km, b_seed, 1, pad)
    with _maybe_interpret():
        out, n_live = m128.merge128_planes(ap, bp, window=L, align=A)
    n = int(n_live)
    got = np.stack([np.asarray(out[i][:n]) for i in range(4)], axis=1)
    got_seed = (got[:, 3] & 2) == 0
    got_tag = (got[:, 3] & 1) != 0
    got_km = got.copy()
    got_km[:, 3] &= ~np.uint32(3)

    want_km, want_seed = _oracle(a_km, a_seed, b_km, b_seed)
    assert n == len(want_km)
    np.testing.assert_array_equal(got_km, want_km)
    np.testing.assert_array_equal(got_seed, want_seed)
    assert not got_tag.any(), "source tag must be cleared on output"


def test_merge128_long_runs(rng):
    # adversarial: many duplicates of few kmers straddling block windows
    base = _rand_kmers(rng, 8)
    a_km = np.repeat(base, 300, axis=0)[:2000]
    b_km = np.repeat(base[::-1], 250, axis=0)[:1500]
    a_seed = rng.random(len(a_km)) < 0.1
    b_seed = rng.random(len(b_km)) < 0.1
    pad = max(m128._pad_len(2000, L, A), L)
    ap = _mk_stream(rng, a_km, a_seed, 0, pad)
    bp = _mk_stream(rng, b_km, b_seed, 1, pad)
    with _maybe_interpret():
        out, n_live = m128.merge128_planes(ap, bp, window=L, align=A)
    n = int(n_live)
    got = np.stack([np.asarray(out[i][:n]) for i in range(4)], axis=1)
    got_seed = (got[:, 3] & 2) == 0
    got[:, 3] &= ~np.uint32(3)
    want_km, want_seed = _oracle(a_km, a_seed, b_km, b_seed)
    assert n == len(want_km)
    np.testing.assert_array_equal(got, want_km)
    np.testing.assert_array_equal(got_seed, want_seed)
