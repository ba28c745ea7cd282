"""Correctness tests for the streaming merge-dedup-compact Pallas kernel
(ops/merge_pallas) against a dict-based oracle and against the XLA merge
path.  On CPU the kernel runs in Pallas interpreter mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sh_assembly_tpu.ops import merge_pallas as mp
from sh_assembly_tpu.ops import spectrum as sp

SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
ON_TPU = jax.default_backend() in ("tpu", "axon")


def _maybe_interpret():
    if ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def oracle(main_keys, main_counts, main_trav, buf_keys, cap, drop):
    d = {}
    for k, c, t in zip(main_keys, main_counts, main_trav):
        if k == SENT:
            continue
        cc, tt = d.get(k, (0, 0))
        d[k] = (min(cc + int(c), cap), tt | int(t))
    for k in buf_keys:
        if k == SENT:
            continue
        cc, tt = d.get(k, (0, 0))
        d[k] = (min(cc + 1, cap), tt)
    items = sorted(d.items())
    if drop:
        items = [(k, v) for k, v in items if v[0] >= 2]
    return items


def _build(seed, key_bits, C_real, BC_real, hot, L, A):
    rng = np.random.default_rng(seed)
    nk = rng.integers(1, max(2, C_real), endpoint=True) if C_real else 0
    mk = np.unique(
        rng.integers(0, 1 << key_bits, size=max(nk, 1), dtype=np.uint64)
    )[:C_real] if C_real else np.empty(0, np.uint64)
    mc = rng.integers(1, 100, size=len(mk)).astype(np.int32)
    mt = rng.integers(0, 2, size=len(mk)).astype(np.uint8)

    n_buf = int(rng.integers(0, BC_real, endpoint=True)) if BC_real else 0
    pool = np.concatenate(
        [mk, rng.integers(0, 1 << key_bits, size=max(8, n_buf),
                          dtype=np.uint64)])
    bk = rng.choice(pool, size=n_buf) if n_buf else np.empty(0, np.uint64)
    if hot and n_buf > 10:
        bk[: n_buf // 2] = pool[0]
    bk_holes = np.full(max(BC_real, 1), SENT, np.uint64)
    if n_buf:
        pos = rng.choice(BC_real, size=n_buf, replace=False)
        bk_holes[pos] = bk

    C_pad = mp._pad_len(len(mk), L, A)
    BC_pad = mp._pad_len(max(BC_real, 1), L, A)
    keys = np.full(C_pad, SENT, np.uint64)
    keys[: len(mk)] = np.sort(mk)
    order = np.argsort(mk)
    counts = np.zeros(C_pad, np.int32)
    counts[: len(mk)] = mc[order]
    trav = np.zeros(C_pad, np.uint8)
    trav[: len(mk)] = mt[order]
    bufk = np.full(BC_pad, SENT, np.uint64)
    bufk[: len(bk_holes)] = bk_holes
    return keys, counts, trav, bufk


CASES = [
    # (seed, key_bits, C_real, BC_real, drop, hot)
    (0, 33, 500, 1500, False, False),
    (1, 33, 500, 1500, True, False),
    (2, 24, 300, 2000, False, False),
    (3, 24, 300, 2000, True, True),
    (4, 40, 900, 3000, False, True),
    (5, 48, 10, 50, False, False),
    (6, 33, 0, 1000, False, False),
    (7, 33, 800, 0, True, False),
    (8, 20, 100, 700, False, False),
]


@pytest.mark.parametrize("seed,key_bits,C_real,BC_real,drop,hot", CASES)
def test_merge_kernel_vs_oracle(seed, key_bits, C_real, BC_real, drop, hot):
    L, A = 1024, 128
    keys, counts, trav, bufk = _build(seed, key_bits, C_real, BC_real, hot,
                                      L, A)
    kshift = 64 - key_bits
    cbits = min(kshift, 32) - 1
    cap = min((1 << cbits) - 2, 1 << 30)

    with _maybe_interpret():
        mh, ml = mp.kernel_pack(jnp.asarray(keys), jnp.asarray(counts),
                                jnp.asarray(trav), key_bits)
        pb = jax.lax.sort(mp.kernel_pack_buf(jnp.asarray(bufk), key_bits))
        bh = (pb >> jnp.uint64(32)).astype(jnp.uint32)
        bl = (pb & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        oh, ol, n_live, n_dropped = mp.merge_planes(
            mh, ml, bh, bl, key_bits, drop, window=L, align=A)
        ok, oc, ot = mp.kernel_unpack(oh, ol, n_live, key_bits)

    n = int(np.asarray(n_live))
    exp = oracle(keys, counts, trav, bufk, cap, drop)
    assert n == len(exp)
    exp_all = oracle(keys, counts, trav, bufk, cap, False)
    assert int(np.asarray(n_dropped)) == (len(exp_all) - len(exp) if drop
                                          else 0)
    ga = np.asarray(ok)[:n]
    gc = np.asarray(oc)[:n]
    gt = np.asarray(ot)[:n]
    for i, (ek, (ec, et)) in enumerate(exp):
        assert ga[i] == ek
        assert gc[i] == min(ec, cap)
        assert gt[i] == et


def test_spectrum_merge_kernel_path_matches_xla():
    """_merge_kernel_path (interpret mode on CPU) == XLA spectrum.merge."""
    rng = np.random.default_rng(7)
    key_bits = 30
    C, BC = 4096, 4096
    spec = sp.make(C, BC)
    batch = rng.integers(0, 1 << key_bits, size=3000, dtype=np.uint64)
    spec = sp.insert(spec, jnp.asarray(batch))

    ref = sp.merge(spec, key_bits)  # XLA path on CPU
    with _maybe_interpret():
        got = sp._merge_kernel_path(spec, key_bits, drop_singletons=False)

    n = int(ref.n_main)
    assert int(got.n_main) == n
    np.testing.assert_array_equal(np.asarray(got.hi)[:n],
                                  np.asarray(ref.hi)[:n])
    np.testing.assert_array_equal(np.asarray(got.lo)[:n],
                                  np.asarray(ref.lo)[:n])
