"""Correctness tests for the streaming merge-join Pallas kernel
(ops/join_pallas) against query_join.  On CPU the kernel runs in Pallas
interpreter mode (same harness as test_merge_pallas)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sh_assembly_tpu.ops import join_pallas as jpl
from sh_assembly_tpu.ops import merge_pallas as mp
from sh_assembly_tpu.ops import spectrum as sp

SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
ON_TPU = jax.default_backend() in ("tpu", "axon")
L, A = 1024, 256  # small kernel geometry for the interpreter


def _maybe_interpret():
    if ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def run_kernel(spec, keys_sorted, key_bits):
    Q = len(keys_sorted)
    C = spec.capacity
    kshift = sp.payload_bits(key_bits)
    cb = sp.cbits(key_bits)
    qmark = np.uint64((1 << (cb + 1)) - 1)
    keys = jnp.asarray(keys_sorted)
    packed = jnp.where(keys == SENT, SENT,
                       (keys << jnp.uint64(kshift)) | qmark)
    qh = (packed >> jnp.uint64(32)).astype(jnp.uint32)
    ql = (packed & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    C_pad = mp._pad_len(C, L, A)
    Q_pad = mp._pad_len(Q, L, A)
    sh = jnp.concatenate([spec.hi, jnp.full((C_pad - C,), sp.SENT32)])
    sl = jnp.concatenate([spec.lo, jnp.full((C_pad - C,), sp.SENT32)])
    qh = jnp.concatenate([qh, jnp.full((Q_pad - Q,), sp.SENT32)])
    ql = jnp.concatenate([ql, jnp.full((Q_pad - Q,), sp.SENT32)])
    with _maybe_interpret():
        out = jpl.count_join_planes(sh, sl, qh, ql, key_bits,
                                    window=L, align=A)
    return np.asarray(out[:Q]).astype(np.int64)


@pytest.mark.parametrize("key_bits,n_spec,n_q", [
    (22, 700, 900),
    (22, 2000, 300),
    (36, 1500, 1500),
])
def test_kernel_matches_query_join(rng, key_bits, n_spec, n_q):
    keys = np.unique(
        rng.integers(0, 1 << key_bits, size=n_spec).astype(np.uint64))
    counts = rng.integers(1, 200, size=len(keys)).astype(np.int64)
    trav = (rng.random(len(keys)) < 0.4).astype(np.uint8)
    C = 1 << int(np.ceil(np.log2(len(keys) + 1)))
    spec = sp.from_host(keys, counts, C, 1 << 10, key_bits, traveled=trav)

    # query mix: half present, half random; plus SENTINEL padding
    q_present = rng.choice(keys, size=n_q // 2)
    q_rand = rng.integers(0, 1 << key_bits, size=n_q - n_q // 2) \
        .astype(np.uint64)
    q = np.sort(np.concatenate([q_present, q_rand]))
    q = np.concatenate([q, np.full(37, SENT)])  # sentinel tail

    got = run_kernel(spec, q, key_bits)
    want = np.asarray(sp.query_join(spec, jnp.asarray(q), key_bits))
    np.testing.assert_array_equal(got[q != SENT], want[q != SENT])
    # sentinel queries answer 0 through the public dispatcher
    via = np.asarray(sp.query_join_sorted(spec, jnp.asarray(q), key_bits)) \
        if ON_TPU else None
    if via is not None:
        np.testing.assert_array_equal(via, want)


def test_empty_spectrum(rng):
    key_bits = 22
    spec = sp.from_host(np.zeros(0, np.uint64), np.zeros(0, np.int64),
                        1 << 10, 1 << 10, key_bits)
    q = np.sort(rng.integers(0, 1 << key_bits, size=500).astype(np.uint64))
    got = run_kernel(spec, q, key_bits)
    assert (got == 0).all()


def test_all_queries_match(rng):
    key_bits = 22
    keys = np.unique(
        rng.integers(0, 1 << key_bits, size=1200).astype(np.uint64))
    counts = rng.integers(1, 50, size=len(keys)).astype(np.int64)
    spec = sp.from_host(keys, counts, 1 << 11, 1 << 10, key_bits)
    # duplicate queries for the same key must each get the count
    q = np.sort(np.concatenate([keys, keys]))
    got = run_kernel(spec, q, key_bits)
    want = np.asarray(sp.query_join(spec, jnp.asarray(q), key_bits))
    np.testing.assert_array_equal(got, want)
