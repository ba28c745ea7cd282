"""Packed k-mer device ops vs host reference (utils.dna)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sh_assembly_tpu.ops import kmerpack as kp
from sh_assembly_tpu.utils import dna


def host_pack(codes):
    return dna.pack_kmer(codes)


@pytest.mark.parametrize("k", [4, 21, 31, 32, 33, 47, 63])
def test_pack_windows(rng, k):
    B, L = 4, 80
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    hi, lo = kp.pack_windows(jnp.asarray(codes), k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for b in range(0, B, 2):
        for i in range(0, L - k + 1, 7):
            eh, el = host_pack(codes[b, i : i + k])
            assert (hi[b, i], lo[b, i]) == (eh, el), (b, i)


@pytest.mark.parametrize("k", [5, 31, 32, 47, 63])
def test_revcomp_packed(rng, k):
    codes = rng.integers(0, 4, size=(16, k)).astype(np.uint8)
    his, los = [], []
    for row in codes:
        h, l = host_pack(row)
        his.append(h)
        los.append(l)
    hi = jnp.asarray(np.array(his, np.uint64))
    lo = jnp.asarray(np.array(los, np.uint64))
    rhi, rlo = kp.revcomp_packed(hi, lo, k)
    for i, row in enumerate(codes):
        eh, el = host_pack(dna.revcomp_codes(row))
        assert (int(rhi[i]), int(rlo[i])) == (eh, el)


@pytest.mark.parametrize("k", [6, 31, 33, 47])
def test_shift_and_base_ops(rng, k):
    codes = rng.integers(0, 4, size=(k,)).astype(np.uint8)
    h, l = host_pack(codes)
    hi, lo = jnp.uint64(h), jnp.uint64(l)
    assert int(kp.first_base(hi, lo, k)) == codes[0]
    assert int(kp.last_base(hi, lo, k)) == codes[-1]
    for j in [0, 1, k // 2, k - 1]:
        assert int(kp.base_at(hi, lo, j, k)) == codes[j]
    newb = 2
    nhi, nlo = kp.shift_in_base(hi, lo, jnp.uint64(newb), k)
    succ = np.concatenate([codes[1:], [newb]]).astype(np.uint8)
    eh, el = host_pack(succ)
    assert (int(nhi), int(nlo)) == (eh, el)


def test_canonicalize_matches_string_order(rng):
    k = 33
    for _ in range(20):
        codes = rng.integers(0, 4, size=(k,)).astype(np.uint8)
        h, l = host_pack(codes)
        hi, lo = jnp.uint64(h), jnp.uint64(l)
        rhi, rlo = kp.revcomp_packed(hi, lo, k)
        chi, clo, flip = kp.canonicalize(hi, lo, rhi, rlo)
        seq = dna.decode(codes)
        canon = dna.canonical(seq)
        eh, el = host_pack(dna.encode(canon))
        assert (int(chi), int(clo)) == (eh, el)
        assert bool(flip) == (canon != seq)


def test_searchsorted2(rng):
    n = 500
    hi = rng.integers(0, 10, size=n).astype(np.uint64)
    lo = rng.integers(0, 1 << 60, size=n).astype(np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    # queries: mix of present and absent
    qh = np.concatenate([hi[::7], rng.integers(0, 12, size=50).astype(np.uint64)])
    ql = np.concatenate([lo[::7], rng.integers(0, 1 << 60, size=50).astype(np.uint64)])
    pos = np.asarray(kp.searchsorted2(jnp.asarray(hi), jnp.asarray(lo),
                                      jnp.asarray(qh), jnp.asarray(ql)))
    comb = [(int(h), int(l)) for h, l in zip(hi, lo)]
    import bisect
    for i, (h, l) in enumerate(zip(qh.tolist(), ql.tolist())):
        assert pos[i] == bisect.bisect_left(comb, (h, l))


def test_join2(rng):
    import jax.numpy as jnp
    n, q = 500, 2000
    hi = rng.integers(0, 1 << 40, size=n, dtype=np.uint64)
    lo = rng.integers(0, 1 << 40, size=n, dtype=np.uint64)
    # make table distinct
    pairs = np.unique(np.stack([hi, lo], 1), axis=0)
    hi, lo = pairs[:, 0].copy(), pairs[:, 1].copy()
    n = len(hi)
    pick = rng.integers(0, n, size=q // 2)
    qhi = np.concatenate([hi[pick], rng.integers(0, 1 << 40, size=q - q // 2, dtype=np.uint64)])
    qlo = np.concatenate([lo[pick], rng.integers(0, 1 << 40, size=q - q // 2, dtype=np.uint64)])
    got = np.asarray(kp.join2(jnp.asarray(hi), jnp.asarray(lo),
                              jnp.asarray(qhi), jnp.asarray(qlo)))
    lut = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(hi, lo))}
    exp = np.array([lut.get((int(a), int(b)), -1) for a, b in zip(qhi, qlo)],
                   dtype=np.int32)
    np.testing.assert_array_equal(got, exp)
