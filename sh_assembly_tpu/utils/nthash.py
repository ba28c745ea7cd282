"""ntHash (Mohamadi et al., BCGSC) — host/NumPy implementation.

The four 64-bit base seeds are the published ntHash constants; the rotation
tables the reference precomputes (base/nthash.hpp msTab) are derived here by
rotation instead of being copied.  Semantics match base/nthash.hpp:

  fh(kmer) = XOR_{i=0..k-1} rol(seed[base_i],  (k-1-i) mod 64)
  rh(kmer) = XOR_{i=0..k-1} rol(seed[comp(base_i)], i mod 64)
  canonical = min(fh, rh)            (NTPC64, nthash.hpp:295-302)

Bases use the code space of utils.dna (A=0,C=1,G=2,T=3,N=4); N has seed 0,
so it contributes nothing to a window's hash — the reference behaves the
same way for Ns embedded in the first window of a sub-read
(cqf/CQF_mt.h:626-636 never re-checks those positions).
"""

from __future__ import annotations

import numpy as np

SEED_A = np.uint64(0x3C8BFBB395C60474)
SEED_C = np.uint64(0x3193C18562A02B4C)
SEED_G = np.uint64(0x20323ED082572324)
SEED_T = np.uint64(0x295549F54BE24456)
SEED_N = np.uint64(0)

# seeds indexed by base code; position 4 (N) and 5 (PAD) hash to 0.
SEEDS = np.array([SEED_A, SEED_C, SEED_G, SEED_T, SEED_N, SEED_N], dtype=np.uint64)
# complement seeds: comp(code) = 3 - code for ACGT, N stays N.
CSEEDS = np.array([SEED_T, SEED_G, SEED_C, SEED_A, SEED_N, SEED_N], dtype=np.uint64)

_U64 = np.uint64
_ROT_MASK = _U64(63)


def rol(x: np.ndarray | np.uint64, s) -> np.ndarray:
    """64-bit rotate left by s (s in [0, 63], scalar or array)."""
    x = np.asarray(x, dtype=np.uint64)
    s = np.asarray(s, dtype=np.uint64) & _ROT_MASK
    with np.errstate(over="ignore"):
        return np.where(s == 0, x, (x << s) | (x >> (_U64(64) - s)))


def ror(x, s):
    return rol(x, (_U64(64) - (np.asarray(s, dtype=np.uint64) & _ROT_MASK)) & _ROT_MASK)


def fhash(codes: np.ndarray, k: int | None = None) -> np.uint64:
    """Forward-strand hash of one k-mer given as base codes."""
    codes = np.asarray(codes)
    k = len(codes) if k is None else k
    h = _U64(0)
    for i in range(k):
        h ^= rol(SEEDS[codes[i]], (k - 1 - i) % 64)
    return _U64(h)


def rhash(codes: np.ndarray, k: int | None = None) -> np.uint64:
    """Reverse-strand hash of one k-mer."""
    codes = np.asarray(codes)
    k = len(codes) if k is None else k
    h = _U64(0)
    for i in range(k):
        h ^= rol(CSEEDS[codes[i]], i % 64)
    return _U64(h)


def canonical_hash(codes: np.ndarray) -> np.uint64:
    f, r = fhash(codes), rhash(codes)
    return r if r < f else f


def roll_forward(fh: np.uint64, rh: np.uint64, out_code: int, in_code: int, k: int):
    """Slide the window one base right (NTPC64 rolling form, nthash.hpp:305-309)."""
    fh = rol(fh, 1) ^ rol(SEEDS[out_code], k % 64) ^ SEEDS[in_code]
    rh = ror(rh, 1) ^ ror(CSEEDS[out_code], 1) ^ rol(CSEEDS[in_code], (k - 1) % 64)
    return _U64(fh), _U64(rh)


def windowed_hashes(codes: np.ndarray, k: int):
    """(fh, rh) for every window of a code sequence — vectorized closed form.

    fh(i) = rol(P[i+k] ^ P[i], (k-1+i) mod 64) where P is the exclusive
    prefix-XOR of a_j = rol(seed(s_j), (-j) mod 64); likewise
    rh(i) = rol(Q[i+k] ^ Q[i], (-i) mod 64) with b_j = rol(cseed(s_j), j mod 64).
    This is the same formulation the device kernel uses (ops/nthash.py).
    """
    codes = np.asarray(codes)
    L = len(codes)
    if L < k:
        return (np.empty(0, dtype=np.uint64),) * 2
    j = np.arange(L, dtype=np.uint64)
    a = rol(SEEDS[codes], (_U64(64) - (j & _ROT_MASK)) & _ROT_MASK)
    b = rol(CSEEDS[codes], j & _ROT_MASK)
    P = np.zeros(L + 1, dtype=np.uint64)
    Q = np.zeros(L + 1, dtype=np.uint64)
    np.bitwise_xor.accumulate(a, out=P[1:])
    np.bitwise_xor.accumulate(b, out=Q[1:])
    i = np.arange(L - k + 1, dtype=np.uint64)
    fh = rol(P[k:] ^ P[: L - k + 1], (i + _U64(k - 1)) & _ROT_MASK)
    rh = rol(Q[k:] ^ Q[: L - k + 1], (_U64(64) - (i & _ROT_MASK)) & _ROT_MASK)
    return fh, rh


def canonical_windowed(codes: np.ndarray, k: int) -> np.ndarray:
    fh, rh = windowed_hashes(codes, k)
    return np.minimum(fh, rh)
