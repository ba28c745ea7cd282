"""Windowed canonical ntHash on device (JAX/XLA).

TPU-native reformulation of the reference's serial rolling hash
(base/nthash.hpp:295-309, consumed per-base in cqf/CQF_mt.h:610-731): instead
of rolling one base at a time, all window hashes of a batch of reads are
computed at once from prefix-XORs:

    a_j  = rol(seed(s_j), (-j) mod 64)        b_j = rol(cseed(s_j), j mod 64)
    P    = exclusive prefix-XOR of a          Q   = exclusive prefix-XOR of b
    fh(i)= rol(P[i+k] ^ P[i], (k-1+i) mod 64) rh(i)= rol(Q[i+k]^Q[i], (-i) mod 64)
    key  = min(fh, rh) mod range              (canonical, CQF_mt.h:636-671)

The prefix-XOR runs as an O(log L) associative scan along the read axis and
everything else is elementwise — XLA fuses it into a few VPU passes over the
batch.  Results are bit-identical to the reference hash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import nthash as _host

_U64 = jnp.uint64

# 6-entry seed tables indexed by base code (A,C,G,T,N,PAD); N/PAD hash to 0.
_SEEDS = jnp.asarray(np.asarray(_host.SEEDS), dtype=_U64)
_CSEEDS = jnp.asarray(np.asarray(_host.CSEEDS), dtype=_U64)


def _rol(x, s):
    """Rotate left; s may be traced, in [0, 63]."""
    s = s.astype(_U64) if hasattr(s, "astype") else jnp.asarray(s, _U64)
    s = s & _U64(63)
    # ((x << s) | (x >> 64-s)) with the s==0 case folded in via a second mask:
    # x >> 64 is undefined, so compute x >> (64-s) as (x >> (63-s)) >> 1.
    return (x << s) | ((x >> (_U64(63) - s)) >> _U64(1))


@functools.partial(jax.jit, static_argnames=("k",))
def windowed_canonical(codes: jax.Array, lengths: jax.Array, k: int):
    """Canonical hashes for every k-window of a batch of (sub-)reads.

    Args:
      codes: uint8[B, L] base codes (0..3 = ACGT, 4 = N, 5 = pad).
      lengths: int32[B] number of valid leading bases per row.
      k: k-mer size (static).

    Returns:
      keys:  uint64[B, L-k+1] canonical hashes min(fh, rh) (no range mod).
      valid: bool[B, L-k+1] — window i is valid iff i + k <= length.
    """
    B, L = codes.shape
    W = L - k + 1
    j = jnp.arange(L, dtype=_U64)

    a = _rol(_SEEDS[codes], (_U64(64) - (j & _U64(63))) & _U64(63))
    b = _rol(_CSEEDS[codes], j & _U64(63))

    # Inclusive scans; window XOR uses S[i+k-1] ^ S[i-1] (S[-1] := 0).
    Sa = jax.lax.associative_scan(jnp.bitwise_xor, a, axis=1)
    Sb = jax.lax.associative_scan(jnp.bitwise_xor, b, axis=1)
    zeros = jnp.zeros((B, 1), dtype=_U64)
    Pa = jnp.concatenate([zeros, Sa], axis=1)  # exclusive prefix, length L+1
    Pb = jnp.concatenate([zeros, Sb], axis=1)

    i = jnp.arange(W, dtype=_U64)
    fh = _rol(Pa[:, k:] ^ Pa[:, :W], (i + _U64(k - 1)) & _U64(63))
    rh = _rol(Pb[:, k:] ^ Pb[:, :W], (_U64(64) - (i & _U64(63))) & _U64(63))
    keys = jnp.minimum(fh, rh)

    valid = (jnp.arange(W, dtype=jnp.int32)[None, :] + k) <= lengths[:, None]
    return keys, valid


@functools.partial(jax.jit, static_argnames=("k",))
def windowed_fr(codes: jax.Array, lengths: jax.Array, k: int):
    """Like windowed_canonical but returns (fh, rh, valid) separately.

    The Contiger stage needs both strands to roll probes in either direction
    (reference: src/contig_assembly.cpp:3064-3120).
    """
    B, L = codes.shape
    W = L - k + 1
    j = jnp.arange(L, dtype=_U64)
    a = _rol(_SEEDS[codes], (_U64(64) - (j & _U64(63))) & _U64(63))
    b = _rol(_CSEEDS[codes], j & _U64(63))
    Sa = jax.lax.associative_scan(jnp.bitwise_xor, a, axis=1)
    Sb = jax.lax.associative_scan(jnp.bitwise_xor, b, axis=1)
    zeros = jnp.zeros((B, 1), dtype=_U64)
    Pa = jnp.concatenate([zeros, Sa], axis=1)
    Pb = jnp.concatenate([zeros, Sb], axis=1)
    i = jnp.arange(W, dtype=_U64)
    fh = _rol(Pa[:, k:] ^ Pa[:, :W], (i + _U64(k - 1)) & _U64(63))
    rh = _rol(Pb[:, k:] ^ Pb[:, :W], (_U64(64) - (i & _U64(63))) & _U64(63))
    valid = (jnp.arange(W, dtype=jnp.int32)[None, :] + k) <= lengths[:, None]
    return fh, rh, valid


# ---------------------------------------------------------------------------
# u32-pair formulation — the counting hot path.
#
# TPU v5e has no native 64-bit vector ALU: XLA emulates every u64 op as
# multiple u32 ops and (measured) the emulation costs ~4.5 ns/key for this
# hash — 50x the VPU roofline.  The pair formulation keeps everything in
# native u32 lanes:
#
#   * the per-base rotated seeds rol(seed(s_j), (-j) mod 64) depend only on
#     the COLUMN j, so they are precomputed on host as (6, L) u32 tables and
#     selected by base code — zero runtime rotates for the per-base phase;
#   * the prefix-XOR scans run per plane (XOR needs no carries);
#   * the final window rotations have per-column constant amounts, applied
#     as 6 static conditional double-shifts with trace-time constant masks.
#
# Bit-identical to windowed_canonical (tests/test_nthash.py).


def _rot_tables_np(L: int, k: int):
    """Host-precomputed per-column tables (trace-time constants).

    Returns (A_hi, A_lo, B_hi, B_lo) each (6, L) uint32 with
    A[b, j] = rol64(SEEDS[b], (-j) mod 64), B[b, j] = rol64(CSEEDS[b], j mod 64).
    """
    j = np.arange(L, dtype=np.uint64)
    sa = (np.uint64(64) - (j & np.uint64(63))) & np.uint64(63)
    sb = j & np.uint64(63)
    A = _host.rol(np.asarray(_host.SEEDS)[:, None], sa[None, :])
    B = _host.rol(np.asarray(_host.CSEEDS)[:, None], sb[None, :])

    def split(x):
        return ((x >> np.uint64(32)).astype(np.uint32),
                (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    return (*split(A), *split(B))


def _rol64_cols(hi, lo, s_cols: np.ndarray):
    """Rotate-left (hi, lo) u32 pairs by per-COLUMN amounts s_cols (a
    trace-time numpy array), via 6 conditional static double-shifts."""
    s = np.asarray(s_cols, np.int64) & 63
    for b in range(6):
        d = 1 << b
        cond = jnp.asarray(((s >> b) & 1) == 1)[None, :]
        if d == 32:
            rhi, rlo = lo, hi
        else:
            dd = jnp.uint32(d)
            cd = jnp.uint32(32 - d)
            rhi = (hi << dd) | (lo >> cd)
            rlo = (lo << dd) | (hi >> cd)
        hi = jnp.where(cond, rhi, hi)
        lo = jnp.where(cond, rlo, lo)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("k",))
def windowed_canonical_planes(codes: jax.Array, lengths: jax.Array, k: int):
    """windowed_canonical in u32-pair arithmetic.

    Returns (kh, kl) uint32[B, W] planes of the canonical hash min(fh, rh)
    (full 64 bits, no range mod) and valid bool[B, W].
    """
    B, L = codes.shape
    W = L - k + 1
    A_hi, A_lo, B_hi, B_lo = (jnp.asarray(t) for t in _rot_tables_np(L, k))

    zero = jnp.zeros((B, L), jnp.uint32)
    a_hi = a_lo = b_hi = b_lo = zero
    for c in range(4):  # codes 4 (N) and 5 (PAD) keep seed 0
        m = codes == c
        a_hi = jnp.where(m, A_hi[c][None, :], a_hi)
        a_lo = jnp.where(m, A_lo[c][None, :], a_lo)
        b_hi = jnp.where(m, B_hi[c][None, :], b_hi)
        b_lo = jnp.where(m, B_lo[c][None, :], b_lo)

    def pscan(x):
        s = jax.lax.associative_scan(jnp.bitwise_xor, x, axis=1)
        return jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), s], axis=1)

    Pa_hi, Pa_lo = pscan(a_hi), pscan(a_lo)
    Pb_hi, Pb_lo = pscan(b_hi), pscan(b_lo)

    x_hi = Pa_hi[:, k:] ^ Pa_hi[:, :W]
    x_lo = Pa_lo[:, k:] ^ Pa_lo[:, :W]
    y_hi = Pb_hi[:, k:] ^ Pb_hi[:, :W]
    y_lo = Pb_lo[:, k:] ^ Pb_lo[:, :W]

    i = np.arange(W, dtype=np.int64)
    fh_hi, fh_lo = _rol64_cols(x_hi, x_lo, (i + k - 1) % 64)
    rh_hi, rh_lo = _rol64_cols(y_hi, y_lo, (64 - (i % 64)) % 64)

    f_lt = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo <= rh_lo))
    kh = jnp.where(f_lt, fh_hi, rh_hi)
    kl = jnp.where(f_lt, fh_lo, rh_lo)

    valid = (jnp.arange(W, dtype=jnp.int32)[None, :] + k) <= lengths[:, None]
    return kh, kl, valid


def seed_table() -> jax.Array:
    return _SEEDS


def cseed_table() -> jax.Array:
    return _CSEEDS


def roll_forward(fh, rh, out_code, in_code, k: int):
    """Device version of the one-base rolling update (nthash.hpp:305-309).

    All arguments may be batched arrays; out_code/in_code are base codes.
    """
    f = _rol(fh, _U64(1)) ^ _rol(_SEEDS[out_code], _U64(k % 64)) ^ _SEEDS[in_code]
    r = (
        _rol(rh, _U64(63))
        ^ _rol(_CSEEDS[out_code], _U64(63))
        ^ _rol(_CSEEDS[in_code], _U64((k - 1) % 64))
    )
    return f, r
