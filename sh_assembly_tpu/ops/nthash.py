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
