"""2-bit packed read transport: host packs, device unpacks.

The host->device link is the narrowest resource in the counting pipeline
(PCIe on real TPU hosts; far worse over a development tunnel).  Reads are
2 bits/base information — shipping u8 codes wastes 4x the feed bandwidth
the reference never had to think about (its reads stay in RAM,
cqf/CQF_mt.h:735-816).  Host-side numpy packs each batch into

  packed u8[B, L/4]  — base codes 0..3, little-endian within the byte
  nmask  u8[B, L/8]  — bit j%8 of byte j/8 set iff code >= 4 (N or pad)

and the device reconstructs codes (0..3, or 5 for N/pad) with pure
reshape/shift ops — no gathers.  L must be a multiple of 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PAD = np.uint8(5)


def pack_np(codes: np.ndarray):
    """u8[..., L] base codes -> (packed u8[..., L/4], nmask u8[..., L/8])."""
    L = codes.shape[-1]
    assert L % 8 == 0, f"read length {L} must be a multiple of 8"
    bad = codes >= 4
    c = np.where(bad, 0, codes).astype(np.uint8)
    packed = (
        c[..., 0::4]
        | (c[..., 1::4] << 2)
        | (c[..., 2::4] << 4)
        | (c[..., 3::4] << 6)
    )
    nmask = np.packbits(bad, axis=-1, bitorder="little")
    return packed, nmask


@functools.partial(jax.jit, static_argnames=("L",))
def unpack(packed: jax.Array, nmask: jax.Array, L: int) -> jax.Array:
    """Device inverse of pack_np -> u8[..., L] codes (0..3, 5 for N/pad)."""
    lead = packed.shape[:-1]
    parts = [(packed >> jnp.uint8(2 * s)) & jnp.uint8(3) for s in range(4)]
    codes = jnp.stack(parts, axis=-1).reshape(*lead, L)
    bits = [(nmask >> jnp.uint8(s)) & jnp.uint8(1) for s in range(8)]
    bad = jnp.stack(bits, axis=-1).reshape(*lead, L)
    return jnp.where(bad == 1, PAD, codes)
