"""Roundtrip tests for the 2-bit packed read transport (ops/packio)."""

import numpy as np
import jax.numpy as jnp

from sh_assembly_tpu.ops import packio


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    B, L = 64, 160
    codes = rng.integers(0, 6, size=(B, L)).astype(np.uint8)
    packed, nmask = packio.pack_np(codes)
    assert packed.shape == (B, L // 4)
    assert nmask.shape == (B, L // 8)
    out = np.asarray(packio.unpack(jnp.asarray(packed), jnp.asarray(nmask), L))
    # N (4) and pad (5) both reconstruct as PAD=5; ACGT reconstruct exactly
    expect = np.where(codes >= 4, 5, codes)
    np.testing.assert_array_equal(out, expect)


def test_pack_stacked_axes():
    rng = np.random.default_rng(4)
    S, B, L = 3, 8, 32
    codes = rng.integers(0, 6, size=(S, B, L)).astype(np.uint8)
    packed, nmask = packio.pack_np(codes)
    out = np.asarray(packio.unpack(jnp.asarray(packed), jnp.asarray(nmask), L))
    np.testing.assert_array_equal(out, np.where(codes >= 4, 5, codes))
