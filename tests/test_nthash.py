"""ntHash: host closed-form vs serial definition vs device kernel."""

import numpy as np
import pytest

from sh_assembly_tpu.utils import dna, nthash


def serial_fhash(codes, k):
    h = np.uint64(0)
    for i in range(k):
        h ^= nthash.rol(nthash.SEEDS[codes[i]], (k - 1 - i) % 64)
    return h


def test_rol_identities():
    x = np.uint64(0x0123456789ABCDEF)
    assert nthash.rol(x, 0) == x
    assert nthash.rol(x, 64 % 64) == x
    assert nthash.rol(nthash.ror(x, 13), 13) == x


@pytest.mark.parametrize("k", [5, 28, 47, 63])
def test_windowed_matches_serial(rng, k):
    codes = rng.integers(0, 4, size=200).astype(np.uint8)
    fh, rh = nthash.windowed_hashes(codes, k)
    for i in range(0, len(codes) - k + 1, 17):
        assert fh[i] == serial_fhash(codes[i : i + k], k)
        assert rh[i] == nthash.rhash(codes[i : i + k])


@pytest.mark.parametrize("k", [21, 47])
def test_rolling_matches_windowed(rng, k):
    codes = rng.integers(0, 4, size=150).astype(np.uint8)
    fh, rh = nthash.fhash(codes[:k]), nthash.rhash(codes[:k])
    wfh, wrh = nthash.windowed_hashes(codes, k)
    assert (fh, rh) == (wfh[0], wrh[0])
    for i in range(k, len(codes)):
        fh, rh = nthash.roll_forward(fh, rh, codes[i - k], codes[i], k)
        assert fh == wfh[i - k + 1]
        assert rh == wrh[i - k + 1]


def test_canonical_is_strand_symmetric(rng):
    k = 31
    codes = rng.integers(0, 4, size=k).astype(np.uint8)
    rc = dna.revcomp_codes(codes)
    assert nthash.canonical_hash(codes) == nthash.canonical_hash(rc)
    # forward hash of rc equals reverse hash of original
    assert nthash.fhash(rc) == nthash.rhash(codes)


def test_n_has_zero_seed():
    assert nthash.SEEDS[4] == 0 and nthash.CSEEDS[4] == 0


@pytest.mark.parametrize("k", [28, 47])
def test_device_kernel_matches_host(rng, k):
    from sh_assembly_tpu.ops import nthash as dev

    B, L = 8, 120
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    # embed some Ns and variable lengths
    codes[2, 60] = 4
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    keys, valid = dev.windowed_canonical(codes, lengths, k)
    keys, valid = np.asarray(keys), np.asarray(valid)
    for b in range(B):
        host = nthash.canonical_windowed(codes[b, : lengths[b]], k)
        W = lengths[b] - k + 1
        assert valid[b, :W].all() and not valid[b, W:].any()
        np.testing.assert_array_equal(keys[b, :W], host)


def test_device_roll_forward_matches_host(rng):
    from sh_assembly_tpu.ops import nthash as dev
    import jax.numpy as jnp

    k = 31
    codes = rng.integers(0, 4, size=k + 1).astype(np.uint8)
    fh, rh = nthash.fhash(codes[:k]), nthash.rhash(codes[:k])
    f2, r2 = nthash.roll_forward(fh, rh, codes[0], codes[k], k)
    df, dr = dev.roll_forward(
        jnp.uint64(fh), jnp.uint64(rh), jnp.uint8(codes[0]), jnp.uint8(codes[k]), k
    )
    assert (np.uint64(df), np.uint64(dr)) == (f2, r2)
