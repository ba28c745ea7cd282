"""TPU-vs-XLA bit identity of the merge/sweep paths, on the REAL backend.

Run with SH_TPU_TESTS=1 (conftest then leaves JAX on the axon/TPU
platform).  The streaming Pallas kernel and the XLA sort path must produce
byte-identical packed planes — the mechanical version of the verify
skill's manual md5 recipe.  Skipped on CPU (both paths are the same code
there).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sh_assembly_tpu.ops import spectrum as sp

pytestmark = pytest.mark.skipif(
    not os.environ.get("SH_TPU_TESTS")
    or jax.default_backend() not in ("tpu", "axon"),
    reason="needs SH_TPU_TESTS=1 and a real TPU backend",
)


@pytest.mark.parametrize("key_bits,drop", [(33, False), (33, True),
                                           (37, False), (24, True)])
def test_kernel_and_xla_paths_bit_identical(key_bits, drop):
    rng = np.random.default_rng(key_bits * 7 + drop)
    C, BC = 1 << 16, 1 << 15
    spec = sp.make(C, BC)
    keys = np.concatenate([
        rng.integers(0, 1 << key_bits, size=BC // 2, dtype=np.uint64),
        np.repeat(rng.integers(0, 1 << key_bits, size=BC // 8,
                               dtype=np.uint64), 3),
    ])[:BC]
    spec = sp.insert(spec, jnp.asarray(keys))

    a = jax.jit(sp._merge_kernel_path,
                static_argnames=("key_bits", "drop_singletons"))(
        spec, key_bits=key_bits, drop_singletons=drop)
    b = jax.jit(sp._merge_xla_path,
                static_argnames=("key_bits", "drop_singletons"))(
        spec, key_bits=key_bits, drop_singletons=drop)

    assert int(a.n_main) == int(b.n_main)
    assert int(a.nelts) == int(b.nelts)
    np.testing.assert_array_equal(np.asarray(a.hi), np.asarray(b.hi))
    np.testing.assert_array_equal(np.asarray(a.lo), np.asarray(b.lo))
