"""Measure buffer-sort variants on the real chip (design probe for the
bucketed radix replacement of sort_pack_buf, VERDICT r4 #2).

Variants at BC=2^27, key_bits=36:
  A. current: lax.sort pair (u32 hi, u32 lo) num_keys=2   [the 636ms]
  B. lax.sort single u64 packed
  C. lax.sort flat u32 (lo only; semantics-wrong, cost probe)
  D. batched u32 rows [256, 2^19]  (post-binning stage-2 candidate)
  E. batched u32 rows [64, 2^21]
  F. batched u32 rows [1024, 2^17]
  G. batched pair rows [256, 2^19] (binning-free chunked pair sort)
  H. argsort-free key+payload: sort u32 with 4-bit bucket in high bits?
     (skip)
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

BC = 1 << 27
rng = np.random.default_rng(0)
hi_np = rng.integers(0, 16, size=BC).astype(np.uint32)
lo_np = rng.integers(0, 1 << 32, size=BC, dtype=np.uint64).astype(np.uint32)
hi = jax.device_put(jnp.asarray(hi_np))
lo = jax.device_put(jnp.asarray(lo_np))

def timeit(name, fn, *args):
    try:
        jfn = jax.jit(fn)
        out = jax.block_until_ready(jfn(*args))
        t0 = time.time()
        out = jax.block_until_ready(jfn(*args))
        dt = time.time() - t0
        log(f"{name}: {dt*1e3:.0f} ms  ({BC/dt/1e6:.0f} M elem/s)")
        del out
    except Exception as e:
        log(f"{name}: FAILED {e!r}")

timeit("A pair (hi,lo) flat 2^27", lambda a, b: jax.lax.sort((a, b), num_keys=2), hi, lo)
timeit("B u64 flat 2^27",
       lambda a, b: jax.lax.sort((a.astype(jnp.uint64) << jnp.uint64(32)) | b.astype(jnp.uint64)), hi, lo)
timeit("C u32 flat 2^27", lambda b: jax.lax.sort(b), lo)
timeit("D u32 rows [256,2^19]", lambda b: jax.lax.sort(b.reshape(256, 1 << 19), dimension=1), lo)
timeit("E u32 rows [64,2^21]", lambda b: jax.lax.sort(b.reshape(64, 1 << 21), dimension=1), lo)
timeit("F u32 rows [1024,2^17]", lambda b: jax.lax.sort(b.reshape(1024, 1 << 17), dimension=1), lo)
timeit("G pair rows [256,2^19]",
       lambda a, b: jax.lax.sort((a.reshape(256, 1 << 19), b.reshape(256, 1 << 19)), num_keys=2, dimension=1), hi, lo)
timeit("H u32 rows [4096,2^15]", lambda b: jax.lax.sort(b.reshape(4096, 1 << 15), dimension=1), lo)
