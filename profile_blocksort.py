"""Prototype: in-VMEM bitonic full sort of 2^N-element u32 windows.

Calibrates the Pallas bitonic stage cost that the radix buffer-sort design
depends on (VERDICT r4 #2).  Sorts [G, W] windows independently (grid over
G), writes sorted windows back.  Compares against XLA batched row sort.
"""
import sys, time
import numpy as np
import sh_assembly_tpu
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sh_assembly_tpu.ops import merge_pallas as mp

LANES = 128

def log(*a): print(*a, file=sys.stderr, flush=True)


def _flat_idx(rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + c


def _bitonic_sort1(x, n):
    """Full bitonic sort (ascending) of a flat (rows,128) u32 array of
    pow2 length n, single plane."""
    rows = x.shape[0]
    idx = _flat_idx(rows)
    k = 2
    while k <= n:
        # merge step distance k/2 with direction depending on idx & k
        j = k // 2
        while j >= 1:
            partner_up = mp._shift_up(x, j, 0xFFFFFFFF)
            partner_dn = mp._shift_down(x, j, 0)
            is_lower = (idx & j) == 0
            partner = jnp.where(is_lower, partner_up, partner_dn)
            keep_min = is_lower == (((idx & k) == 0))
            mn = jnp.where(x < partner, x, partner)
            mx = jnp.where(x < partner, partner, x)
            x = jnp.where(keep_min, mn, mx)
            j //= 2
        k *= 2
    return x


def make_sort_kernel(W):
    rows = W // LANES

    def kernel(x_ref, o_ref, vin, sem_i, sem_o):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(pl.program_id(0) * rows, rows)], vin, sem_i)
        cp.start(); cp.wait()
        s = _bitonic_sort1(vin[:, :], W)
        vin[:, :] = s
        cp2 = pltpu.make_async_copy(vin, o_ref.at[pl.ds(pl.program_id(0) * rows, rows)], sem_o)
        cp2.start(); cp2.wait()

    return kernel


def block_sort(x, W):
    N = x.shape[0]
    G = N // W
    rows = W // LANES
    kern = make_sort_kernel(W)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x.reshape(-1, LANES))
    return out.reshape(-1)


BC = 1 << 27
rng = np.random.default_rng(0)
xnp = rng.integers(0, 1 << 32, size=BC, dtype=np.uint64).astype(np.uint32)
x = jax.device_put(jnp.asarray(xnp))

for Wl in (17,):
    W = 1 << Wl
    try:
        jfn = jax.jit(lambda a, W=W: block_sort(a, W)[::65536].astype(jnp.uint64).sum())
        v = float(np.asarray(jfn(x)))
        t0 = time.time(); v = float(np.asarray(jfn(x))); dt = time.time() - t0
        stages = Wl * (Wl + 1) // 2
        log(f"blocksort W=2^{Wl}: {dt*1e3:.0f} ms  ({dt/BC*1e9:.2f} ns/elem, "
            f"{stages} stages -> {dt/BC/stages*1e12:.1f} ps/elem/stage) chk={v:.0f}")
        # verify on small slice
        got = np.asarray(block_sort(x[:W * 2], W))
        want = np.concatenate([np.sort(xnp[:W]), np.sort(xnp[W:2 * W])])
        log(f"  correct: {np.array_equal(got, want)}")
    except Exception as e:
        log(f"W=2^{Wl}: FAILED {type(e).__name__}: {e}")
        break
