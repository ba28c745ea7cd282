"""Streaming 128-bit dedup-merge Pallas kernel: the node-store fold.

The Contiger's node store holds 128-bit packed k-mers (+1 seed-flag bit).
Folding a sorted flush level into the sorted main store with XLA costs an
O((n0+n1) log(n0+n1)) multi-operand sort per fold — the collect stage's
scale limit (models/contiger._flush_pending note).  Like its siblings
(ops/merge_pallas, ops/join_pallas) this kernel streams the two sorted
sequences through VMEM in one linear pass: bitonic merge network, run
dedup (keep the first entry of each equal-k-mer run), log-shift
compaction, A-aligned staged output.

Element encoding — four u32 planes p0..p3 (big-endian plane order, so
lexicographic (p0, p1, p2, p3) order == 128-bit value order):

  p0..p3 = the left-aligned packed k-mer (kmerpack layout, 2k <= 126
  bits), with the TWO FREE LOW BITS of p3 carrying
    bit 1: inverted seed flag (0 = seed)  -> the seeded copy of a k-mer
           sorts FIRST in its run REGARDLESS of source (the flag must
           outrank the tag), so keep-first ORs seed flags
    bit 0: source tag (0 = stream A, 1 = stream B) -> per-block
           consumption counts derive from the tag (the count-0
           convention of the 64-bit kernel, generalized)
  SENTINEL: all four planes 0xffffffff.

Runs group by the k-mer alone (p3 masked by ~3); emitted entries keep the
first (minimum) copy's bits with the source tag cleared.  Requires
k <= 62: bit 2 of p3 is then always zero for real entries, so the
all-ones SENTINEL can never collide with a poly-T k-mer carrying both
low bits (k = 63 callers must use the XLA fold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge_pallas import (
    DEF_ALIGN, DEF_WINDOW, FULL, LANES, _flat_idx, _pad_len, _reverse_flat,
    _roll_shift_down, _roll_shift_up, _shape2d, _shift_down, _shift_up,
)

U32 = jnp.uint32
TAG_BIT = np.uint32(1)
LOW_MASK = np.uint32(3)  # nflag | tag


def _le4(a, b):
    """Lexicographic (p0..p3) <= for 4-plane tuples."""
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    return (
        (a0 < b0)
        | ((a0 == b0) & ((a1 < b1)
           | ((a1 == b1) & ((a2 < b2)
              | ((a2 == b2) & (a3 <= b3))))))
    )


def _bitonic_merge4(planes, length):
    """Fully sort a bitonic (asc ++ desc) 4-plane sequence of `length`."""
    rows = planes[0].shape[0]
    idx = _flat_idx(rows)
    d = length // 2
    while d >= 1:
        ups = [_shift_up(p, d, FULL) for p in planes]
        le = _le4(planes, ups)
        mins = [jnp.where(le, p, u) for p, u in zip(planes, ups)]
        maxs = [jnp.where(le, u, p) for p, u in zip(planes, ups)]
        lower = (idx & d) == 0
        planes = [
            jnp.where(lower, mn, _shift_down(mx, d, FULL))
            for mn, mx in zip(mins, maxs)
        ]
        d //= 2
    return planes


def _make_kernel(N0_pad, N1_pad, OUT_pad, L, A, T, G):
    Tr = T // LANES
    Lr = L // LANES
    Ar = A // LANES
    Wr = Tr + Ar

    def kernel(a_refs0, a_refs1, a_refs2, a_refs3,
               b_refs0, b_refs1, b_refs2, b_refs3,
               o0_ref, o1_ref, o2_ref, o3_ref, meta_ref,
               va0, va1, va2, va3, vb0, vb1, vb2, vb3,
               wo0, wo1, wo2, wo3,
               t0_, t1_, t2_, t3_,
               vmeta, smem, sem_in, sem_out, sem_meta):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            smem[0] = 0  # I: consumed from A
            smem[1] = 0  # J: consumed from B
            smem[2] = 0  # OUT_ABS
            smem[3] = jnp.int32(-1)  # carried run key planes (sentinel)
            smem[4] = jnp.int32(-1)
            smem[5] = jnp.int32(-1)
            smem[6] = jnp.int32(-4)  # key3 with low bits masked
            smem[7] = 1  # carry is-sent

        I = smem[0]
        J = smem[1]
        OUT_ABS = smem[2]

        A32 = jnp.int32(A)
        LN32 = jnp.int32(LANES)
        i0 = jnp.minimum((I // A32) * A32, jnp.int32(N0_pad - L))
        j0 = jnp.minimum((J // A32) * A32, jnp.int32(N1_pad - L))
        frac_i = I - i0
        frac_j = J - j0

        a_refs = (a_refs0, a_refs1, a_refs2, a_refs3)
        b_refs = (b_refs0, b_refs1, b_refs2, b_refs3)
        vas = (va0, va1, va2, va3)
        vbs = (vb0, vb1, vb2, vb3)
        cps = []
        for p in range(4):
            cps.append(pltpu.make_async_copy(
                a_refs[p].at[pl.ds(i0 // LN32, Lr)], vas[p],
                sem_in.at[jnp.int32(p)]))
            cps.append(pltpu.make_async_copy(
                b_refs[p].at[pl.ds(j0 // LN32, Lr)], vbs[p],
                sem_in.at[jnp.int32(4 + p)]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        sent = jnp.uint32(FULL)
        fi = jnp.minimum(frac_i, jnp.int32(L - 1))
        fj = jnp.minimum(frac_j, jnp.int32(L - 1))
        ap = _roll_shift_up(tuple(v[:, :] for v in vas), fi, FULL)
        bp = _roll_shift_up(tuple(v[:, :] for v in vbs), fj, FULL)
        stale_i = frac_i >= jnp.int32(L)
        stale_j = frac_j >= jnp.int32(L)
        ap = [jnp.where(stale_i, sent, p) for p in ap]
        bp = [jnp.where(stale_j, sent, p) for p in bp]
        blk_skip = (ap[0][0, 0] == sent) & (ap[3][0, 0] == sent) & \
            (bp[0][0, 0] == sent) & (bp[3][0, 0] == sent)

        @pl.when(blk_skip)
        def _():
            smem[1] = J + jnp.int32(T)

        @pl.when(~blk_skip)
        def _():
            rb = [_reverse_flat(p) for p in bp]
            planes = [jnp.concatenate([a, r], axis=0)
                      for a, r in zip(ap, rb)]
            planes = _bitonic_merge4(planes, 2 * L)
            k0, k1, k2, k3 = [p[:Tr] for p in planes]

            is_sent = (k0 == sent) & (k1 == sent) & (k2 == sent) & \
                (k3 == sent)
            from_b = (~is_sent) & ((k3 & TAG_BIT) != 0)
            key3 = k3 & ~LOW_MASK
            idxT = _flat_idx(Tr)

            p0 = _shift_down(k0, 1, FULL)
            p1 = _shift_down(k1, 1, FULL)
            p2 = _shift_down(k2, 1, FULL)
            p3k = _shift_down(key3, 1, np.uint32(FULL & ~3))
            ps = _shift_down(is_sent.astype(U32), 1, np.uint32(1))
            same = (k0 == p0) & (k1 == p1) & (k2 == p2) & (key3 == p3k) & \
                (is_sent.astype(U32) == ps)
            # the carried run: its key lives in smem[3..7]
            c0 = smem[3].astype(U32)
            c1 = smem[4].astype(U32)
            c2 = smem[5].astype(U32)
            c3 = smem[6].astype(U32)
            c_sent = smem[7].astype(U32)
            same0 = (k0 == c0) & (k1 == c1) & (k2 == c2) & (key3 == c3) & \
                (is_sent.astype(U32) == c_sent)
            at0 = idxT == 0
            same = (at0 & same0) | (~at0 & same)
            first = ~same

            # consumption: B-side count (sentinels -> A side)
            red = jnp.where(from_b, jnp.uint32(1), jnp.uint32(0))
            dd = 1
            while dd < T:
                red = red + _shift_up(red, dd, np.uint32(0))
                dd *= 2
            j_cons = red[0, 0].astype(jnp.int32)
            i_cons = jnp.int32(T) - j_cons

            keep = first & ~is_sent
            e0 = jnp.where(keep, k0, sent)
            e1 = jnp.where(keep, k1, sent)
            e2 = jnp.where(keep, k2, sent)
            e3 = jnp.where(keep, k3 & ~TAG_BIT, sent)

            rnk = keep.astype(U32)
            d = 1
            while d < T:
                valid_ = idxT >= d
                r2 = _shift_down(rnk, d, np.uint32(0))
                rnk = jnp.where(valid_, rnk + r2, rnk)
                d *= 2
            n_emit = rnk[Tr - 1, LANES - 1].astype(jnp.int32)
            move = jnp.where(keep, idxT.astype(U32) - (rnk - 1),
                             jnp.uint32(0))
            alive = keep
            es = [e0, e1, e2, e3]
            b = 0
            while (1 << b) < T:
                dd2 = 1 << b
                mb = ((move >> b) & 1) == 1
                srcs = [_shift_up(e, dd2, FULL) for e in es]
                src_m = _shift_up(move, dd2, np.uint32(0))
                src_a = _shift_up((alive & mb).astype(U32), dd2,
                                  np.uint32(0)) == 1
                vac = alive & mb
                es = [jnp.where(src_a, s, jnp.where(vac, sent, e))
                      for s, e in zip(srcs, es)]
                move = jnp.where(src_a, src_m,
                                 jnp.where(vac, jnp.uint32(0), move))
                alive = src_a | (alive & ~vac)
                b += 1

            out0 = (OUT_ABS // A32) * A32
            frac_out = OUT_ABS - out0
            padp = jnp.full((Ar, LANES), sent, U32)
            staged = [jnp.concatenate([e, padp], axis=0) for e in es]
            staged = _roll_shift_down(tuple(staged), frac_out)
            idxW = _flat_idx(Wr)
            keep_prev = idxW < frac_out
            tails = (t0_, t1_, t2_, t3_)
            wos = (wo0, wo1, wo2, wo3)
            for p in range(4):
                tl = jnp.concatenate(
                    [tails[p][:, :],
                     jnp.full((Wr - Ar, LANES), sent, U32)], axis=0)
                wos[p][:, :] = jnp.where(keep_prev, tl, staged[p])

            o_refs = (o0_ref, o1_ref, o2_ref, o3_ref)
            ocps = [pltpu.make_async_copy(
                wos[p], o_refs[p].at[pl.ds(out0 // LN32, Wr)],
                sem_out.at[jnp.int32(p)]) for p in range(4)]
            for cp in ocps:
                cp.start()
            new_out_abs = OUT_ABS + n_emit
            new_out0 = (new_out_abs // A32) * A32
            roff = (new_out0 - out0) // LN32
            for cp in ocps:
                cp.wait()
            for p in range(4):
                tails[p][:, :] = wos[p][pl.ds(roff, Ar), :]

            last_r = Tr - 1
            smem[0] = I + i_cons
            smem[1] = J + j_cons
            smem[2] = new_out_abs
            smem[3] = k0[last_r, LANES - 1].astype(jnp.int32)
            smem[4] = k1[last_r, LANES - 1].astype(jnp.int32)
            smem[5] = k2[last_r, LANES - 1].astype(jnp.int32)
            smem[6] = key3[last_r, LANES - 1].astype(jnp.int32)
            smem[7] = is_sent.astype(U32)[last_r, LANES - 1] \
                .astype(jnp.int32)

        @pl.when(g == G - 1)
        def _():
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            vmeta[:, :] = jnp.where(
                (r8 == 0) & (c8 == 0), smem[2], jnp.int32(0))
            cp_meta = pltpu.make_async_copy(vmeta, meta_ref, sem_meta)
            cp_meta.start()
            cp_meta.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("window", "align"))
def merge128_planes(a_planes, b_planes,
                    window: int = DEF_WINDOW, align: int = DEF_ALIGN):
    """Dedup-merge two sorted 4-plane streams (module encoding).

    a_planes/b_planes: tuples of four u32[N_pad] planes, each key-sorted
    with SENTINEL padding, N_pad a multiple of `align` and >= window.
    Stream A must carry source-tag bit 0, stream B tag bit 1 (bit 1 of
    plane 3); equal k-mers dedup to the minimum copy with the tag cleared.
    Returns (out_planes tuple of u32[OUT_pad], n_live).
    """
    L, A = window, align
    T = L - A
    N0_pad = a_planes[0].shape[0]
    N1_pad = b_planes[0].shape[0]
    assert N0_pad % A == 0 and N1_pad % A == 0
    assert N0_pad >= L and N1_pad >= L
    total = N0_pad + N1_pad
    G = -(-total // T) + 1
    OUT_pad = ((total + T + A) // A + 1) * A

    kernel = _make_kernel(N0_pad, N1_pad, OUT_pad, L, A, T, G)

    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((OUT_pad // LANES, LANES), U32)] * 4
            + [jax.ShapeDtypeStruct((8, LANES), jnp.int32)]),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 5),
        scratch_shapes=(
            [pltpu.VMEM(_shape2d(L), U32) for _ in range(8)]
            + [pltpu.VMEM(_shape2d(T + A), U32) for _ in range(4)]
            + [pltpu.VMEM(_shape2d(A), U32) for _ in range(4)]
            + [pltpu.VMEM((8, LANES), jnp.int32),
               pltpu.SMEM((8,), jnp.int32),
               pltpu.SemaphoreType.DMA((8,)),
               pltpu.SemaphoreType.DMA((4,)),
               pltpu.SemaphoreType.DMA(())]),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*[p.reshape(-1, LANES) for p in a_planes],
      *[p.reshape(-1, LANES) for p in b_planes])

    o = [outs[p].reshape(-1) for p in range(4)]
    n_live = outs[4][0, 0]
    return (o[0], o[1], o[2], o[3]), n_live
