"""Streaming merge-join Pallas kernel: counts for SORTED query keys.

query_join (ops/spectrum) answers batched count lookups by sorting the
concatenation of the spectrum and the queries — an O((C+Q) log(C+Q)) XLA
sort per call, the dominant cost of the Contiger's flush filter and probe
phases.  But the spectrum is ALREADY sorted, and the callers can sort just
the queries (O(Q log Q), Q << C); folding two sorted streams is a linear
merge, which this kernel streams at HBM-friendly cost like its sibling
ops/merge_pallas (same window/DMA skeleton).

Element encoding (kernel packing of ops/merge_pallas):

  spec entry:  key << KSHIFT | traveled << CBITS | count     (count <= cap)
  query:       key << KSHIFT | QMARK                         (QMARK = 2^CBITS-1)
  SENTINEL:    hi = lo = 0xffffffff

QMARK = all-ones count field > cap, so a query sorts strictly AFTER the
same key's spec entry and "is this a query" is derivable per element
(spec counts are <= cap = 2^CBITS-2; the full-sentinel pair is checked
first).  The kernel merges the two streams, forward-propagates the last
spec (key, count) seen, and emits ONE u32 count per query in query order:
count of the matching spec key, else 0.

Output: counts u32[OUT_pad] whose first n_queries entries answer the
queries in their (sorted) input order; the tail is garbage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge_pallas import (
    DEF_ALIGN, DEF_WINDOW, FULL, LANES, U32, _bitonic_merge, _flat_idx,
    _pad_len, _reverse_flat, _roll_shift_down, _roll_shift_up, _shape2d,
    _shift_down, _shift_up,
)


def _make_kernel(C_pad, Q_pad, OUT_pad, L, A, T, G, cbits):
    Tr = T // LANES
    Lr = L // LANES
    Ar = A // LANES
    Wr = Tr + Ar
    cmask = np.uint32((1 << cbits) - 1)
    # QMARK fills count AND traveled bits: a traveled spec entry carries
    # trav<<cbits = 2^cbits > 2^cbits - 1, so a count-field-only marker
    # would sort a query BEFORE a traveled spec entry of the same key
    qmask = np.uint32((1 << (cbits + 1)) - 1)
    qmark = qmask
    keylo_mask = (np.uint32(0) if cbits + 1 >= 32
                  else np.uint32(FULL ^ ((1 << (cbits + 1)) - 1)))

    def kernel(sh_ref, sl_ref, qh_ref, ql_ref,  # ANY inputs
               oc_ref, meta_ref,  # ANY outputs
               vsh, vsl, vqh, vql,  # [Lr,128] input windows
               woc,  # [Wr,128] output staging (counts)
               tail_c,  # [Ar,128] preserved written tail
               vmeta, smem, sem_in, sem_out, sem_meta):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            smem[0] = 0  # I: consumed from spec (absolute)
            smem[1] = 0  # J: consumed from queries
            smem[2] = 0  # OUT_ABS: emitted query answers
            smem[3] = jnp.int32(-1)  # carry spec hi
            smem[4] = jnp.int32(-1)  # carry spec lo key part
            smem[5] = 0  # carry spec count
            smem[6] = 0  # carry valid (any spec seen)

        I = smem[0]
        J = smem[1]
        OUT_ABS = smem[2]

        A32 = jnp.int32(A)
        LN32 = jnp.int32(LANES)
        i0 = jnp.minimum((I // A32) * A32, jnp.int32(C_pad - L))
        j0 = jnp.minimum((J // A32) * A32, jnp.int32(Q_pad - L))
        frac_i = I - i0
        frac_j = J - j0

        cp_s_h = pltpu.make_async_copy(
            sh_ref.at[pl.ds(i0 // LN32, Lr)], vsh, sem_in.at[jnp.int32(0)])
        cp_s_l = pltpu.make_async_copy(
            sl_ref.at[pl.ds(i0 // LN32, Lr)], vsl, sem_in.at[jnp.int32(1)])
        cp_q_h = pltpu.make_async_copy(
            qh_ref.at[pl.ds(j0 // LN32, Lr)], vqh, sem_in.at[jnp.int32(2)])
        cp_q_l = pltpu.make_async_copy(
            ql_ref.at[pl.ds(j0 // LN32, Lr)], vql, sem_in.at[jnp.int32(3)])
        cp_s_h.start(); cp_s_l.start(); cp_q_h.start(); cp_q_l.start()
        cp_s_h.wait(); cp_s_l.wait(); cp_q_h.wait(); cp_q_l.wait()

        sent = jnp.uint32(FULL)
        fi = jnp.minimum(frac_i, jnp.int32(L - 1))
        fj = jnp.minimum(frac_j, jnp.int32(L - 1))
        ah, al = _roll_shift_up((vsh[:, :], vsl[:, :]), fi, FULL)
        bh, bl = _roll_shift_up((vqh[:, :], vql[:, :]), fj, FULL)
        stale_i = frac_i >= jnp.int32(L)
        stale_j = frac_j >= jnp.int32(L)
        ah = jnp.where(stale_i, sent, ah)
        al = jnp.where(stale_i, sent, al)
        bh = jnp.where(stale_j, sent, bh)
        bl = jnp.where(stale_j, sent, bl)
        # whole-block skip: both windows exhausted to padding -> consume
        # the block from the QUERY side (sentinel queries emit nothing)
        blk_skip = (ah[0, 0] == sent) & (al[0, 0] == sent) & \
            (bh[0, 0] == sent) & (bl[0, 0] == sent)

        @pl.when(blk_skip)
        def _():
            smem[1] = J + jnp.int32(T)

        @pl.when(~blk_skip)
        def _():
            rh = _reverse_flat(bh)
            rl = _reverse_flat(bl)
            ch = jnp.concatenate([ah, rh], axis=0)
            cl = jnp.concatenate([al, rl], axis=0)
            ch, cl = _bitonic_merge(ch, cl, 2 * L)

            kh = ch[:Tr]
            kl = cl[:Tr]
            is_sent = (kh == sent) & (kl == sent)
            cnt_field = kl & cmask
            is_q = (~is_sent) & ((kl & qmask) == qmark)
            is_spec = (~is_sent) & ~is_q
            klo_key = kl & keylo_mask
            idxT = _flat_idx(Tr)

            # forward-propagate the last spec (key, count) at/before each
            # position: log-shift copy-scan over (valid, hi, lokey, count)
            v = is_spec
            ph = kh
            pk = klo_key
            pc = cnt_field
            d = 1
            while d < T:
                v2 = _shift_down(v.astype(U32), d, np.uint32(0)) == 1
                h2 = _shift_down(ph, d, FULL)
                k2 = _shift_down(pk, d, np.uint32(0))
                c2 = _shift_down(pc, d, np.uint32(0))
                take = ~v & v2
                ph = jnp.where(take, h2, ph)
                pk = jnp.where(take, k2, pk)
                pc = jnp.where(take, c2, pc)
                v = v | v2
                d *= 2
            # fold the cross-block carry into positions before the first
            # in-block spec
            c_hi = smem[3].astype(U32)
            c_lok = smem[4].astype(U32)
            c_cnt = smem[5].astype(U32)
            c_val = smem[6] == 1
            use_c = ~v & c_val
            ph = jnp.where(use_c, c_hi, ph)
            pk = jnp.where(use_c, c_lok, pk)
            pc = jnp.where(use_c, c_cnt, pc)
            v = v | use_c

            ans = jnp.where(
                is_q & v & (kh == ph) & (klo_key == pk), pc, jnp.uint32(0))

            # consumption: queries advance J; spec and sentinels advance I
            red = jnp.where(is_q, jnp.uint32(1), jnp.uint32(0))
            dd = 1
            while dd < T:
                red = red + _shift_up(red, dd, np.uint32(0))
                dd *= 2
            j_cons = red[0, 0].astype(jnp.int32)
            i_cons = jnp.int32(T) - j_cons

            # compact the query answers (stable rank + log shifts)
            keep = is_q
            ec = jnp.where(keep, ans, sent)
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
            b = 0
            while (1 << b) < T:
                dd2 = 1 << b
                mb = ((move >> b) & 1) == 1
                src_c = _shift_up(ec, dd2, FULL)
                src_m = _shift_up(move, dd2, np.uint32(0))
                src_a = _shift_up((alive & mb).astype(U32), dd2,
                                  np.uint32(0)) == 1
                vac = alive & mb
                ec = jnp.where(src_a, src_c, jnp.where(vac, sent, ec))
                move = jnp.where(src_a, src_m,
                                 jnp.where(vac, jnp.uint32(0), move))
                alive = src_a | (alive & ~vac)
                b += 1

            # stage the output window: [prev tail | emitted], rolled to the
            # unaligned output offset (merge_pallas output discipline)
            out0 = (OUT_ABS // A32) * A32
            frac_out = OUT_ABS - out0
            padc = jnp.full((Ar, LANES), sent, U32)
            sc = jnp.concatenate([ec, padc], axis=0)
            (sc,) = _roll_shift_down((sc,), frac_out)
            idxW = _flat_idx(Wr)
            keep_prev = idxW < frac_out
            tc = jnp.concatenate(
                [tail_c[:, :], jnp.full((Wr - Ar, LANES), sent, U32)],
                axis=0)
            woc[:, :] = jnp.where(keep_prev, tc, sc)

            cp_o = pltpu.make_async_copy(
                woc, oc_ref.at[pl.ds(out0 // LN32, Wr)],
                sem_out)
            cp_o.start()

            new_out_abs = OUT_ABS + n_emit
            new_out0 = (new_out_abs // A32) * A32
            roff = (new_out0 - out0) // LN32
            cp_o.wait()
            tail_c[:, :] = woc[pl.ds(roff, Ar), :]

            # carry out: accumulated last-spec at position T-1
            last_r = Tr - 1
            smem[0] = I + i_cons
            smem[1] = J + j_cons
            smem[2] = new_out_abs
            smem[3] = ph[last_r, LANES - 1].astype(jnp.int32)
            smem[4] = pk[last_r, LANES - 1].astype(jnp.int32)
            smem[5] = pc[last_r, LANES - 1].astype(jnp.int32)
            smem[6] = v.astype(U32)[last_r, LANES - 1].astype(jnp.int32)

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
    jax.jit, static_argnames=("key_bits", "window", "align"))
def count_join_planes(sh, sl, qh, ql, key_bits: int,
                      window: int = DEF_WINDOW, align: int = DEF_ALIGN):
    """Counts for sorted queries against a sorted spectrum.

    sh/sl: u32[C_pad] spectrum planes (merge_pallas kernel packing),
      key-sorted, SENTINEL padded; C_pad multiple of `align`, >= window.
    qh/ql: u32[Q_pad] QUERY planes (key << KSHIFT | QMARK), key-sorted,
      SENTINEL padded likewise.
    Returns counts u32[OUT_pad]: entry i answers the i-th (sorted) query;
    the tail beyond the real query count is garbage.
    """
    L, A = window, align
    T = L - A
    C_pad, Q_pad = sh.shape[0], qh.shape[0]
    assert C_pad % A == 0 and Q_pad % A == 0
    assert C_pad >= L and Q_pad >= L
    total = C_pad + Q_pad
    G = -(-total // T) + 1
    # output holds only query answers: Q_pad + one window of slack
    OUT_pad = ((Q_pad + T + A) // A + 1) * A

    kshift = 64 - key_bits
    cbits = min(kshift, 32) - 1

    kernel = _make_kernel(C_pad, Q_pad, OUT_pad, L, A, T, G, cbits)

    oc, meta = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((OUT_pad // LANES, LANES), U32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM(_shape2d(L), U32),  # vsh
            pltpu.VMEM(_shape2d(L), U32),  # vsl
            pltpu.VMEM(_shape2d(L), U32),  # vqh
            pltpu.VMEM(_shape2d(L), U32),  # vql
            pltpu.VMEM(_shape2d(T + A), U32),  # woc
            pltpu.VMEM(_shape2d(A), U32),  # tail_c
            pltpu.VMEM((8, LANES), jnp.int32),  # vmeta
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sh.reshape(-1, LANES), sl.reshape(-1, LANES),
      qh.reshape(-1, LANES), ql.reshape(-1, LANES))

    return oc.reshape(-1)
