"""Streaming merge-dedup-compact Pallas kernel — the counting hot op.

This is the TPU-native replacement for the two full-array ``lax.sort`` calls
in :func:`sh_assembly_tpu.ops.spectrum.merge` (which themselves replace the
reference's per-key ``insert1_advance`` slot-shifting hot loop,
/root/reference/cqf/gqf.c:1614-1916).  The spectrum's main store is already
sorted and the incoming buffer is sorted once in XLA; folding the two
together is a *merge*, not a sort — an O(n) streaming problem that XLA can
only express as an O(n log^2 n) bitonic sort over the concatenation.

The kernel streams both sorted sequences through VMEM with a sequential
grid, carrying (consumed-main, consumed-buf, output-offset, open-run) state
across grid steps in SMEM:

  per block:  DMA W-element windows of main and buf into VMEM
              -> bitonic *merge* network (log 2W compare-exchange stages,
                 all VPU shuffles) of the two sorted windows
              -> consume the first T = W - A elements: segmented-scan
                 run totals (duplicate keys sum their counts, traveled
                 bits OR), last-of-run emission, optional singleton drop
                 (the deNoise sweep, semantics of qf_clean_singleton,
                 /root/reference/cqf/gqf.c:2792-2876)
              -> provably collision-free LSB-first log-shift compaction
              -> one DMA of the compacted entries at the running output
                 offset (A-aligned; the unaligned tail is carried in VMEM
                 and re-written by the next block)

All offsets are kept A-aligned because Mosaic DMAs require lane-row-aligned
slices; each side's window over-reads at most A stale elements per block
(masked to SENTINEL in VMEM), a ~3% bandwidth tax.

Element encoding (two u32 planes, "kernel packing"):

  packed64 = key << KSHIFT | traveled << CBITS | min(count, cap)
  hi = packed64 >> 32, lo = packed64 & 0xffffffff
  KSHIFT = 64 - key_bits   (key occupies the top key_bits)
  CBITS  = min(KSHIFT, 32) - 1 (count field; traveled bit sits above it)

so lexicographic (hi, lo) order == key order, the hi plane is pure key
bits, and the payload never straddles the 32-bit boundary.  SENTINEL is
hi = lo = 0xffffffff (count caps keep any real entry strictly below it).

Buffered occurrences arrive with a ZERO count field (the count-0
convention, ops/spectrum module docstring): a buf entry sorts strictly
before the same key's main entry (main counts are >= 1), so the merge
network needs no source-tag plane — "from the buffer" is derived after the
merge as count==0, and the effective count of such an entry is 1.
Consumption accounting attributes SENTINEL padding to the main side; that
is safe because a sentinel is only ever consumed after every real element
of both current windows (sentinels sort last), at which point both side
pointers may advance into their padding freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
FULL = 0xFFFFFFFF

# Default geometry (per-side VMEM window / alignment quantum, in elements).
LANES = 128
DEF_WINDOW = 1 << 15  # L: elements DMA'd per side per block
DEF_ALIGN = 1 << 10  # A: offset alignment; also per-block re-read bound


def _shape2d(n):
    assert n % LANES == 0, n
    return (n // LANES, LANES)


def _flat_idx(rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + c


def _shift_up(x, d, fill):
    """y[i] = x[i+d] on the flattened (rows, 128) array; tail gets `fill`.

    d must be either a multiple of 128 or < 128 (all bitonic/scan stage
    distances are powers of two, so this always holds).
    """
    rows = x.shape[0]
    f = jnp.full_like(x, fill)
    if d == 0:
        return x
    if d % LANES == 0:
        r = d // LANES
        if r >= rows:
            return f
        return jnp.concatenate([x[r:], f[:r]], axis=0)
    assert d < LANES
    nxt = jnp.concatenate([x[1:], f[:1]], axis=0)
    return jnp.concatenate([x[:, d:], nxt[:, :d]], axis=1)


def _shift_down(x, d, fill):
    """y[i] = x[i-d]; head gets `fill`."""
    rows = x.shape[0]
    f = jnp.full_like(x, fill)
    if d == 0:
        return x
    if d % LANES == 0:
        r = d // LANES
        if r >= rows:
            return f
        return jnp.concatenate([f[:r], x[:-r]], axis=0)
    assert d < LANES
    prv = jnp.concatenate([f[:1], x[:-1]], axis=0)
    return jnp.concatenate([prv[:, LANES - d:], x[:, : LANES - d]], axis=1)


def _reverse_flat(x):
    """Flat reverse of a (rows, 128) array via XOR butterflies (Mosaic has
    no `rev` lowering).  rows must be a power of two."""
    rows = x.shape[0]
    # lane reverse: index l -> l ^ 127, as 7 row-local circular swaps
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    for b in range(7):
        d = 1 << b
        fwd = jnp.concatenate([x[:, d:], x[:, :d]], axis=1)   # x[l+d]
        bwd = jnp.concatenate([x[:, LANES - d:], x[:, : LANES - d]], axis=1)
        x = jnp.where((lane & d) == 0, fwd, bwd)
    # row reverse: index s -> s ^ (rows-1), as log2(rows) flat swaps
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    b = 0
    while (1 << b) < rows:
        d = 1 << b
        fwd = _shift_up(x, d * LANES, 0)
        bwd = _shift_down(x, d * LANES, 0)
        x = jnp.where((row & d) == 0, fwd, bwd)
        b += 1
    return x


def _minu(a, b):
    """Unsigned minimum via select (arith.minui fails to legalize)."""
    return jnp.where(a < b, a, b)


def _le2(ah, al, bh, bl):
    """Lexicographic (hi, lo) <= — total order (ties need no break: equal
    (hi, lo) pairs are interchangeable under the count-0 convention)."""
    return (ah < bh) | ((ah == bh) & (al <= bl))


def _bitonic_merge(h, l, length):
    """Fully sort a bitonic (asc ++ desc) two-plane sequence of `length`.

    Standard bitonic merge network: log2(length) compare-exchange stages at
    distances length/2 .. 1, all implemented as flat shifts + selects.
    """
    rows = h.shape[0]
    idx = _flat_idx(rows)
    d = length // 2
    while d >= 1:
        yh = _shift_up(h, d, FULL)
        yl = _shift_up(l, d, FULL)
        le = _le2(h, l, yh, yl)
        mnh = jnp.where(le, h, yh)
        mnl = jnp.where(le, l, yl)
        mxh = jnp.where(le, yh, h)
        mxl = jnp.where(le, yl, l)
        lower = (idx & d) == 0
        h = jnp.where(lower, mnh, _shift_down(mxh, d, FULL))
        l = jnp.where(lower, mnl, _shift_down(mxl, d, FULL))
        d //= 2
    return h, l


def _roll_shift_up(planes, amount, fill):
    """Flat shift-up (y[i] = x[i+amount], tail filled) by a TRACED amount,
    via two dynamic circular rolls + a lane select (pltpu.roll lowers to
    the native dynamic-rotate; ~6 ops vs ~45 for the old conditional
    static-shift ladder)."""
    rows = planes[0].shape[0]
    r = amount // jnp.int32(LANES)
    c = amount % jnp.int32(LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = _flat_idx(rows)
    keep = flat < (jnp.int32(rows * LANES) - amount)
    out = []
    for p in planes:
        u = pltpu.roll(pltpu.roll(p, -r, 0), -c, 1)
        v = pltpu.roll(pltpu.roll(p, -(r + 1), 0), -c, 1)
        y = jnp.where(lane < jnp.int32(LANES) - c, u, v)
        out.append(jnp.where(keep, y, jnp.full_like(p, fill)))
    return out


def _roll_shift_down(planes, amount):
    """Flat shift-down (y[i] = x[i-amount]) by a traced amount.  The head
    (i < amount) receives circularly wrapped TAIL elements — callers must
    either overwrite or guarantee the source tail is padding."""
    rows = planes[0].shape[0]
    r = amount // jnp.int32(LANES)
    c = amount % jnp.int32(LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    out = []
    for p in planes:
        u = pltpu.roll(pltpu.roll(p, r, 0), c, 1)
        v = pltpu.roll(pltpu.roll(p, r + 1, 0), c, 1)
        out.append(jnp.where(lane >= c, u, v))
    return out


def _make_kernel(C_pad, BC_pad, OUT_pad, L, A, T, G, cbits, cap,
                 drop_singletons):
    """Build the kernel body with all geometry static."""
    Tr = T // LANES  # rows in the consumed prefix
    Lr = L // LANES
    Ar = A // LANES
    Wr = Tr + Ar  # rows in the output staging window
    cmask = np.uint32((1 << cbits) - 1)
    # keylo_mask: bits of `lo` that belong to the key (above trav|count).
    keylo_mask = (np.uint32(0) if cbits + 1 >= 32
                  else np.uint32(FULL ^ ((1 << (cbits + 1)) - 1)))
    trav_bit = np.uint32(1 << cbits)

    def kernel(mh_ref, ml_ref, bh_ref, bl_ref,  # ANY (HBM) inputs
               oh_ref, ol_ref, meta_ref,  # ANY outputs
               # scratch:
               vmh, vml, vbh, vbl,  # [Lr,128] input windows
               woh, wol,  # [Wr,128] output staging
               tail_h, tail_l,  # [Ar,128] preserved written tail
               vmeta,  # [8,128] i32 meta staging
               smem,  # [12] int32 carries
               sem_in, sem_out, sem_meta):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            smem[0] = 0  # I: consumed from main (absolute)
            smem[1] = 0  # J: consumed from buf
            smem[2] = 0  # OUT_ABS: emitted total
            smem[3] = jnp.int32(-1)  # carry hi (u32 bits; -1 = all ones)
            smem[4] = jnp.int32(-1)  # carry lo key part
            smem[5] = 0  # carry count
            smem[6] = 0  # carry trav
            smem[7] = 1  # carry is-sent
            smem[8] = 0  # total nelts folded (diagnostic)
            smem[9] = 0  # singleton runs dropped (drop_singletons only)

        I = smem[0]
        J = smem[1]
        OUT_ABS = smem[2]

        # All scalar arithmetic sticks to int32 constants: under
        # jax_enable_x64 a bare python literal in // or where() becomes an
        # int64 constant, which Mosaic cannot lower.
        A32 = jnp.int32(A)
        LN32 = jnp.int32(LANES)
        i0 = jnp.minimum((I // A32) * A32, jnp.int32(C_pad - L))
        j0 = jnp.minimum((J // A32) * A32, jnp.int32(BC_pad - L))
        frac_i = I - i0
        frac_j = J - j0

        cp_m_h = pltpu.make_async_copy(
            mh_ref.at[pl.ds(i0 // LN32, Lr)], vmh, sem_in.at[jnp.int32(0)])
        cp_m_l = pltpu.make_async_copy(
            ml_ref.at[pl.ds(i0 // LN32, Lr)], vml, sem_in.at[jnp.int32(1)])
        cp_b_h = pltpu.make_async_copy(
            bh_ref.at[pl.ds(j0 // LN32, Lr)], vbh, sem_in.at[jnp.int32(2)])
        cp_b_l = pltpu.make_async_copy(
            bl_ref.at[pl.ds(j0 // LN32, Lr)], vbl, sem_in.at[jnp.int32(3)])
        cp_m_h.start(); cp_m_l.start(); cp_b_h.start(); cp_b_l.start()
        cp_m_h.wait(); cp_m_l.wait(); cp_b_h.wait(); cp_b_l.wait()

        sent = jnp.uint32(FULL)
        # Shift the consumed (or clamp-stale) prefix out of each window so
        # the windows stay ascending (SENTINEL fills the tail).  frac can
        # exceed L-1 only at stream end under DMA clamping -> whole window
        # is stale: select all-SENTINEL.
        fi = jnp.minimum(frac_i, jnp.int32(L - 1))
        fj = jnp.minimum(frac_j, jnp.int32(L - 1))
        ah, al = _roll_shift_up((vmh[:, :], vml[:, :]), fi, FULL)
        bh, bl = _roll_shift_up((vbh[:, :], vbl[:, :]), fj, FULL)
        stale_i = frac_i >= jnp.int32(L)
        stale_j = frac_j >= jnp.int32(L)
        ah = jnp.where(stale_i, sent, ah)
        al = jnp.where(stale_i, sent, al)
        bh = jnp.where(stale_j, sent, bh)
        bl = jnp.where(stale_j, sent, bl)
        # Whole-block skip: once both shifted windows open on SENTINEL
        # (streams exhausted up to padding) and the carry is spent, the
        # block can only shuffle sentinels -- advance the consumed total
        # and do nothing.  This makes merge cost scale with LIVE elements,
        # not capacity (a 55%-full store skips ~45% of its blocks).
        c_sent0 = smem[7]
        blk_skip = (ah[0, 0] == sent) & (al[0, 0] == sent) & \
            (bh[0, 0] == sent) & (bl[0, 0] == sent) & (c_sent0 == 1)

        @pl.when(blk_skip)
        def _():
            smem[1] = J + jnp.int32(T)

        @pl.when(~blk_skip)
        def _():
            # reverse the buf window (flat) to form a bitonic sequence; no
            # source-tag plane: buf entries carry count==0 (< any main
            # count), so equal (hi, lo) pairs are interchangeable and the
            # source is derived after the merge
            rh = _reverse_flat(bh)
            rl = _reverse_flat(bl)
            ch = jnp.concatenate([ah, rh], axis=0)
            cl = jnp.concatenate([al, rl], axis=0)
            ch, cl = _bitonic_merge(ch, cl, 2 * L)

            # consume the first T merged elements
            kh = ch[:Tr]
            kl = cl[:Tr]

            is_sent = (kh == sent) & (kl == sent)
            cnt_raw = jnp.where(is_sent, jnp.uint32(0), kl & cmask)
            is_buf = (~is_sent) & (cnt_raw == jnp.uint32(0))
            # effective count: count-0 entries are single buffered occurrences
            cnt = cnt_raw + is_buf.astype(U32)
            trv = jnp.where(is_sent, jnp.uint32(0), (kl & trav_bit) >> cbits)
            klo_key = kl & keylo_mask

            # run boundaries (key change or sent-flag change vs predecessor)
            ph = _shift_down(kh, 1, FULL)
            pl_key = _shift_down(klo_key, 1, np.uint32(keylo_mask))
            ps = _shift_down(is_sent.astype(U32), 1, np.uint32(1))
            idxT = _flat_idx(Tr)
            same = (kh == ph) & (klo_key == pl_key) & (is_sent.astype(U32) == ps)
            # position 0 compares against the carried run
            c_hi = smem[3].astype(U32)
            c_lok = smem[4].astype(U32)
            c_cnt = smem[5].astype(U32)
            c_trv = smem[6].astype(U32)
            c_sent = smem[7].astype(U32)
            same0 = (kh == c_hi) & (klo_key == c_lok) & \
                (is_sent.astype(U32) == c_sent)
            # (bool-valued select lowers through an unsupported i8->i1 trunc in
            # Mosaic; use logical ops instead of jnp.where)
            at0 = idxT == 0
            same = (at0 & same0) | (~at0 & same)
            first = ~same

            # fused segmented scans: run totals (sum), traveled (or).  The
            # stop flag doubles as the prefix-OR of `first` after the loop.
            tot = cnt
            sor = trv
            flag = first
            d = 1
            while d < T:
                valid = idxT >= d
                f2 = _shift_down(flag.astype(U32), d, np.uint32(1)) == 1
                t2 = _shift_down(tot, d, np.uint32(0))
                s2 = _shift_down(sor, d, np.uint32(0))
                use = valid & ~flag
                tot = jnp.where(use, tot + t2, tot)
                sor = jnp.where(use, sor | s2, sor)
                flag = flag | (valid & f2)
                d *= 2
            # main-side consumption: tree-fold reduction; sentinels count
            # as main (safe: a sentinel is only consumed once both windows'
            # real elements are — see module docstring); jnp.sum lowers via
            # int64 under x64 -> hand-rolled fold
            red = jnp.where(~is_buf, jnp.uint32(1), jnp.uint32(0))
            dd = 1
            while dd < T:  # red[i] becomes sum over x[i .. i+2^k-1]
                red = red + _shift_up(red, dd, np.uint32(0))
                dd *= 2
            i_cons = red[0, 0].astype(jnp.int32)
            j_cons = jnp.int32(T) - i_cons
            # fold the carried run into run 0 (only exists when same0 held);
            # in run 0 <=> no run boundary at or before this position
            in_run0 = ~flag
            tot = jnp.where(in_run0, _minu(tot + c_cnt, jnp.uint32(cap)),
                            _minu(tot, jnp.uint32(cap)))
            sor = jnp.where(in_run0, sor | c_trv, sor)

            # emission: last element of each run, except the trailing open run
            nxt_first = _shift_up(first.astype(U32), 1, np.uint32(0)) == 1
            keep = nxt_first & ~is_sent
            if drop_singletons:
                keep = keep & (tot >= 2)
                # count the dropped runs (each removed key had exactly one
                # occurrence) so callers can keep reference nelts bookkeeping
                # (qf_clean_singleton_with_lock decrements nelts by
                # removed_elts, CQF_mt.h:1037-1038)
                dr = (nxt_first & ~is_sent & (tot < 2)).astype(U32)
                d = 1
                while d < T:
                    valid = idxT >= d
                    dr = jnp.where(valid, dr + _shift_down(dr, d, np.uint32(0)),
                                   dr)
                    d *= 2
                n_drop_blk = dr[Tr - 1, LANES - 1].astype(jnp.int32)

            # carry-out = the open run at T-1 (aggregated), via static reads
            last_r = Tr - 1
            co_hi = kh[last_r, LANES - 1]
            co_lok = klo_key[last_r, LANES - 1]
            co_cnt = tot[last_r, LANES - 1]
            co_trv = sor[last_r, LANES - 1]
            co_sent = is_sent.astype(U32)[last_r, LANES - 1]

            # disconnected carry-in must be emitted as its own entry
            # (bool scalars can't be extracted from vectors in Mosaic — cast)
            first0 = first.astype(U32)[0, 0] == 1
            demit = first0 & (c_sent == 0) & \
                ((c_cnt >= 2) if drop_singletons else (c_cnt >= 1))
            if drop_singletons:
                drop_carry = (first0 & (c_sent == 0) & (c_cnt < 2)) \
                    .astype(jnp.int32)
                new_dropped = smem[9] + n_drop_blk + drop_carry
                smem[9] = new_dropped
            else:
                new_dropped = jnp.int32(0)

            # pack emitted entries
            eh = jnp.where(keep, kh, sent)
            el = jnp.where(
                keep,
                klo_key | (sor << cbits) | _minu(tot, jnp.uint32(cap)),
                sent)

            # stable compaction: rank among keeps, LSB-first log shifts
            rnk = keep.astype(U32)
            d = 1
            while d < T:
                valid = idxT >= d
                r2 = _shift_down(rnk, d, np.uint32(0))
                rnk = jnp.where(valid, rnk + r2, rnk)
                d *= 2
            n_emit = rnk[last_r, LANES - 1].astype(jnp.int32)
            move = jnp.where(keep, idxT.astype(U32) - (rnk - 1), jnp.uint32(0))
            alive = keep
            b = 0
            while (1 << b) < T:
                dd = 1 << b
                mb = ((move >> b) & 1) == 1
                src_h = _shift_up(eh, dd, FULL)
                src_l = _shift_up(el, dd, FULL)
                src_m = _shift_up(move, dd, np.uint32(0))
                src_a = _shift_up((alive & mb).astype(U32), dd, np.uint32(0)) == 1
                vac = alive & mb
                eh = jnp.where(src_a, src_h, jnp.where(vac, sent, eh))
                el = jnp.where(src_a, src_l, jnp.where(vac, sent, el))
                move = jnp.where(src_a, src_m, jnp.where(vac, jnp.uint32(0), move))
                alive = src_a | (alive & ~vac)
                b += 1

            # prepend the disconnected carry (it precedes everything in order)
            eh1 = _shift_down(eh, 1, FULL)
            el1 = _shift_down(el, 1, FULL)
            c_packed_l = c_lok | (c_trv << cbits) | _minu(c_cnt, jnp.uint32(cap))
            use_d = demit
            zero0 = idxT == 0
            eh = jnp.where(use_d, jnp.where(zero0, c_hi, eh1), eh)
            el = jnp.where(use_d, jnp.where(zero0, c_packed_l, el1), el)
            n_emit = n_emit + use_d.astype(jnp.int32)

            # stage the output window: [prev tail | emitted], rolled to the
            # unaligned output offset
            out0 = (OUT_ABS // A32) * A32
            frac_out = OUT_ABS - out0
            padh = jnp.full((Ar, LANES), sent, U32)
            sh = jnp.concatenate([eh, padh], axis=0)
            sl = jnp.concatenate([el, padh], axis=0)
            # circular roll-down: the head wrap pulls from the SENT pad
            # (frac_out < A = pad size) and is overwritten by keep_prev
            sh, sl = _roll_shift_down((sh, sl), frac_out)
            idxW = _flat_idx(Wr)
            keep_prev = idxW < frac_out
            th = jnp.concatenate(
                [tail_h[:, :], jnp.full((Wr - Ar, LANES), sent, U32)], axis=0)
            tl = jnp.concatenate(
                [tail_l[:, :], jnp.full((Wr - Ar, LANES), sent, U32)], axis=0)
            woh[:, :] = jnp.where(keep_prev, th, sh)
            wol[:, :] = jnp.where(keep_prev, tl, sl)

            cp_o_h = pltpu.make_async_copy(
                woh, oh_ref.at[pl.ds(out0 // LN32, Wr)], sem_out.at[jnp.int32(0)])
            cp_o_l = pltpu.make_async_copy(
                wol, ol_ref.at[pl.ds(out0 // LN32, Wr)], sem_out.at[jnp.int32(1)])
            cp_o_h.start(); cp_o_l.start()

            new_out_abs = OUT_ABS + n_emit
            new_out0 = (new_out_abs // A32) * A32
            # preserve the tail (last written A-block) for the next iteration
            roff = (new_out0 - out0) // LN32
            cp_o_h.wait(); cp_o_l.wait()
            tail_h[:, :] = woh[pl.ds(roff, Ar), :]
            tail_l[:, :] = wol[pl.ds(roff, Ar), :]

            smem[0] = I + i_cons
            smem[1] = J + j_cons
            smem[2] = new_out_abs
            smem[3] = co_hi.astype(jnp.int32)
            smem[4] = co_lok.astype(jnp.int32)
            smem[5] = co_cnt.astype(jnp.int32)
            smem[6] = co_trv.astype(jnp.int32)
            smem[7] = co_sent.astype(jnp.int32)

        @pl.when(g == G - 1)
        def _():
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            vmeta[:, :] = jnp.where(
                (r8 == 0) & (c8 == 0), smem[2],
                jnp.where((r8 == 0) & (c8 == 1), smem[9], jnp.int32(0)))
            cp_meta = pltpu.make_async_copy(vmeta, meta_ref, sem_meta)
            cp_meta.start()
            cp_meta.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("key_bits", "drop_singletons", "window", "align"),
)
def merge_planes(mh, ml, bh, bl, key_bits: int,
                 drop_singletons: bool = False,
                 window: int = DEF_WINDOW, align: int = DEF_ALIGN):
    """Merge kernel entry on pre-packed planes.

    mh/ml: u32[C_pad] main planes, key-sorted, SENTINEL padded, C_pad
      multiple of `align` and >= window + align.
    bh/bl: u32[BC_pad] buf planes, key-sorted, SENTINEL padded likewise.
    Returns (out_hi, out_lo, n_live, n_dropped) with out length
    C_pad + BC_pad (live prefix of n_live entries; tail is garbage — mask
    before use).  n_dropped counts singleton runs removed (0 unless
    drop_singletons).
    """
    L, A = window, align
    T = L - A
    C_pad, BC_pad = mh.shape[0], bh.shape[0]
    assert C_pad % A == 0 and BC_pad % A == 0
    assert C_pad >= L and BC_pad >= L
    total = C_pad + BC_pad
    G = -(-total // T) + 1
    OUT_pad = ((total + T + A) // A + 1) * A

    kshift = 64 - key_bits
    cbits = min(kshift, 32) - 1
    cap = min((1 << cbits) - 2, (1 << 30))

    kernel = _make_kernel(C_pad, BC_pad, OUT_pad, L, A, T, G, cbits, cap,
                          bool(drop_singletons))

    oh, ol, meta = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((OUT_pad // LANES, LANES), U32),
            jax.ShapeDtypeStruct((OUT_pad // LANES, LANES), U32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM(_shape2d(L), U32),  # vmh
            pltpu.VMEM(_shape2d(L), U32),  # vml
            pltpu.VMEM(_shape2d(L), U32),  # vbh
            pltpu.VMEM(_shape2d(L), U32),  # vbl
            pltpu.VMEM(_shape2d(T + A), U32),  # woh
            pltpu.VMEM(_shape2d(T + A), U32),  # wol
            pltpu.VMEM(_shape2d(A), U32),  # tail_h
            pltpu.VMEM(_shape2d(A), U32),  # tail_l
            pltpu.VMEM((8, LANES), jnp.int32),  # vmeta
            pltpu.SMEM((12,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mh.reshape(-1, LANES), ml.reshape(-1, LANES),
      bh.reshape(-1, LANES), bl.reshape(-1, LANES))

    n_live = meta[0, 0]
    n_dropped = meta[0, 1]
    return oh.reshape(-1), ol.reshape(-1), n_live, n_dropped


# ---------------------------------------------------------------------------
# XLA-side packing helpers (kernel plane format <-> spectrum arrays)


def _pad_len(n, L, A):
    """Smallest padded length >= n + A that is a multiple of A and >= L."""
    m = ((n + A) + A - 1) // A * A
    return max(m, L)


def kernel_pack(keys, counts, trav, key_bits: int):
    """(u64 keys, i32 counts, u8 trav) -> (hi, lo) u32 kernel planes.

    SENTINEL keys map to the all-ones sentinel planes.
    """
    kshift = 64 - key_bits
    cbits = min(kshift, 32) - 1
    cap = min((1 << cbits) - 2, (1 << 30))
    sent64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    c = jnp.minimum(counts.astype(jnp.int64), cap).astype(jnp.uint64)
    t = trav.astype(jnp.uint64) << jnp.uint64(cbits)
    packed = (keys << jnp.uint64(kshift)) | t | c
    packed = jnp.where(keys == sent64, sent64, packed)
    hi = (packed >> jnp.uint64(32)).astype(U32)
    lo = (packed & jnp.uint64(FULL)).astype(U32)
    return hi, lo


def kernel_pack_buf(buf_keys, key_bits: int):
    """Raw buffer keys (u64, SENTINEL holes) -> packed count-0 u64 for a
    single XLA sort before the kernel (one buffered occurrence each; the
    kernel adds the implicit +1, see module docstring)."""
    kshift = 64 - key_bits
    sent64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    packed = buf_keys << jnp.uint64(kshift)
    return jnp.where(buf_keys == sent64, sent64, packed)


def kernel_unpack(hi, lo, n_live, key_bits: int):
    """Kernel planes -> (keys u64, counts i32, trav u8); entries at index
    >= n_live become SENTINEL/0."""
    kshift = 64 - key_bits
    cbits = min(kshift, 32) - 1
    sent64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    packed = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    n = hi.shape[0]
    live = jnp.arange(n, dtype=jnp.int32) < n_live.astype(jnp.int32)
    packed = jnp.where(live, packed, sent64)
    keys = packed >> jnp.uint64(kshift)
    keys = jnp.where(packed == sent64, sent64, keys)
    counts = (packed & jnp.uint64((1 << cbits) - 1)).astype(jnp.int32)
    trav = ((packed >> jnp.uint64(cbits)) & jnp.uint64(1)).astype(jnp.uint8)
    counts = jnp.where(packed == sent64, 0, counts)
    trav = jnp.where(packed == sent64, jnp.uint8(0), trav)
    return keys, counts, trav
