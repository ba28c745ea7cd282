"""Packed k-mer representation on device: (hi, lo) uint64 pairs.

K-mers (k <= 63) are 2-bit packed MSB-first into a 128-bit value held as two
uint64 lanes, left-aligned at bit 127 so that integer comparison of
(hi, lo) equals lexicographic comparison of the base strings (same
convention as utils.dna.pack_kmer).  The Contiger stage uses these as node
identities for the de Bruijn graph — the TPU replacement for the
reference's DNAString keys in its concurrent hash map
(core/unitig_graph.h:85-97).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_U64 = jnp.uint64
_ONE = jnp.uint64(1)
_ZERO = jnp.uint64(0)


@functools.partial(jax.jit, static_argnames=("k",))
def pack_windows(codes: jax.Array, k: int):
    """Pack every k-window of a (B, L) code batch -> (hi, lo) uint64[B, W].

    Rolling form: pack(i+1) = (pack(i) << 2) | code[i+k], masked to 2k bits,
    computed as a lax.scan along the read axis (L steps of cheap vector ops;
    the batch dimension rides the VPU lanes).  Windows containing non-ACGT
    codes are NOT flagged here — mask with validity upstream.
    """
    B, L = codes.shape
    W = L - k + 1
    c64 = codes.astype(_U64) & _U64(3)

    # state: (hi, lo) packed value of the last k codes, right-aligned.
    def step(state, col):
        hi, lo = state
        hi = (hi << _U64(2)) | (lo >> _U64(62))
        lo = (lo << _U64(2)) | col
        return (hi, lo), (hi, lo)

    init = (jnp.zeros((B,), _U64), jnp.zeros((B,), _U64))
    _, (his, los) = jax.lax.scan(step, init, jnp.moveaxis(c64, 1, 0))
    # his/los: [L, B]; window i complete at column i+k-1.
    hi = jnp.moveaxis(his[k - 1 :], 0, 1)  # [B, W] right-aligned 2k bits
    lo = jnp.moveaxis(los[k - 1 :], 0, 1)
    return _left_align(hi, lo, k)


def _left_align(hi: jax.Array, lo: jax.Array, k: int):
    """Shift a right-aligned 2k-bit (hi, lo) pair to be left-aligned at bit 127,
    masking off stale bits above 2k."""
    bits = 2 * k
    if bits <= 64:
        sh = _U64(64 - bits)
        mask_lo = _U64((1 << bits) - 1)
        return (lo & mask_lo) << sh, jnp.zeros_like(lo)
    sh = 128 - bits  # 0..62
    mask_hi = _U64((1 << (bits - 64)) - 1)
    hi = hi & mask_hi
    if sh == 0:
        return hi, lo
    s = _U64(sh)
    out_hi = (hi << s) | (lo >> _U64(64 - sh))
    out_lo = lo << s
    return out_hi, out_lo


def _rev2_word(x: jax.Array) -> jax.Array:
    """Reverse the 32 2-bit groups of a uint64 (butterfly swaps)."""
    m2 = _U64(0x3333333333333333)
    m4 = _U64(0x0F0F0F0F0F0F0F0F)
    m8 = _U64(0x00FF00FF00FF00FF)
    m16 = _U64(0x0000FFFF0000FFFF)
    x = ((x >> _U64(2)) & m2) | ((x & m2) << _U64(2))
    x = ((x >> _U64(4)) & m4) | ((x & m4) << _U64(4))
    x = ((x >> _U64(8)) & m8) | ((x & m8) << _U64(8))
    x = ((x >> _U64(16)) & m16) | ((x & m16) << _U64(16))
    x = (x >> _U64(32)) | (x << _U64(32))
    return x


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_packed(hi: jax.Array, lo: jax.Array, k: int):
    """Reverse complement of left-aligned packed k-mers (A<->T, C<->G =
    2-bit complement ~code, groups reversed).

    Complement + full 128-bit group reversal leaves the k-mer right-aligned
    (garbage from the complemented empty region lands in the top bits); a
    left shift by 128-2k restores left alignment and flushes the garbage.
    """
    bits = 2 * k
    rhi, rlo = _rev2_word(~lo), _rev2_word(~hi)
    sh = 128 - bits
    if sh == 0:
        return rhi, rlo
    if sh < 64:
        s = _U64(sh)
        return (rhi << s) | (rlo >> _U64(64 - sh)), rlo << s
    if sh == 64:
        return rlo, jnp.zeros_like(rlo)
    return rlo << _U64(sh - 64), jnp.zeros_like(rlo)


def canonicalize(hi, lo, rhi, rlo):
    """min((hi,lo), (rhi,rlo)) lexicographic + orientation flag (True = rc)."""
    flip = (rhi < hi) | ((rhi == hi) & (rlo < lo))
    return (
        jnp.where(flip, rhi, hi),
        jnp.where(flip, rlo, lo),
        flip,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def shift_in_base(hi: jax.Array, lo: jax.Array, base, k: int):
    """Successor k-mer: drop the first base, append `base` (left-aligned)."""
    bits = 2 * k
    b = jnp.asarray(base).astype(_U64) & _U64(3)
    nhi = (hi << _U64(2)) | (lo >> _U64(62))
    nlo = lo << _U64(2)
    # write the new base at bit position 128 - bits .. +2
    if bits <= 64:
        nhi = nhi | (b << _U64(64 - bits))
    else:
        nlo = nlo | (b << _U64(128 - bits))
    return nhi, nlo


def replace_first_base(hi: jax.Array, lo: jax.Array, base, k: int):
    """Sibling k-mer: replace base 0 (bits 126..127 of hi, left-aligned).

    Siblings share a junction (same k-1 suffix); the reference spawns them
    as before-candidates at branch points (contig_assembly.cpp:3140-3165).
    """
    b = jnp.asarray(base).astype(_U64) & _U64(3)
    return (hi & _U64(0x3FFFFFFFFFFFFFFF)) | (b << _U64(62)), lo


@functools.partial(jax.jit, static_argnames=("k",))
def first_base(hi: jax.Array, lo: jax.Array, k: int):
    return (hi >> _U64(62)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k",))
def last_base(hi: jax.Array, lo: jax.Array, k: int):
    bits = 2 * k
    if bits <= 64:
        return ((hi >> _U64(64 - bits)) & _U64(3)).astype(jnp.uint8)
    return ((lo >> _U64(128 - bits)) & _U64(3)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("j", "k"))
def base_at(hi: jax.Array, lo: jax.Array, j: int, k: int):
    """Base code at position j (0 = leftmost)."""
    bitpos = 126 - 2 * j  # bit offset of the 2-bit group within 128
    if bitpos >= 64:
        return ((hi >> _U64(bitpos - 64)) & _U64(3)).astype(jnp.uint8)
    return ((lo >> _U64(bitpos)) & _U64(3)).astype(jnp.uint8)


def join2(table_hi: jax.Array, table_lo: jax.Array,
          qhi: jax.Array, qlo: jax.Array) -> jax.Array:
    """Exact-match join of 128-bit queries against a (hi, lo) key table.

    Returns int32 per query: the table index holding the identical pair,
    or -1.  Table keys must be distinct; table order is irrelevant.

    Sort-join formulation: binary search (searchsorted2) costs
    2*log2(N) random gathers per query — ~100x the per-element cost of a
    streaming sort pass on TPU.  Here one 3-key sort groups each query
    with its table row, a cummax propagates the row index through the
    run, and one u64 sort restores query order.
    """
    N = table_hi.shape[0]
    Q = qhi.shape[0]
    B = max(N.bit_length() + 1, 2)  # bits for (match index + 1)
    assert (Q + N).bit_length() + B <= 63, "join2 packing overflow"
    # payloads must stay below the tag bit (derived, not hardcoded, so a
    # huge query batch against a small table fails loudly instead of
    # bleeding into the tag)
    shift = max(max(N, Q).bit_length(), 1)
    assert shift <= 62, "join2 payload overflow"

    tag_t = jnp.zeros((N,), jnp.uint64)
    tag_q = jnp.ones((Q,), jnp.uint64)
    pay_t = jnp.arange(N, dtype=jnp.uint64)
    pay_q = jnp.arange(Q, dtype=jnp.uint64)
    SHIFT = jnp.uint64(shift)
    ordv = jnp.concatenate([(tag_t << SHIFT) | pay_t,
                            (tag_q << SHIFT) | pay_q])
    h = jnp.concatenate([table_hi, qhi])
    l = jnp.concatenate([table_lo, qlo])
    from . import spectrum as _sp
    sh, sl, so = _sp.xsort((h, l, ordv), num_keys=3)

    is_node = (so >> SHIFT) == 0
    payload = so & ((jnp.uint64(1) << SHIFT) - jnp.uint64(1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
    run_id = jnp.cumsum(first.astype(jnp.uint64))
    val = jnp.where(is_node, payload + jnp.uint64(1), jnp.uint64(0))
    g = (run_id << jnp.uint64(B)) | val
    F = jax.lax.cummax(g)
    match = (F & ((jnp.uint64(1) << jnp.uint64(B)) - jnp.uint64(1)))

    # restore query order: pack (query id, match+1) and sort
    out = jnp.where(
        is_node,
        jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (payload << jnp.uint64(B)) | match)
    from . import spectrum as _sp
    back = _sp.xsort(out)[:Q]
    m = (back & ((jnp.uint64(1) << jnp.uint64(B)) - jnp.uint64(1))).astype(jnp.int32)
    return m - 1


def searchsorted2(sorted_hi: jax.Array, sorted_lo: jax.Array,
                  qhi: jax.Array, qlo: jax.Array) -> jax.Array:
    """Binary search for 128-bit keys given as sorted (hi, lo) arrays.

    Returns leftmost insertion positions, like jnp.searchsorted(side='left').
    """
    n = sorted_hi.shape[0]
    steps = max(n.bit_length(), 1)
    lo_b = jnp.zeros(qhi.shape, jnp.int32)
    hi_b = jnp.full(qhi.shape, n, jnp.int32)

    def body(_, state):
        lo_b, hi_b = state
        mid = jnp.minimum((lo_b + hi_b) >> 1, n - 1)
        mh = sorted_hi[mid]
        ml = sorted_lo[mid]
        active = lo_b < hi_b
        less = ((mh < qhi) | ((mh == qhi) & (ml < qlo))) & active
        return (
            jnp.where(less, mid + 1, lo_b),
            jnp.where(less | ~active, hi_b, mid),
        )

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b
