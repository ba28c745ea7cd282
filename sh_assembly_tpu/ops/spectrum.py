"""Sorted k-mer spectrum: the TPU-native counting structure.

This replaces the reference's counting quotient filter (cqf/gqf.c) with a
structure XLA can vectorize.  External semantics are identical to the CQF as
used by the pipeline — it maps ``key = min(fh, rh) mod range`` to an exact
count (two k-mers whose hashes collide mod range conflate, exactly like the
reference, cqf/CQF_mt.h:636-671) — but the layout is a flat sorted key array
instead of rank/select bitvector blocks:

  * main store: keys uint64[C] sorted ascending (dead slots = sentinel),
    counts int32[C], traveled uint8[C] (the GRAPH_TRAVERSE plane,
    gqf.c:3070-3165).
  * append buffer: unsorted (key, count=1) pairs for keys not yet in main.

A batch insert is: searchsorted into main -> scatter-add counts of existing
keys -> compact-append novel keys to the buffer.  When the buffer fills, a
merge kernel sorts main+buffer together and segment-reduces duplicate keys.
This two-level design is the lock-free analogue of the reference's per-thread
local QFs flushed into the shared filter (cqf/CQF_mt.h:588-607).

The deNoise sweep (qf_clean_singleton, gqf.c:2792-2876) becomes a trivially
vectorized compaction: at a sweep-merge, entries whose total count is 1 are
dropped.

All shapes are static; jit-compiled once per (C, BC, B) configuration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)


class Spectrum(NamedTuple):
    """Device-resident k-mer spectrum (a pytree; all leaves static-shaped)."""

    keys: jax.Array  # uint64[C] sorted; SENTINEL = empty
    counts: jax.Array  # int32[C]
    traveled: jax.Array  # uint8[C]; visited marks for the Contiger stage
    buf_keys: jax.Array  # uint64[BC] unsorted novel keys; SENTINEL = empty
    n_main: jax.Array  # int64[] live entries in main
    n_buf: jax.Array  # int64[] live entries in buffer
    ndistinct: jax.Array  # int64[] distinct keys (exact right after a merge)
    nelts: jax.Array  # int64[] total occurrences inserted

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def buf_capacity(self) -> int:
        return self.buf_keys.shape[0]


def make(capacity: int, buf_capacity: int) -> Spectrum:
    return Spectrum(
        keys=jnp.full((capacity,), SENTINEL, dtype=jnp.uint64),
        counts=jnp.zeros((capacity,), dtype=jnp.int32),
        traveled=jnp.zeros((capacity,), dtype=jnp.uint8),
        buf_keys=jnp.full((buf_capacity,), SENTINEL, dtype=jnp.uint64),
        n_main=jnp.zeros((), dtype=jnp.int64),
        n_buf=jnp.zeros((), dtype=jnp.int64),
        ndistinct=jnp.zeros((), dtype=jnp.int64),
        nelts=jnp.zeros((), dtype=jnp.int64),
    )


def _locate(sorted_keys: jax.Array, queries: jax.Array):
    """Binary-search queries in the sorted main array -> (pos, found)."""
    C = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, queries, side="left", method="scan_unrolled")
    pos = jnp.minimum(pos, C - 1)
    found = (sorted_keys[pos] == queries) & (queries != SENTINEL)
    return pos, found


@jax.jit
def insert(spec: Spectrum, keys: jax.Array) -> Spectrum:
    """Append a batch of canonical keys (SENTINEL entries are ignored).

    Log-structured design: occurrences are appended raw — NO random access
    on the insert path at all (random HBM gathers are ~100x more expensive
    than streaming/sort passes on TPU; see bench notes).  Duplicates
    collapse at the next sort-merge.  The caller guarantees buffer headroom
    >= len(keys) (see models/counter).

    ndistinct is exact only right after a merge (the reference tracks it
    per-insert via isNew, CQF_mt.h:640; ours advances at merge cadence —
    the deNoise trigger fires at the next merge after crossing, comparable
    to the reference's once-per-chunk check).
    """
    keys = keys.reshape(-1)
    B = keys.shape[0]
    n_valid = jnp.sum(keys != SENTINEL, dtype=jnp.int64)
    # The raw block is appended as-is, SENTINEL padding included — the
    # merge sorts padding to the tail anyway, and skipping the compaction
    # scatter keeps the hot path scatter-free (TPU scatters cost ~10-100x a
    # streaming write).  n_buf therefore advances by the full block size.
    buf_keys = jax.lax.dynamic_update_slice(
        spec.buf_keys, keys, (spec.n_buf.astype(jnp.int32),)
    )
    return spec._replace(
        buf_keys=buf_keys,
        n_buf=spec.n_buf + B,
        nelts=spec.nelts + n_valid,
    )


def payload_bits(key_bits: int) -> int:
    """Bits left for (traveled | count) when a key is packed high in a u64."""
    p = 64 - key_bits
    if p < 8:
        raise ValueError(f"key_bits {key_bits} leaves no payload room")
    return p


def count_cap(key_bits: int) -> int:
    """Saturation cap for packed counts.  -2 keeps a fully saturated payload
    strictly below all-ones so no real entry can collide with SENTINEL.
    Clamped to 2^30 so the XLA and Pallas merge paths saturate identically
    (and scans can accumulate in 32 bits without overflow)."""
    return min((1 << (payload_bits(key_bits) - 1)) - 2, 1 << 30)


def _pack(keys, counts, trav, key_bits: int):
    """(key, count, traveled) -> single u64: key | trav-bit | count.

    Multi-operand lax.sort is orders of magnitude slower than single-operand
    sort on TPU, so merges operate on this packed form.  Counts saturate at
    count_cap (far above any pipeline threshold; the reference's
    variable-length counters are unbounded, gqf.c:1218, but nothing
    downstream distinguishes counts beyond solid_abundance_max).
    """
    p = payload_bits(key_bits)
    cap = count_cap(key_bits)
    c = jnp.minimum(counts.astype(jnp.int64), cap).astype(jnp.uint64)
    t = trav.astype(jnp.uint64) << jnp.uint64(p - 1)
    return (keys << jnp.uint64(p)) | t | c


def _unpack(packed, key_bits: int):
    p = payload_bits(key_bits)
    keys = packed >> jnp.uint64(p)
    # re-expand SENTINEL slots to the full all-ones key
    keys = jnp.where(packed == SENTINEL, SENTINEL, keys)
    trav = ((packed >> jnp.uint64(p - 1)) & jnp.uint64(1)).astype(jnp.uint8)
    counts = (packed & jnp.uint64((1 << (p - 1)) - 1)).astype(jnp.int32)
    counts = jnp.where(packed == SENTINEL, 0, counts)
    trav = jnp.where(packed == SENTINEL, 0, trav)
    return keys, counts, trav


def _pallas_available() -> bool:
    """Use the streaming Pallas merge kernel on real TPU backends (the axon
    tunnel reports platform 'axon').  CPU runs — tests and the virtual-mesh
    dry runs — take the XLA sort path.  Override: SH_ASSEMBLY_NO_PALLAS=1."""
    import os

    if os.environ.get("SH_ASSEMBLY_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _merge_kernel_path(spec: Spectrum, key_bits: int,
                       drop_singletons: bool) -> Spectrum:
    """Merge via the streaming Pallas kernel (ops/merge_pallas): one XLA
    sort of the buffer + a single O(n) merge-dedup-compact pass, instead of
    two O(n log^2 n) sorts over main+buffer."""
    from . import merge_pallas as mp

    C, BC = spec.capacity, spec.buf_capacity
    L, A = mp.DEF_WINDOW, mp.DEF_ALIGN
    C_pad = mp._pad_len(C, L, A)
    BC_pad = mp._pad_len(BC, L, A)

    mh, ml = mp.kernel_pack(spec.keys, spec.counts, spec.traveled, key_bits)
    padm = jnp.full((C_pad - C,), jnp.uint32(0xFFFFFFFF))
    mh = jnp.concatenate([mh, padm])
    ml = jnp.concatenate([ml, padm])

    if key_bits <= 32:
        # u32 fast path: buf entries pack as hi = key << (kshift-32) with a
        # constant lo = 1, so the routing sort only needs the hi plane
        # (~35% cheaper than the u64 sort).  Hole-SENTINELs collide with a
        # max-key hi only when key_bits == 32; the sorted tail beyond
        # n_valid is the holes either way.
        kshift = 64 - key_bits
        full32 = jnp.uint32(0xFFFFFFFF)
        n_valid = jnp.sum(spec.buf_keys != SENTINEL, dtype=jnp.int32)
        k32 = jnp.where(
            spec.buf_keys == SENTINEL, full32,
            (spec.buf_keys << jnp.uint64(kshift - 32)).astype(jnp.uint32))
        bh = jax.lax.sort(k32)
        idxb = jnp.arange(BC, dtype=jnp.int32)
        bl = jnp.where(idxb < n_valid, jnp.uint32(1), full32)
    else:
        pb = jax.lax.sort(mp.kernel_pack_buf(spec.buf_keys, key_bits))
        bh = (pb >> jnp.uint64(32)).astype(jnp.uint32)
        bl = (pb & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    padb = jnp.full((BC_pad - BC,), jnp.uint32(0xFFFFFFFF))
    bh = jnp.concatenate([bh, padb])
    bl = jnp.concatenate([bl, padb])

    oh, ol, n_live = mp.merge_planes(mh, ml, bh, bl, key_bits,
                                     drop_singletons, window=L, align=A)
    keys, counts, trav = mp.kernel_unpack(oh[:C], ol[:C], n_live, key_bits)
    n = n_live.astype(jnp.int64)
    return Spectrum(
        keys=keys,
        counts=counts,
        traveled=trav,
        buf_keys=jnp.full((BC,), SENTINEL, dtype=jnp.uint64),
        n_main=n,
        n_buf=jnp.zeros((), jnp.int64),
        ndistinct=n,
        nelts=spec.nelts,
    )


@functools.partial(jax.jit, static_argnames=("key_bits", "drop_singletons"))
def merge(spec: Spectrum, key_bits: int, drop_singletons: bool = False) -> Spectrum:
    """Fold the buffer into main.

    On TPU this dispatches to the streaming Pallas merge kernel
    (ops/merge_pallas).  The XLA fallback uses two single-operand u64
    sorts + linear scans — no random access, no multi-operand sorts:

    sort #1 over packed (key|trav|count) groups duplicate keys with the
    max-traveled copy last in each run; an inclusive-cumsum/running-max
    scan yields exact run totals at the run's last slot; non-last slots are
    killed to SENTINEL and sort #2 compacts survivors.

    With drop_singletons=True this is the deNoise sweep: runs whose total
    is 1 are purged (semantics of qf_clean_singleton, gqf.c:2792-2876).
    """
    if _pallas_available():
        return _merge_kernel_path(spec, key_bits, drop_singletons)
    C, BC = spec.capacity, spec.buf_capacity
    main = _pack(spec.keys, spec.counts, spec.traveled, key_bits)
    main = jnp.where(spec.keys == SENTINEL, SENTINEL, main)
    buf = jnp.where(
        spec.buf_keys == SENTINEL,
        SENTINEL,
        (spec.buf_keys << jnp.uint64(payload_bits(key_bits))) | jnp.uint64(1),
    )
    packed = jax.lax.sort(jnp.concatenate([main, buf]))

    keys, counts, trav = _unpack(packed, key_bits)
    # exact run totals via cumsum + running-max of run-start prefixes
    S = jnp.cumsum(counts.astype(jnp.int64))
    first = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    U = jax.lax.cummax(jnp.where(first, S - counts, jnp.int64(-1)))
    totals = S - U
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])

    keep = last & (keys != SENTINEL)
    if drop_singletons:
        keep = keep & (totals >= 2)
    survivors = jnp.where(
        keep,
        _pack(keys, totals, trav, key_bits),
        SENTINEL,
    )
    packed2 = jax.lax.sort(survivors)[:C]
    out_keys, out_counts, out_trav = _unpack(packed2, key_bits)

    n_main = jnp.sum(keep, dtype=jnp.int64)
    return Spectrum(
        keys=out_keys,
        counts=out_counts,
        traveled=out_trav,
        buf_keys=jnp.full((BC,), SENTINEL, dtype=jnp.uint64),
        n_main=n_main,
        n_buf=jnp.zeros((), jnp.int64),
        ndistinct=n_main,
        nelts=spec.nelts,
    )


@functools.partial(jax.jit, static_argnames=("key_bits",))
def sweep(spec: Spectrum, key_bits: int) -> Spectrum:
    """Singleton deNoise sweep on a *merged* store (buffer must be empty):
    drop count==1 entries and recompact (qf_clean_singleton semantics,
    gqf.c:2792-2876).  Uses the streaming kernel on TPU, a packed
    single-operand sort on other backends."""
    if _pallas_available():
        return _merge_kernel_path(spec, key_bits, drop_singletons=True)
    keep = (spec.keys != SENTINEL) & (spec.counts >= 2)
    packed = jnp.where(
        keep, _pack(spec.keys, spec.counts, spec.traveled, key_bits),
        SENTINEL)
    keys, counts, trav = _unpack(jax.lax.sort(packed), key_bits)
    n = jnp.sum(keep, dtype=jnp.int64)
    return spec._replace(keys=keys, counts=counts, traveled=trav,
                         n_main=n, ndistinct=n)


@jax.jit
def query(spec: Spectrum, keys: jax.Array) -> jax.Array:
    """Batched qf_count_key_value (gqf.c:2442-2469); requires a merged store.

    Binary-search implementation — fine for small probe sets ONLY.  Every
    heavy pipeline path (Contiger node enumeration and the 9N probe phase)
    must stay on query_join: random gathers cost ~100x a streaming sort
    pass on TPU, and this function exists purely for tests/tools.
    """
    pos, found = _locate(spec.keys, keys)
    return jnp.where(found, spec.counts[pos], 0)


@functools.partial(jax.jit, static_argnames=("key_bits",))
def query_join(spec: Spectrum, keys: jax.Array, key_bits: int) -> jax.Array:
    """Batched counts via sort-join — no random access.

    Spectrum entries pack as (key | 0-marker | count) and queries as
    (key | 1-marker | original-index); one sort groups them with each key's
    spectrum entry first in its run, a segmented forward-max propagates the
    count to the run's queries, and a second sort restores query order.
    SENTINEL queries return 0.

    Requires a merged store, len(keys) < 2^(payload_bits-1), and
    run-id * 2^(payload_bits-1) to fit u64 (checked).
    """
    keys = keys.reshape(-1)
    Nq = keys.shape[0]
    C = spec.capacity
    p = payload_bits(key_bits)
    half = jnp.uint64(1) << jnp.uint64(p - 1)
    cmask = half - jnp.uint64(1)
    if Nq >= (1 << (p - 1)):
        raise ValueError("query batch too large for payload bits")
    if (C + Nq).bit_length() + (p - 1) > 63:
        raise ValueError("run-id would overflow the scan packing")

    cap = count_cap(key_bits)
    spec_packed = jnp.where(
        spec.keys == SENTINEL,
        SENTINEL,
        (spec.keys << jnp.uint64(p))
        | jnp.minimum(spec.counts.astype(jnp.int64), cap).astype(jnp.uint64),
    )
    valid = keys != SENTINEL
    qkeys = jnp.where(valid, keys, 0)
    idx = jnp.arange(Nq, dtype=jnp.uint64)
    q_packed = (qkeys << jnp.uint64(p)) | half | idx

    merged = jax.lax.sort(jnp.concatenate([spec_packed, q_packed]))
    mkeys = merged >> jnp.uint64(p)
    is_q = (merged & half) != 0
    first = jnp.concatenate([jnp.ones((1,), bool), mkeys[1:] != mkeys[:-1]])
    run_id = jnp.cumsum(first.astype(jnp.uint64))
    base = jnp.where(is_q, jnp.uint64(0), merged & cmask)
    g = (run_id << jnp.uint64(p - 1)) | base
    F = jax.lax.cummax(g)
    count_here = F & cmask  # F's run part always equals the current run's

    out32 = jnp.where(
        is_q,
        ((merged & cmask) << jnp.uint64(32))
        | jnp.minimum(count_here, jnp.uint64(0x7FFFFFFF)),
        SENTINEL,
    )
    back = jax.lax.sort(out32)[:Nq]
    counts = (back & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
    return jnp.where(valid, counts, 0)


@jax.jit
def query_set_traveled(spec: Spectrum, keys: jax.Array):
    """Batched qf_count_key_value_set_traveled (gqf.c:3092-3128).

    Returns (counts, was_traveled, spec').  All probes in one batch observe
    the *pre-batch* traveled state — the batched analogue of the reference's
    deliberately unlocked read-modify-write (benign duplicate discovery,
    cleaned later exactly like check_unitig, contig_assembly.cpp:935-954).
    """
    pos, found = _locate(spec.keys, keys)
    counts = jnp.where(found, spec.counts[pos], 0)
    was = jnp.where(found, spec.traveled[pos] != 0, False)
    trav = spec.traveled.at[jnp.where(found, pos, 0)].max(
        found.astype(jnp.uint8), mode="drop"
    )
    return counts, was, spec._replace(traveled=trav)


@jax.jit
def query_is_traveled(spec: Spectrum, keys: jax.Array):
    """Batched read-only variant (gqf.c:3132-3163) -> (counts, traveled)."""
    pos, found = _locate(spec.keys, keys)
    counts = jnp.where(found, spec.counts[pos], 0)
    was = jnp.where(found, spec.traveled[pos] != 0, False)
    return counts, was


@functools.partial(jax.jit, static_argnames=("key_bits",))
def union(a: Spectrum, b: Spectrum, key_bits: int) -> Spectrum:
    """qf_merge/qf_multi_merge equivalent (gqf.c:2614-2672): combine two
    merged spectra, summing counts of shared keys.  Result uses a's
    capacities (check_overflow applies)."""
    C, BC = a.capacity, a.buf_capacity
    pa = jnp.where(a.keys == SENTINEL, SENTINEL,
                   _pack(a.keys, a.counts, a.traveled, key_bits))
    pb = jnp.where(b.keys == SENTINEL, SENTINEL,
                   _pack(b.keys, b.counts, b.traveled, key_bits))
    packed = jax.lax.sort(jnp.concatenate([pa, pb]))
    keys, counts, trav = _unpack(packed, key_bits)
    S = jnp.cumsum(counts.astype(jnp.int64))
    first = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    U = jax.lax.cummax(jnp.where(first, S - counts, jnp.int64(-1)))
    totals = S - U
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    keep = last & (keys != SENTINEL)
    survivors = jnp.where(keep, _pack(keys, totals, trav, key_bits), SENTINEL)
    out = jax.lax.sort(survivors)[:C]
    k2, c2, t2 = _unpack(out, key_bits)
    n = jnp.sum(keep, dtype=jnp.int64)
    return Spectrum(
        keys=k2, counts=c2, traveled=t2,
        buf_keys=jnp.full((BC,), SENTINEL, jnp.uint64),
        n_main=n, n_buf=jnp.zeros((), jnp.int64),
        ndistinct=n, nelts=a.nelts + b.nelts,
    )


@functools.partial(jax.jit, static_argnames=("key_bits",))
def inner_product(a: Spectrum, b: Spectrum, key_bits: int) -> jax.Array:
    """qf_inner_product equivalent (gqf.c:2674-2706): sum over shared keys
    of count_a * count_b."""
    cb = query_join(b, a.keys, key_bits)
    va = jnp.where(a.keys == SENTINEL, 0, a.counts).astype(jnp.int64)
    return jnp.sum(va * cb.astype(jnp.int64))


@functools.partial(jax.jit, static_argnames=("key_bits",))
def intersect(a: Spectrum, b: Spectrum, key_bits: int) -> Spectrum:
    """qf_intersect equivalent (gqf.c:2708-2742): keys present in both,
    with min(count_a, count_b) (reference inserts the a-count; min is the
    multiset convention and documented divergence)."""
    C, BC = a.capacity, a.buf_capacity
    cb = query_join(b, a.keys, key_bits)
    keep = (a.keys != SENTINEL) & (cb > 0)
    counts = jnp.minimum(a.counts, cb)
    packed = jnp.where(keep, _pack(a.keys, counts, a.traveled, key_bits),
                       SENTINEL)
    out = jax.lax.sort(packed)[:C]
    k2, c2, t2 = _unpack(out, key_bits)
    n = jnp.sum(keep, dtype=jnp.int64)
    return Spectrum(
        keys=k2, counts=c2, traveled=t2,
        buf_keys=jnp.full((BC,), SENTINEL, jnp.uint64),
        n_main=n, n_buf=jnp.zeros((), jnp.int64),
        ndistinct=n, nelts=jnp.sum(c2.astype(jnp.int64)),
    )


@jax.jit
def magnitude(a: Spectrum) -> jax.Array:
    """qf_magnitude equivalent (gqf.c:2744-2763): sqrt(sum count^2)."""
    v = jnp.where(a.keys == SENTINEL, 0, a.counts).astype(jnp.float64)
    return jnp.sqrt(jnp.sum(v * v))


def check_overflow(spec: Spectrum) -> None:
    """Raise if a merge produced more distinct keys than the capacity holds
    (the reference would silently corrupt memory here, gqf xnslots)."""
    n = int(np.max(np.asarray(spec.n_main)))
    if n > spec.capacity:
        raise RuntimeError(
            f"spectrum overflow: {n} distinct keys > capacity "
            f"{spec.capacity}; raise qb / capacity")


def to_host(spec: Spectrum):
    """Live (keys, counts, traveled) as numpy arrays (requires merged store)."""
    n = int(spec.n_main)
    return (
        np.asarray(spec.keys[:n]),
        np.asarray(spec.counts[:n]),
        np.asarray(spec.traveled[:n]),
    )


def from_host(keys: np.ndarray, counts: np.ndarray, capacity: int,
              buf_capacity: int, traveled: np.ndarray | None = None) -> Spectrum:
    """Build a merged device spectrum from host (key, count) arrays."""
    n = len(keys)
    if n > capacity:
        raise ValueError(f"{n} entries exceed capacity {capacity}")
    order = np.argsort(keys, kind="stable")
    k = np.full(capacity, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    c = np.zeros(capacity, dtype=np.int32)
    t = np.zeros(capacity, dtype=np.uint8)
    k[:n] = keys[order]
    c[:n] = counts[order]
    if traveled is not None:
        t[:n] = traveled[order]
    return Spectrum(
        keys=jnp.asarray(k),
        counts=jnp.asarray(c),
        traveled=jnp.asarray(t),
        buf_keys=jnp.full((buf_capacity,), SENTINEL, dtype=jnp.uint64),
        n_main=jnp.asarray(n, jnp.int64),
        n_buf=jnp.zeros((), jnp.int64),
        ndistinct=jnp.asarray(n, jnp.int64),
        nelts=jnp.asarray(int(counts.sum()), jnp.int64),
    )
