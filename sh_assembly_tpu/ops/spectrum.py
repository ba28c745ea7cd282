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
    """Count a batch of canonical keys (SENTINEL entries are ignored).

    Existing keys are scatter-added into main; novel keys are appended to the
    buffer with count 1 per occurrence (duplicates collapse at merge time).
    The caller guarantees buffer headroom >= len(keys) (see models/counter).
    """
    keys = keys.reshape(-1)
    B = keys.shape[0]
    pos, found = _locate(spec.keys, keys)

    counts = spec.counts.at[jnp.where(found, pos, 0)].add(
        found.astype(jnp.int32), mode="drop"
    )

    is_new = (~found) & (keys != SENTINEL)
    n_new = jnp.sum(is_new, dtype=jnp.int64)
    # Compact novel keys to the front of a B-sized block, then splice the
    # whole block at n_buf (slots past n_new are SENTINEL, preserving the
    # buffer invariant that everything past n_buf is empty).
    dest = jnp.where(is_new, jnp.cumsum(is_new) - 1, B - 1)
    block = jnp.full((B,), SENTINEL, dtype=jnp.uint64)
    block = block.at[dest].set(jnp.where(is_new, keys, SENTINEL), mode="drop")
    buf_keys = jax.lax.dynamic_update_slice(
        spec.buf_keys, block, (spec.n_buf.astype(jnp.int32),)
    )

    n_valid = jnp.sum(keys != SENTINEL, dtype=jnp.int64)
    return spec._replace(
        counts=counts,
        buf_keys=buf_keys,
        n_buf=spec.n_buf + n_new,
        ndistinct=spec.ndistinct + n_new,
        nelts=spec.nelts + n_valid,
    )


@functools.partial(jax.jit, static_argnames=("drop_singletons",))
def merge(spec: Spectrum, drop_singletons: bool = False) -> Spectrum:
    """Fold the buffer into main: sort, combine duplicate keys, recompact.

    With drop_singletons=True this is the deNoise sweep: entries whose total
    count is exactly 1 are purged (semantics of qf_clean_singleton,
    gqf.c:2792-2876; scheduling in models/counter).
    """
    C, BC = spec.capacity, spec.buf_capacity
    total = C + BC
    all_keys = jnp.concatenate([spec.keys, spec.buf_keys])
    all_counts = jnp.concatenate(
        [spec.counts, jnp.ones((BC,), jnp.int32)]
    )
    all_trav = jnp.concatenate([spec.traveled, jnp.zeros((BC,), jnp.uint8)])
    # Dead buffer slots must not contribute counts.
    all_counts = jnp.where(all_keys == SENTINEL, 0, all_counts)

    all_keys, all_counts, all_trav = jax.lax.sort(
        (all_keys, all_counts, all_trav), num_keys=1
    )

    first = jnp.concatenate(
        [jnp.ones((1,), bool), all_keys[1:] != all_keys[:-1]]
    )
    seg = jnp.cumsum(first) - 1
    summed = jax.ops.segment_sum(all_counts, seg, num_segments=total)
    trav_max = jax.ops.segment_max(all_trav, seg, num_segments=total)

    key_first = jnp.where(first, all_keys, SENTINEL)
    cnt_first = summed[seg]  # broadcast back; only first-of-segment rows used
    trv_first = trav_max[seg]

    keep = first & (all_keys != SENTINEL)
    if drop_singletons:
        keep = keep & (cnt_first >= 2)
    rank = jnp.cumsum(keep) - 1
    # NOTE: n_main may exceed C on overflow; entries past C are dropped by
    # the scatter.  Callers must check n_main <= capacity (check_overflow).
    dest = jnp.where(keep, rank, total - 1)

    keys = jnp.full((C,), SENTINEL, dtype=jnp.uint64)
    counts = jnp.zeros((C,), dtype=jnp.int32)
    trav = jnp.zeros((C,), dtype=jnp.uint8)
    keys = keys.at[dest].set(jnp.where(keep, key_first, SENTINEL), mode="drop")
    counts = counts.at[dest].set(jnp.where(keep, cnt_first, 0), mode="drop")
    trav = trav.at[dest].set(jnp.where(keep, trv_first, 0), mode="drop")

    n_main = jnp.sum(keep, dtype=jnp.int64)
    return Spectrum(
        keys=keys,
        counts=counts,
        traveled=trav,
        buf_keys=jnp.full((BC,), SENTINEL, dtype=jnp.uint64),
        n_main=n_main,
        n_buf=jnp.zeros((), jnp.int64),
        ndistinct=n_main,
        nelts=spec.nelts,
    )


@jax.jit
def query(spec: Spectrum, keys: jax.Array) -> jax.Array:
    """Batched qf_count_key_value (gqf.c:2442-2469); requires a merged store."""
    pos, found = _locate(spec.keys, keys)
    return jnp.where(found, spec.counts[pos], 0)


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
