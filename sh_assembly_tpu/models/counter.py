"""K-mer spectrum builder — the CQF-deNoise stage, TPU-native.

Equivalent of CQF_mt::build_KmerSpectrum (cqf/CQF_mt.h:959-995) and the
worker loop fastq_to_uint64kmers_prod (CQF_mt.h:821-931), restructured as a
single-stream batch pipeline:

  host: read -> N-segment -> pack (B, L) batches      (io/fastq, cpp reader)
  device, per batch (one jit program):
      windowed canonical ntHash  ->  key = min(fh,rh) mod 2^(qb+8)
      append raw keys to the log buffer (no random access on the hot path)
  periodically: packed sort-merge of buffer into the sorted main store
      (analogue of local-QF dumps, CQF_mt.h:588-607, but lock-free)
  deNoise trigger: ndistinct >= threshold -> singleton sweep
                   (qf_clean_singleton scheduling, CQF_mt.h:858-922)

The deNoise *decision* math lives in config.size_counter; this module only
executes the schedule: `rounds` sweeps fire as the distinct-key count crosses
the threshold, plus an optional end-of-stream sweep (endDeNoise).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..io import fastq
from ..ops import nthash, spectrum as sp
from ..utils.logging import log


@functools.partial(jax.jit, static_argnames=("k", "key_bits"), donate_argnums=(0,))
def count_batch(spec: sp.Spectrum, codes: jax.Array, lengths: jax.Array,
                k: int, key_bits: int) -> sp.Spectrum:
    """Hash every window of a batch and insert into the spectrum (fused)."""
    keys, valid = nthash.windowed_canonical(codes, lengths, k)
    keys = keys & jnp.uint64((1 << key_bits) - 1)  # mod range (power of two)
    keys = jnp.where(valid, keys, sp.SENTINEL)
    return sp.insert(spec, keys.reshape(-1))


@functools.partial(jax.jit, static_argnames=("key_bits",), donate_argnums=(0,))
def _merge_keep(spec: sp.Spectrum, key_bits: int) -> sp.Spectrum:
    return sp.merge(spec, key_bits, drop_singletons=False)


@functools.partial(jax.jit, static_argnames=("key_bits",), donate_argnums=(0,))
def _sweep(spec: sp.Spectrum, key_bits: int) -> sp.Spectrum:
    """Singleton sweep on a merged store: kill count-1 entries, recompact
    with one packed single-operand sort (multi-operand sorts and scatters
    are both slow on TPU)."""
    keep = (spec.keys != sp.SENTINEL) & (spec.counts >= 2)
    packed = jnp.where(
        keep,
        sp._pack(spec.keys, spec.counts, spec.traveled, key_bits),
        sp.SENTINEL,
    )
    keys, counts, trav = sp._unpack(jax.lax.sort(packed), key_bits)
    n = jnp.sum(keep, dtype=jnp.int64)
    return spec._replace(keys=keys, counts=counts, traveled=trav,
                         n_main=n, ndistinct=n)


@dataclass
class BuildStats:
    batches: int = 0
    merges: int = 0
    sweeps: int = 0
    kmers: int = 0
    distinct: int = 0
    seconds: float = 0.0


def build_spectrum(
    batches: Iterable[fastq.Batch],
    sizing: cfg.CounterSizing,
    capacity: int | None = None,
    buf_capacity: int | None = None,
    batch_cfg: cfg.BatchConfig | None = None,
    progress_every: int = 0,
) -> tuple[sp.Spectrum, BuildStats]:
    """Count canonical k-mers of a batch stream into a merged Spectrum."""
    batch_cfg = batch_cfg or cfg.BatchConfig()
    windows = batch_cfg.reads_per_batch * (batch_cfg.max_read_len - sizing.k + 1)
    if capacity is None:
        capacity = sizing.nslots  # same memory scaling rule as qf_init
    if buf_capacity is None:
        buf_capacity = max(4 * windows, 1 << 20)
    if buf_capacity < 2 * windows:
        raise ValueError(
            f"buf_capacity {buf_capacity} must be >= 2x windows/batch "
            f"({windows}) so one batch of novel keys always fits")

    spec = sp.make(capacity, buf_capacity)
    stats = BuildStats()
    rounds_left = sizing.num_deNoise
    threshold = sizing.ndistinct_for_deNoise
    nbuf_bound = 0  # host-side pessimistic bound on device n_buf
    t0 = time.time()

    for batch in batches:
        spec = count_batch(
            spec,
            jnp.asarray(batch.codes),
            jnp.asarray(batch.lengths),
            sizing.k,
            sizing.qb + 8,
        )
        stats.batches += 1
        nbuf_bound += windows

        if nbuf_bound + windows > buf_capacity:
            spec = _merge_keep(spec, sizing.qb + 8)
            stats.merges += 1
            nbuf_bound = 0
            sp.check_overflow(spec)
            # deNoise trigger: the reference checks its distinct counter
            # after every chunk (CQF_mt.h:858-875); the log-structured store
            # knows the exact count at merge boundaries, so the sweep fires
            # at the first merge after the threshold crossing.
            if rounds_left > 0 and int(spec.ndistinct) >= threshold:
                spec = _sweep(spec, sizing.qb + 8)
                stats.sweeps += 1
                rounds_left -= 1
                log(f"deNoise sweep done ({sizing.num_deNoise - rounds_left}"
                    f"/{sizing.num_deNoise}); distinct={int(spec.ndistinct)}")
        if progress_every and stats.batches % progress_every == 0:
            log(f"batch {stats.batches}: nelts={int(spec.nelts)} "
                f"ndistinct~{int(spec.ndistinct)}")

    spec = _merge_keep(spec, sizing.qb + 8)
    stats.merges += 1
    sp.check_overflow(spec)
    # the reference's trigger also fires on the final chunk (CQF_mt.h:858)
    if rounds_left > 0 and int(spec.ndistinct) >= threshold:
        spec = _sweep(spec, sizing.qb + 8)
        stats.sweeps += 1
        rounds_left -= 1
        log(f"deNoise sweep done ({sizing.num_deNoise - rounds_left}"
            f"/{sizing.num_deNoise}); distinct={int(spec.ndistinct)}")
    if sizing.end_deNoise:
        spec = _sweep(spec, sizing.qb + 8)
        stats.sweeps += 1
        log(f"end deNoise sweep; distinct={int(spec.ndistinct)}")

    stats.kmers = int(spec.nelts)
    stats.distinct = int(spec.ndistinct)
    stats.seconds = time.time() - t0
    return spec, stats


def build_spectrum_from_files(
    files: list[str],
    sizing: cfg.CounterSizing,
    fmode: str = "auto",
    batch_cfg: cfg.BatchConfig | None = None,
    **kw,
) -> tuple[sp.Spectrum, BuildStats]:
    from ..io import native

    batch_cfg = batch_cfg or cfg.BatchConfig()
    stream = native.batches_from_files(
        files, sizing.k, fmode, batch_cfg.reads_per_batch, batch_cfg.max_read_len
    )
    return build_spectrum(stream, sizing, batch_cfg=batch_cfg, **kw)
