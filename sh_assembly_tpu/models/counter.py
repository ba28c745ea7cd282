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
from ..ops import nthash, packio, spectrum as sp
from ..utils import profiling
from ..utils.logging import log


def _mask_key_planes(kh, kl, key_bits: int):
    """key mod 2^key_bits on u32 planes (power-of-two range,
    CQF_mt.h:636-671)."""
    if key_bits > 32:
        return kh & jnp.uint32((1 << (key_bits - 32)) - 1), kl
    if key_bits == 32:
        return jnp.zeros_like(kh), kl
    return jnp.zeros_like(kh), kl & jnp.uint32((1 << key_bits) - 1)


@functools.partial(jax.jit, static_argnames=("k", "key_bits"), donate_argnums=(0,))
def count_batch(spec: sp.Spectrum, codes: jax.Array, lengths: jax.Array,
                k: int, key_bits: int) -> sp.Spectrum:
    """Hash every window of a batch and insert into the spectrum (fused).

    u32-plane path end to end: TPU v5e has no native 64-bit vector unit,
    and the emulated-u64 hash+append measured ~6 ns/key vs <1 for planes.
    """
    kh, kl, valid = nthash.windowed_canonical_planes(codes, lengths, k)
    kh, kl = _mask_key_planes(kh, kl, key_bits)
    return sp.insert_planes(spec, kh, kl, valid)


@functools.partial(jax.jit, static_argnames=("key_bits",), donate_argnums=(0,))
def _merge_keep(spec: sp.Spectrum, key_bits: int) -> sp.Spectrum:
    return sp.merge(spec, key_bits, drop_singletons=False)


@functools.partial(jax.jit, static_argnames=("key_bits",), donate_argnums=(0,))
def _sweep(spec: sp.Spectrum, key_bits: int) -> sp.Spectrum:
    """Singleton sweep on a merged store (sp.sweep: streaming Pallas kernel
    on TPU, packed single-operand sort elsewhere)."""
    return sp.sweep(spec, key_bits)


@functools.partial(
    jax.jit, static_argnames=("k", "key_bits"), donate_argnums=(0,))
def append_scan(spec: sp.Spectrum, codes: jax.Array, lengths: jax.Array,
                k: int, key_bits: int) -> sp.Spectrum:
    """Pure hash+append over a stack of S batches (one device program).

    NO merge inside the scan: an in-scan lax.cond threading the multi-GiB
    spectrum through every step forces XLA to re-materialize the carried
    planes per step (~4 ms/GiB/step, measured ~5x the real append cost).
    Merge cadence is driven by the HOST instead — the buffer fill advances
    deterministically (one batch = one fixed-size block), so the host
    mirror knows exactly when the next append would overflow and dispatches
    the merge program between appends (build_spectrum).  The caller
    guarantees the whole stack fits the buffer headroom.
    """
    def body(s, xs):
        bcodes, blengths = xs
        kh, kl, valid = nthash.windowed_canonical_planes(bcodes, blengths, k)
        kh, kl = _mask_key_planes(kh, kl, key_bits)
        return sp.insert_planes(s, kh, kl, valid), ()

    spec, _ = jax.lax.scan(body, spec, (codes, lengths))
    return spec


@functools.partial(
    jax.jit, static_argnames=("k", "key_bits", "max_read_len"),
    donate_argnums=(0,))
def append_scan_packed(spec: sp.Spectrum, packed: jax.Array,
                       nmask: jax.Array, lengths: jax.Array,
                       k: int, key_bits: int, max_read_len: int
                       ) -> sp.Spectrum:
    """append_scan over a 2-bit-packed read stack (ops/packio): the host
    ships packed u8[S,B,L/4] + nmask u8[S,B,L/8] (4x less feed bandwidth)
    and each scan step unpacks on device before hashing."""
    L = max_read_len

    def body(s, xs):
        bpacked, bnmask, blengths = xs
        bcodes = packio.unpack(bpacked, bnmask, L)
        kh, kl, valid = nthash.windowed_canonical_planes(bcodes, blengths, k)
        kh, kl = _mask_key_planes(kh, kl, key_bits)
        return sp.insert_planes(s, kh, kl, valid), ()

    spec, _ = jax.lax.scan(body, spec, (packed, nmask, lengths))
    return spec


@functools.partial(
    jax.jit, static_argnames=("key_bits",), donate_argnums=(0, 1))
def merge_maybe_sweep(spec: sp.Spectrum, rounds_left: jax.Array,
                      threshold: jax.Array, key_bits: int):
    """Buffer merge + deNoise trigger check in one dispatch.

    The sweep fires iff rounds remain and the post-merge distinct count
    crosses the threshold (CQF_runtime_mt::needDeNoise, CQF_mt.h:307-313).
    Returns (spec, rounds_left).  The cond costs one re-materialization of
    the spectrum planes — amortized over a full buffer of appends, unlike
    the per-batch cond this design replaced.
    """
    spec = sp.merge(spec, key_bits)
    do_sweep = (rounds_left > 0) & (spec.ndistinct >= threshold)
    spec = jax.lax.cond(
        do_sweep, lambda s: sp.sweep(s, key_bits), lambda s: s, spec)
    return spec, rounds_left - do_sweep.astype(rounds_left.dtype)


@dataclass
class BuildStats:
    batches: int = 0
    merges: int = 0
    sweeps: int = 0
    kmers: int = 0
    distinct: int = 0
    seconds: float = 0.0


def _prefetch(it: Iterator, depth: int = 8) -> Iterator:
    """Pull from `it` on a background thread so host read/decode overlaps
    device compute (the reference overlaps via its reader threads,
    CQF_mt.h:821-857; here one thread suffices — the heavy decode already
    lives in the native C++ reader).

    If the consumer exits early (overflow raise, generator close), the
    worker is cancelled via a flag it checks between bounded q.put attempts
    and the source iterator is closed so generator finally-blocks run (the
    native reader handle would otherwise leak its C++ threads)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE = object()
    cancelled = threading.Event()

    def worker():
        try:
            for x in it:
                while not cancelled.is_set():
                    try:
                        q.put(x, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if cancelled.is_set():
                    return
            q.put(DONE)
        except BaseException as e:  # surface errors at the consumer
            if not cancelled.is_set():
                q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is DONE:
                return
            if isinstance(x, BaseException):
                raise x
            yield x
    finally:
        cancelled.set()
        close = getattr(it, "close", None)
        if close is not None:
            t.join(timeout=5.0)  # let the worker leave the iterator first
            close()


def build_spectrum(
    batches: Iterable[fastq.Batch],
    sizing: cfg.CounterSizing,
    capacity: int | None = None,
    buf_capacity: int | None = None,
    batch_cfg: cfg.BatchConfig | None = None,
    progress_every: int = 0,
    super_batch: int = 8,
    tight_denoise: bool = True,
) -> tuple[sp.Spectrum, BuildStats]:
    """Count canonical k-mers of a batch stream into a merged Spectrum.

    Host batches are stacked `super_batch` at a time and processed by one
    fused append program (append_scan_packed) per superstep; the host
    dispatches the merge+sweep program (merge_maybe_sweep) between appends
    at the exact per-batch cadence it mirrors deterministically.

    tight_denoise=False restores the pure buffer-boundary sweep cadence
    (used by cadence-characterization tests; production default is the
    tighter near-threshold trigger, see need_merge_before).
    """
    batch_cfg = batch_cfg or cfg.BatchConfig()
    k, key_bits = sizing.k, sizing.qb + 8
    _Lp = (batch_cfg.max_read_len + 7) // 8 * 8
    windows = batch_cfg.reads_per_batch * (_Lp - k + 1)
    if capacity is None:
        capacity = sizing.nslots  # same memory scaling rule as qf_init
    if buf_capacity is None:
        # power of two: odd-sized sort/scan extents have hit TPU backend
        # codegen failures (scoped-vmem overflows); 2^n sizes are the
        # well-trodden path
        buf_capacity = 1 << max(4 * windows - 1, (1 << 20) - 1).bit_length()
        # a larger buffer amortizes the per-merge O(capacity) stream pass
        # (measured: 90 -> 124M keys/s per merged key going from C/8 to
        # C/2 at C=2^28); grow toward C/2, capped at 2^27 for HBM headroom
        buf_capacity = max(buf_capacity, min(capacity // 2, 1 << 27))
    if buf_capacity < 2 * windows:
        raise ValueError(
            f"buf_capacity {buf_capacity} must be >= 2x windows/batch "
            f"({windows}) so one batch of keys always fits")

    spec = sp.make(capacity, buf_capacity)
    stats = BuildStats()
    rounds_left = jnp.asarray(sizing.num_deNoise, jnp.int32)
    threshold = jnp.asarray(sizing.ndistinct_for_deNoise, jnp.int64)
    threshold_i = int(sizing.ndistinct_for_deNoise)
    t0 = time.time()
    S, B, L = super_batch, batch_cfg.reads_per_batch, batch_cfg.max_read_len
    Lp = (L + 7) // 8 * 8  # packed transport needs L % 8 == 0

    stack_packed = np.zeros((S, B, Lp // 4), np.uint8)
    stack_nmask = np.full((S, B, Lp // 8), 0xFF, np.uint8)
    stack_lengths = np.zeros((S, B), np.int32)
    fill = 0
    # HOST-DRIVEN merge cadence: every batch appends exactly BW block slots
    # (padding included, sp.insert_planes), so the buffer fill is a
    # deterministic host mirror and the host dispatches the merge program
    # between appends — the per-batch in-scan lax.cond this replaces forced
    # XLA to re-materialize the multi-GiB carried planes every scan step.
    BW = B * (Lp - k + 1)
    host_nbuf = 0
    # ndistinct/rounds mirrors are EXACT: both only change at merges, and
    # while deNoise rounds remain each merge dispatch is followed by one
    # host sync (rare; cost ~ one tunnel round trip per buffer fill).
    nd_host = 0
    rl_host = int(sizing.num_deNoise)
    pending_nmain = None  # previous merge's n_main (deferred overflow check)

    def need_merge_before() -> bool:
        """The per-batch cadence rule, host-side (bit-identical to the old
        device cond: ndistinct is frozen between merges)."""
        if host_nbuf + BW > buf_capacity:
            return True
        # tighter deNoise cadence: when the buffered occurrences could push
        # ndistinct over the trigger, merge early so the sweep fires within
        # ~BC/4 of the crossing instead of up to one full buffer late (the
        # reference checks every ~8 MB chunk, CQF_mt.h:858-875).  The
        # n_buf >= BC/4 guard caps the extra merge cost at 4x cadence.
        return (tight_denoise and rl_host > 0
                and host_nbuf >= buf_capacity // 4
                and nd_host + host_nbuf >= threshold_i)

    def do_merge():
        nonlocal spec, rounds_left, host_nbuf, nd_host, rl_host
        nonlocal pending_nmain
        spec, rounds_left = merge_maybe_sweep(
            spec, rounds_left, threshold, key_bits)
        stats.merges += 1
        host_nbuf = 0
        if pending_nmain is not None:
            sp.check_overflow_value(pending_nmain, capacity)
        pending_nmain = spec.n_main.copy()
        if rl_host > 0:
            # sync the trigger mirrors (forces this merge to finish; only
            # while rounds remain — the steady-state pipeline never syncs)
            rl_new = int(rounds_left)
            nd_host = int(spec.ndistinct)
            if rl_new < rl_host:
                log(f"deNoise sweep {sizing.num_deNoise - rl_new}: "
                    f"distinct={nd_host}")
            rl_host = rl_new

    def flush_stack():
        nonlocal spec, fill, host_nbuf
        nonlocal stack_packed, stack_nmask, stack_lengths
        # does the cadence rule fire anywhere inside this stack?
        nb, split = host_nbuf, False
        for _ in range(fill):
            if nb + BW > buf_capacity or (
                    tight_denoise and rl_host > 0 and nb >= buf_capacity // 4
                    and nd_host + nb >= threshold_i):
                split = True
                break
            nb += BW
        with profiling.phase("count:device scan+merge"):
            if not split and fill == S:
                # fast path: one fused S-step append program
                spec = append_scan_packed(
                    spec, jnp.asarray(stack_packed),
                    jnp.asarray(stack_nmask), jnp.asarray(stack_lengths),
                    k, key_bits, Lp)
                host_nbuf += S * BW
            else:
                # merge boundary (or tail) inside the stack: dispatch
                # batch-by-batch with the merge program in between — same
                # per-batch cadence, one extra compiled program (S=1)
                for i in range(fill):
                    if need_merge_before():
                        do_merge()
                    spec = append_scan_packed(
                        spec, jnp.asarray(stack_packed[i : i + 1]),
                        jnp.asarray(stack_nmask[i : i + 1]),
                        jnp.asarray(stack_lengths[i : i + 1]),
                        k, key_bits, Lp)
                    host_nbuf += BW
        # FRESH staging arrays: jnp.asarray may zero-copy numpy memory on
        # CPU backends, so mutating the old stack would race the async
        # dispatch that still reads it
        stack_packed = np.zeros((S, B, Lp // 4), np.uint8)
        stack_nmask = np.full((S, B, Lp // 8), 0xFF, np.uint8)
        stack_lengths = np.zeros((S, B), np.int32)
        fill = 0

    pad_cols = Lp - L
    it = _prefetch(iter(batches))
    while True:
        with profiling.phase("count:host read/pack"):
            batch = next(it, None)
        if batch is None:
            break
        if isinstance(batch, fastq.PackedBatch):
            # already in transport format (native reader packed path)
            if batch.row_len != Lp:
                raise ValueError(
                    f"packed row length {batch.row_len} != expected {Lp}")
            p, m = batch.packed, batch.nmask
        else:
            codes = batch.codes
            if pad_cols:
                codes = np.pad(codes, ((0, 0), (0, pad_cols)),
                               constant_values=5)
            p, m = packio.pack_np(codes)
        stack_packed[fill] = p
        stack_nmask[fill] = m
        stack_lengths[fill] = batch.lengths
        fill += 1
        stats.batches += 1
        if fill == S:
            flush_stack()
            if progress_every and stats.batches % progress_every < S:
                log(f"batch {stats.batches}: nelts={int(spec.nelts)} "
                    f"ndistinct(last merge)={int(spec.ndistinct)}")
    if fill:
        flush_stack()

    # End-of-stream overflow checks: pending_nmain covers the last mid-
    # stream merge; the finalize merge below covers the stream's tail (the
    # most likely overflow point — the store fills monotonically).
    if pending_nmain is not None:
        sp.check_overflow_value(pending_nmain, capacity)

    with profiling.phase("count:finalize merge+sweeps"):
        spec = sp.merge_sized(spec, key_bits, host_nbuf)
        stats.merges += 1
        sp.check_overflow(spec)
        # the reference's trigger also fires on the final chunk
        # (CQF_mt.h:858)
        if int(rounds_left) > 0 and int(spec.ndistinct) >= int(threshold):
            spec = _sweep(spec, key_bits)
            rounds_left = rounds_left - 1
            log(f"deNoise sweep done; distinct={int(spec.ndistinct)}")
        if sizing.end_deNoise:
            spec = _sweep(spec, key_bits)
            log(f"end deNoise sweep; distinct={int(spec.ndistinct)}")

    stats.sweeps = sizing.num_deNoise - int(rounds_left) + (
        1 if sizing.end_deNoise else 0)
    stats.kmers = int(spec.nelts)
    stats.distinct = int(spec.ndistinct)
    stats.seconds = time.time() - t0
    return spec, stats


def default_batch_cfg(sizing: cfg.CounterSizing,
                      max_read_len: int = 160) -> cfg.BatchConfig:
    """Batch geometry scaled to the filter size.

    Keeps the log buffer (4x a batch's windows) comparable to the spectrum
    capacity: tiny filters with huge batches produce extreme sort-extent
    ratios that compile pathologically slowly on TPU, and oversized batches
    buy nothing for small datasets.
    """
    wrow = max_read_len - sizing.k + 1
    rows = max(min(8192, sizing.nslots // (8 * wrow)), 128)
    rows = 1 << (rows.bit_length() - 1)  # round down to a power of two
    return cfg.BatchConfig(reads_per_batch=rows, max_read_len=max_read_len)


def build_spectrum_from_files(
    files: list[str],
    sizing: cfg.CounterSizing,
    fmode: str = "auto",
    batch_cfg: cfg.BatchConfig | None = None,
    n_threads: int = 4,
    **kw,
) -> tuple[sp.Spectrum, BuildStats]:
    from ..io import native

    batch_cfg = batch_cfg or default_batch_cfg(sizing)
    Lp = (batch_cfg.max_read_len + 7) // 8 * 8
    stream = native.packed_batches_from_files(
        files, sizing.k, fmode, batch_cfg.reads_per_batch, Lp,
        n_threads=n_threads,
    )
    return build_spectrum(stream, sizing, batch_cfg=batch_cfg, **kw)
