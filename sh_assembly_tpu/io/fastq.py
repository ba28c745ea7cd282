"""Host-side FASTQ/FASTA ingestion: streaming, N-segmentation, batching.

The device kernels want fixed-shape batches ``(B, L) uint8 codes + int32
lengths``.  This module streams records (plain, gzip, or bzip2 — reference
FILE_MODE, base/global.h:104-107), splits reads at Ns the same way the
reference hot loop does, and packs segments into padded batches.

N-handling parity (cqf/CQF_mt.h:610-731): the reference only checks for 'N'
at offsets >= k of the current (sub-)read; an N closer than k to the segment
start stays inside the window and hashes with seed 0.  segment_read below
implements exactly that greedy rule.

Segments longer than L are tiled into pieces with k-1 overlap so every
window is produced exactly once.

A faster native (C++) reader with the same interface lives in cpp/ and is
used automatically when built (io/native.py).
"""

from __future__ import annotations

import bz2
import gzip
import os
from dataclasses import dataclass
from typing import Iterable, Iterator

import numpy as np

from ..utils import dna

_N = dna.N
_PAD = dna.PAD


def open_seq_file(path: str, fmode: str = "auto"):
    """fmode: 'f' plain, 'g' gzip, 'b' bzip2, 'auto' by extension."""
    if fmode == "auto":
        if path.endswith(".gz"):
            fmode = "g"
        elif path.endswith(".bz2"):
            fmode = "b"
        else:
            fmode = "f"
    if fmode == "g":
        return gzip.open(path, "rb")
    if fmode == "b":
        return bz2.open(path, "rb")
    return open(path, "rb")


def read_file_list(list_path: str) -> list[str]:
    """Read-file list: one name per line, resolved relative to the list's
    directory (reference: CQF-deNoise.cpp:59-80)."""
    prefix = os.path.dirname(os.path.abspath(list_path))
    out = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(line if os.path.isabs(line) else os.path.join(prefix, line))
    return out


def iter_records(path: str, fmode: str = "auto") -> Iterator[bytes]:
    """Yield raw sequence lines from FASTQ (4-line) or FASTA files."""
    with open_seq_file(path, fmode) as f:
        # FASTA: header lines start with '>'; sequences may span lines.
        probe = f.read(1)
        f.seek(0) if hasattr(f, "seek") else None
        is_fasta = probe == b">"
        if is_fasta:
            seq_parts: list[bytes] = []
            for line in f:
                line = line.rstrip()
                if line.startswith(b">"):
                    if seq_parts:
                        yield b"".join(seq_parts)
                        seq_parts = []
                else:
                    seq_parts.append(line)
            if seq_parts:
                yield b"".join(seq_parts)
        else:
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().rstrip()
                f.readline()  # +
                f.readline()  # quals
                if seq:
                    yield seq


def segment_read(codes: np.ndarray, k: int) -> list[tuple[int, int]]:
    """Split positions per the reference N rule -> [(start, length), ...].

    Greedy scan: from the current segment start, the first N at offset >= k
    ends the segment (the N is excluded) and the next segment starts right
    after it.  Ns at offsets < k stay embedded.  Segments shorter than k are
    dropped (reads_to_kmers, CQF_mt.h:626-679).
    """
    n_pos = np.flatnonzero(codes == _N)
    L = len(codes)
    segs: list[tuple[int, int]] = []
    start = 0
    for p in n_pos.tolist():
        if p - start >= k:
            segs.append((start, p - start))
            start = p + 1
        # else: embedded N, keep scanning
    if L - start >= k:
        segs.append((start, L - start))
    # Re-scan embedded-N case: an N at offset < k of a *new* segment start is
    # embedded, but the greedy loop above may place start past p without
    # checking Ns between start and start+k again — those are embedded by
    # construction, which matches the reference.
    return segs


@dataclass
class Batch:
    codes: np.ndarray  # uint8[B, L]
    lengths: np.ndarray  # int32[B]
    n_rows: int  # rows actually used
    # column of the source READ's middle k-mer within this row, -1 if this
    # row holds no read-middle (the reference seeds traversal only from the
    # middle k-mer of each read, contig_assembly.cpp:2068-2071); None means
    # the producer didn't track seeds (counting-only paths)
    seed_col: np.ndarray | None = None  # int32[B]


@dataclass
class PackedBatch:
    """A batch already in the device transport format (ops/packio):
    2-bit packed codes + N/pad bitmask.  Produced by the native reader's
    packed path so no Python packing pass touches the bytes."""

    packed: np.ndarray  # uint8[B, L/4]
    nmask: np.ndarray  # uint8[B, L/8]
    lengths: np.ndarray  # int32[B]
    n_rows: int
    seed_col: np.ndarray | None = None  # int32[B]; see Batch.seed_col

    @property
    def row_len(self) -> int:
        return self.packed.shape[-1] * 4


class Batcher:
    """Packs (sub-)read segments into fixed-shape device batches."""

    def __init__(self, k: int, reads_per_batch: int = 16384, max_read_len: int = 160):
        self.k = k
        self.B = reads_per_batch
        self.L = max_read_len
        self._codes = np.full((self.B, self.L), _PAD, dtype=np.uint8)
        self._lengths = np.zeros(self.B, dtype=np.int32)
        self._seed = np.full(self.B, -1, dtype=np.int32)
        self._row = 0

    def _emit(self) -> Batch:
        b = Batch(self._codes, self._lengths, self._row, self._seed)
        self._codes = np.full((self.B, self.L), _PAD, dtype=np.uint8)
        self._lengths = np.zeros(self.B, dtype=np.int32)
        self._seed = np.full(self.B, -1, dtype=np.int32)
        self._row = 0
        return b

    def add_segment(self, seg: np.ndarray,
                    seed_pos: int = -1) -> Iterator[Batch]:
        """Add one N-free-tail segment; yields finished batches.

        seed_pos: offset within `seg` of the source read's middle k-mer,
        or -1 (the k-mer never straddles a piece boundary: pieces overlap
        by k-1 and each window belongs to exactly one piece)."""
        k, L = self.k, self.L
        step = L - k + 1
        for off in range(0, max(len(seg) - k + 1, 1), step):
            piece = seg[off : off + L]
            if len(piece) < k:
                break
            self._codes[self._row, : len(piece)] = piece
            self._lengths[self._row] = len(piece)
            if seed_pos >= 0 and off <= seed_pos < off + step:
                self._seed[self._row] = seed_pos - off
            self._row += 1
            if self._row == self.B:
                yield self._emit()

    def add_read(self, seq: bytes | np.ndarray) -> Iterator[Batch]:
        codes = dna.encode(seq) if isinstance(seq, (bytes, str)) else seq
        # reference seed rule (find_unitigs_mt_master, contig_assembly.cpp:
        # 2068-2080): the read's middle k-mer, skipped when it contains an
        # N; an N-free window lies inside exactly one segment
        k = self.k
        middle = len(codes) // 2
        seed_ok = (middle + k <= len(codes)
                   and not np.any(codes[middle : middle + k] >= 4))
        for start, length in segment_read(codes, self.k):
            sp = -1
            if seed_ok and start <= middle and middle + k <= start + length:
                sp = middle - start
            yield from self.add_segment(codes[start : start + length], sp)

    def flush(self) -> Iterator[Batch]:
        if self._row:
            yield self._emit()


def batches_from_files(
    paths: Iterable[str],
    k: int,
    fmode: str = "auto",
    reads_per_batch: int = 16384,
    max_read_len: int = 160,
) -> Iterator[Batch]:
    """Stream fixed-shape batches from a list of sequence files."""
    batcher = Batcher(k, reads_per_batch, max_read_len)
    for path in paths:
        for seq in iter_records(path, fmode):
            yield from batcher.add_read(seq)
    yield from batcher.flush()
