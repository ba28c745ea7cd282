"""Reference-compatible CQF ``.ser`` files: transcode to/from (key, count).

The TPU engine keeps its spectrum as sorted (key, count) arrays; the
reference serializes an RSQF bit-layout (qf_serialize, gqf.c:2379-2394).
This module transcodes between the two so .ser files interoperate with the
reference Contiger / tooling in both directions.

Layout (reference structs, cqf/gqf.h:62-103 with GRAPH_TRAVERSE defined and
BITS_PER_SLOT==0 runtime slots):

  qfmetadata (128 bytes, natural alignment, little-endian):
    u64 size; u32 seed; [4 pad]; u64 nslots, xnslots, key_bits, value_bits,
    key_remainder_bits, bits_per_slot; u128 range; u64 nblocks, nelts,
    ndistinct_elts, noccupied_slots, num_locks; [8 pad to 16-align]
  blocks, each packed (offset u8 | occupieds u64 | runends u64 |
    traveled u64 | slots[64 * bits_per_slot / 8]).

RSQF invariants reproduced offline:
  * bucket b = key >> bits_per_slot, remainder = low bits (gqf.c:2444-2446)
  * runs laid out in bucket order at start >= bucket, packed left
  * remainders ascending within a run; counts use the variable-length
    encoding of encode_counter (gqf.c:1218-1255)
  * runend bit on the last slot of each run; occupied bit at the bucket
  * block offset = run_end(64*i - 1) - (64*i - 1), saturated at 255
    (block_offset_strict, gqf.c:598-601; BLOCK_OFFSET_BITS, gqf.c:45)
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

SLOTS_PER_BLOCK = 64
NUM_SLOTS_TO_LOCK = 1 << 16
METADATA_BYTES = 128
DEFAULT_SEED = 2038074761


@dataclass
class CqfMeta:
    seed: int
    nslots: int
    key_bits: int
    value_bits: int = 0
    nelts: int = 0
    ndistinct_elts: int = 0
    noccupied_slots: int = 0

    @property
    def qb(self) -> int:
        return self.nslots.bit_length() - 1

    @property
    def key_remainder_bits(self) -> int:
        return self.key_bits - self.qb

    @property
    def bits_per_slot(self) -> int:
        return self.key_remainder_bits + self.value_bits

    @property
    def xnslots(self) -> int:
        return int(self.nslots + 10 * math.sqrt(float(self.nslots)))

    @property
    def nblocks(self) -> int:
        return (self.xnslots + SLOTS_PER_BLOCK - 1) // SLOTS_PER_BLOCK

    @property
    def block_bytes(self) -> int:
        return 25 + SLOTS_PER_BLOCK * self.bits_per_slot // 8

    @property
    def size(self) -> int:
        return self.nblocks * self.block_bytes

    @property
    def range(self) -> int:
        return self.nslots << self.bits_per_slot

    @property
    def num_locks(self) -> int:
        return self.xnslots // NUM_SLOTS_TO_LOCK + 2


def _pack_metadata(m: CqfMeta) -> bytes:
    lo = m.range & ((1 << 64) - 1)
    hi = m.range >> 64
    return struct.pack(
        "<QI4xQQQQQQQQQQQQQ8x",
        m.size, m.seed, m.nslots, m.xnslots, m.key_bits, m.value_bits,
        m.key_remainder_bits, m.bits_per_slot, lo, hi, m.nblocks,
        m.nelts, m.ndistinct_elts, m.noccupied_slots, m.num_locks,
    )


def _unpack_metadata(buf: bytes) -> CqfMeta:
    (size, seed, nslots, xnslots, key_bits, value_bits, krb, bps, rlo, rhi,
     nblocks, nelts, ndistinct, nocc, nlocks) = struct.unpack(
        "<QI4xQQQQQQQQQQQQQ8x", buf[:METADATA_BYTES]
    )
    m = CqfMeta(seed=seed, nslots=nslots, key_bits=key_bits,
                value_bits=value_bits, nelts=nelts, ndistinct_elts=ndistinct,
                noccupied_slots=nocc)
    if m.size != size or m.nblocks != nblocks:
        raise ValueError("inconsistent CQF metadata header")
    return m


def encode_counter(remainder: int, count: int, base_bits: int) -> list[int]:
    """Slot sequence for one (remainder, count) entry (gqf.c:1225-1255)."""
    if count == 1:
        return [remainder]
    msb = 1 << (base_bits - 1)
    base = msb
    c = count - 1
    digits = [c % base]  # least significant, no MSB flag
    c //= base
    while c:
        digits.append((c % base) | msb)
        c //= base
    digits.reverse()  # most significant first
    out = [remainder]
    if digits[0] > remainder:
        out.append(0)
    out.extend(digits)
    return out


def decode_run(slots: np.ndarray, base_bits: int) -> list[tuple[int, int]]:
    """Decode one run's slot bytes -> [(remainder, count)] (gqf.c:1259-1299)."""
    msb = 1 << (base_bits - 1)
    mask = msb - 1
    out = []
    i, n = 0, len(slots)
    while i < n:
        rem = int(slots[i])
        if i + 1 >= n:
            out.append((rem, 1))
            break
        nxt = int(slots[i + 1])
        if nxt > rem:
            out.append((rem, 1))
            i += 1
            continue
        j = i + 1
        if nxt == 0:
            j += 1
            nxt = int(slots[j])
        cnt = 0
        while nxt & msb:
            cnt = cnt * msb + (nxt & mask)
            j += 1
            nxt = int(slots[j])
        cnt = cnt * msb + nxt
        out.append((rem, cnt + 1))
        i = j + 1
    return out


def _native_lib():
    """The shared native library (cpp/cqf_ser.cpp), or None.

    Streams blocks with O(1) memory beyond the key arrays — the Python
    paths below materialize ~30 B/slot of intermediates (fine at test
    scale, prohibitive for human-scale filters) and decode runs in a
    Python loop.  Both directions are cross-validated against the Python
    transcoder (tests/test_cqf_ser.py)."""
    import ctypes

    from ..io import native

    lib = native._load()
    if lib is None or not hasattr(lib, "serw_open"):
        return None
    if not getattr(lib, "_ser_typed", False):
        lib.serw_open.restype = ctypes.c_void_p
        lib.serw_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint64, ctypes.c_uint64]
        lib.serw_add.restype = ctypes.c_int
        lib.serw_add.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.serw_close.restype = ctypes.c_int
        lib.serw_close.argtypes = [ctypes.c_void_p]
        lib.serr_open.restype = ctypes.c_void_p
        lib.serr_open.argtypes = [ctypes.c_char_p]
        lib.serr_meta.restype = None
        lib.serr_meta.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint64)]
        lib.serr_next.restype = ctypes.c_int64
        lib.serr_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.serr_close.restype = None
        lib.serr_close.argtypes = [ctypes.c_void_p]
        lib._ser_typed = True
    return lib


def write_ser_native(path, keys, counts, qb, key_bits, traveled=None,
                     seed=DEFAULT_SEED, nelts=None, ndistinct=None,
                     chunk=1 << 22):
    """Streaming native writer; raises RuntimeError without the library."""
    import ctypes

    lib = _native_lib()
    if lib is None:
        raise RuntimeError("native transcoder unavailable")
    keys = np.ascontiguousarray(keys, np.uint64)
    counts = np.ascontiguousarray(counts, np.int64)
    trav = (np.ascontiguousarray(traveled, np.uint8)
            if traveled is not None else np.zeros(len(keys), np.uint8))
    m = CqfMeta(seed=seed, nslots=1 << qb, key_bits=key_bits,
                nelts=int(counts.sum()) if nelts is None else nelts,
                ndistinct_elts=len(keys) if ndistinct is None else ndistinct)
    h = lib.serw_open(path.encode(), qb, key_bits, seed,
                      m.nelts, m.ndistinct_elts)
    if not h:
        raise IOError(f"serw_open failed for {path}")
    ok = True
    try:
        for i in range(0, len(keys), chunk):
            j = min(i + chunk, len(keys))
            kc = np.ascontiguousarray(keys[i:j])
            cc = np.ascontiguousarray(counts[i:j])
            tc = np.ascontiguousarray(trav[i:j])
            if lib.serw_add(
                    h, kc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                    cc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    tc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    j - i) != 0:
                ok = False
                break
    finally:
        rc = lib.serw_close(h)
    if not ok or rc != 0:
        raise ValueError(
            "native .ser write failed (keys not strictly increasing, or "
            "CQF overflow beyond xnslots)")
    return m


def read_ser_native(path, chunk=1 << 22):
    """Streaming native reader -> (meta, keys, counts, traveled)."""
    import ctypes

    lib = _native_lib()
    if lib is None:
        raise RuntimeError("native transcoder unavailable")
    h = lib.serr_open(path.encode())
    if not h:
        raise IOError(f"serr_open failed for {path}")
    try:
        mi = np.zeros(8, np.uint64)
        lib.serr_meta(h, mi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        m = CqfMeta(seed=int(mi[0]), nslots=int(mi[1]), key_bits=int(mi[2]),
                    value_bits=int(mi[3]), nelts=int(mi[4]),
                    ndistinct_elts=int(mi[5]), noccupied_slots=int(mi[6]))
        ks, cs, ts = [], [], []
        kb = np.empty(chunk, np.uint64)
        cb = np.empty(chunk, np.int64)
        tb = np.empty(chunk, np.uint8)
        while True:
            n = lib.serr_next(
                h, kb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                tb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), chunk)
            if n < 0:
                raise ValueError(f"corrupt .ser file {path}")
            if n == 0:
                break
            ks.append(kb[:n].copy())
            cs.append(cb[:n].copy())
            ts.append(tb[:n].copy())
    finally:
        lib.serr_close(h)
    cat = (lambda parts, dt: np.concatenate(parts) if parts
           else np.zeros(0, dt))
    return (m, cat(ks, np.uint64), cat(cs, np.int64), cat(ts, np.uint8))


def write_ser(
    path: str,
    keys: np.ndarray,
    counts: np.ndarray,
    qb: int,
    key_bits: int,
    traveled: np.ndarray | None = None,
    seed: int = DEFAULT_SEED,
    nelts: int | None = None,
    ndistinct: int | None = None,
) -> CqfMeta:
    """Serialize sorted (key, count) arrays into a reference .ser file.

    Dispatches to the streaming native writer when available (O(1) memory
    beyond the arrays); the pure-numpy fallback below is the validated
    specification both implementations must match byte-for-byte."""
    try:
        return write_ser_native(path, keys, counts, qb, key_bits,
                                traveled, seed, nelts, ndistinct)
    except RuntimeError:
        pass
    return write_ser_py(path, keys, counts, qb, key_bits, traveled, seed,
                        nelts, ndistinct)


def write_ser_py(
    path: str,
    keys: np.ndarray,
    counts: np.ndarray,
    qb: int,
    key_bits: int,
    traveled: np.ndarray | None = None,
    seed: int = DEFAULT_SEED,
    nelts: int | None = None,
    ndistinct: int | None = None,
) -> CqfMeta:
    """Pure-numpy writer (the executable specification)."""
    keys = np.asarray(keys, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.int64)
    if traveled is None:
        traveled = np.zeros(len(keys), dtype=np.uint8)
    if len(keys) and not (keys[:-1] < keys[1:]).all():
        raise ValueError("keys must be strictly increasing")

    # nelts/ndistinct_elts mirror the runtime counters copied into metadata
    # before save (CQF_mt.h:991-994); noccupied_slots is never maintained by
    # the reference (all updates commented out, gqf.c:1097,1336,...) so real
    # files carry 0 there.
    m = CqfMeta(seed=seed, nslots=1 << qb, key_bits=key_bits,
                nelts=int(counts.sum()) if nelts is None else nelts,
                ndistinct_elts=len(keys) if ndistinct is None else ndistinct)
    bps = m.bits_per_slot
    if not (1 < bps <= 56):
        raise NotImplementedError(
            f"bits_per_slot={bps} out of the supported 2..56 range "
            f"(reference default is hb = qb + 8 -> 8-bit slots)")

    buckets = (keys >> np.uint64(bps)).astype(np.int64)
    rems = (keys & np.uint64((1 << bps) - 1)).astype(np.int64)

    # --- per-entry encodings -------------------------------------------------
    # Vectorized for count==1 and 2..2^(bps-1); rare huge counts via python.
    msb = 1 << (bps - 1)
    d0 = counts - 1
    enc_len = np.where(counts == 1, 1, np.where(d0 < msb, np.where(d0 > rems, 3, 2), -1))
    big = enc_len < 0
    big_encs = {}
    if big.any():
        for idx in np.flatnonzero(big):
            e = encode_counter(int(rems[idx]), int(counts[idx]), bps)
            big_encs[int(idx)] = e
            enc_len[idx] = len(e)

    # --- run layout ----------------------------------------------------------
    occ_buckets, first_idx = np.unique(buckets, return_index=True)
    run_len = np.add.reduceat(enc_len, first_idx) if len(keys) else np.array([], np.int64)
    s = np.cumsum(run_len)  # inclusive
    s_prev = np.concatenate([[0], s[:-1]])
    # end_j = s_j - 1 + running_max(bucket_j - s_{j-1})
    run_end_pos = s - 1 + np.maximum.accumulate(occ_buckets - s_prev)
    run_start = run_end_pos - run_len + 1

    total_slots = int(run_end_pos[-1]) + 1 if len(keys) else 0
    if total_slots > m.xnslots:
        raise ValueError(f"CQF overflow: needs {total_slots} slots, has {m.xnslots}")

    # --- fill slot values ----------------------------------------------------
    slots = np.zeros(m.nblocks * SLOTS_PER_BLOCK, dtype=np.int64)
    # entry start position: run_start of its bucket + cumsum of enc_len within run
    entry_run = np.searchsorted(occ_buckets, buckets)
    within = np.cumsum(enc_len) - enc_len - s_prev[entry_run]
    entry_start = run_start[entry_run] + within

    ones = counts == 1
    slots[entry_start[ones]] = rems[ones]
    two = (counts > 1) & (d0 < msb) & (d0 <= rems)
    slots[entry_start[two]] = rems[two]
    slots[entry_start[two] + 1] = d0[two]
    three = (counts > 1) & (d0 < msb) & (d0 > rems)
    slots[entry_start[three]] = rems[three]
    slots[entry_start[three] + 1] = 0
    slots[entry_start[three] + 2] = d0[three]
    for idx, e in big_encs.items():
        st = int(entry_start[idx])
        slots[st : st + len(e)] = e

    # --- metadata bitplanes --------------------------------------------------
    nbits = m.nblocks * SLOTS_PER_BLOCK
    occupieds = np.zeros(nbits, dtype=bool)
    runends = np.zeros(nbits, dtype=bool)
    travbits = np.zeros(nbits, dtype=bool)
    occupieds[occ_buckets] = True
    runends[run_end_pos] = True
    travbits[entry_start[np.asarray(traveled, bool)]] = True

    # --- block offsets -------------------------------------------------------
    # offset_i = max(0, run_end(64i-1) - (64i-1)) where run_end(x) looks at
    # the run of the last occupied bucket <= x (block_offset_strict,
    # gqf.c:598-601); block 0 is always 0.  run_end_pos is nondecreasing, so
    # the last run covering x is simply the last occupied bucket <= x.
    offsets = np.zeros(m.nblocks, dtype=np.int64)
    if len(keys):
        x = np.arange(1, m.nblocks, dtype=np.int64) * SLOTS_PER_BLOCK - 1
        j = np.searchsorted(occ_buckets, x, side="right") - 1
        e = np.where(j >= 0, run_end_pos[np.maximum(j, 0)], -1)
        offsets[1:] = np.maximum(0, e - x)
    offsets = np.minimum(offsets, 255)

    # --- write ---------------------------------------------------------------
    occ64 = np.packbits(occupieds.reshape(-1, 64), axis=1, bitorder="little")
    run64 = np.packbits(runends.reshape(-1, 64), axis=1, bitorder="little")
    trv64 = np.packbits(travbits.reshape(-1, 64), axis=1, bitorder="little")
    blocks = np.zeros((m.nblocks, m.block_bytes), dtype=np.uint8)
    blocks[:, 0] = offsets.astype(np.uint8)
    blocks[:, 1:9] = occ64
    blocks[:, 9:17] = run64
    blocks[:, 17:25] = trv64
    if bps == 8:
        blocks[:, 25:] = slots.reshape(m.nblocks, SLOTS_PER_BLOCK)
    else:
        # generic width: LSB-first contiguous bit packing, matching the
        # reference's runtime get_slot/set_slot shift arithmetic
        # (gqf.c BITS_PER_SLOT==0 path)
        bits = ((slots[:, None] >> np.arange(bps)) & 1).astype(np.uint8)
        blocks[:, 25:] = np.packbits(
            bits.reshape(m.nblocks, SLOTS_PER_BLOCK * bps),
            axis=1, bitorder="little")

    with open(path, "wb") as f:
        f.write(_pack_metadata(m))
        f.write(blocks.tobytes())
    return m


def read_ser(path: str):
    """Parse a reference .ser file -> (meta, keys, counts, traveled).

    Dispatches to the streaming native reader when available; the numpy
    fallback below is the validated specification."""
    try:
        return read_ser_native(path)
    except RuntimeError:
        pass
    return read_ser_py(path)


def read_ser_py(path: str):
    """Pure-numpy reader (the executable specification)."""
    with open(path, "rb") as f:
        m = _unpack_metadata(f.read(METADATA_BYTES))
        raw = np.frombuffer(f.read(m.size), dtype=np.uint8)
    bps = m.bits_per_slot
    if not (1 < bps <= 56):
        raise NotImplementedError(
            f"bits_per_slot={bps} out of the supported 2..56 range "
            f"(reference default is hb = qb + 8 -> 8-bit slots)")
    blocks = raw.reshape(m.nblocks, m.block_bytes)
    occupieds = np.unpackbits(blocks[:, 1:9], axis=1, bitorder="little").reshape(-1).astype(bool)
    runends = np.unpackbits(blocks[:, 9:17], axis=1, bitorder="little").reshape(-1).astype(bool)
    travbits = np.unpackbits(blocks[:, 17:25], axis=1, bitorder="little").reshape(-1).astype(bool)
    if bps == 8:
        slots = blocks[:, 25:].reshape(-1).astype(np.int64)
    else:
        bits = np.unpackbits(blocks[:, 25:], axis=1, bitorder="little")
        slots = bits.reshape(-1, bps).astype(np.int64) @ \
            (np.int64(1) << np.arange(bps, dtype=np.int64))

    occ_buckets = np.flatnonzero(occupieds)
    end_pos = np.flatnonzero(runends)
    if len(occ_buckets) != len(end_pos):
        raise ValueError("corrupt CQF: occupied/runend count mismatch")

    keys, counts, traveled = [], [], []
    prev_end = -1
    for b, e in zip(occ_buckets.tolist(), end_pos.tolist()):
        start = max(b, prev_end + 1)
        entries = decode_run(slots[start : e + 1], bps)
        pos = start
        for rem, cnt in entries:
            keys.append((b << bps) | rem)
            counts.append(cnt)
            traveled.append(bool(travbits[pos]))
            pos += len(encode_counter(rem, cnt, bps))
        prev_end = e
    return (
        m,
        np.array(keys, dtype=np.uint64),
        np.array(counts, dtype=np.int64),
        np.array(traveled, dtype=np.uint8),
    )
