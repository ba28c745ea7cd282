"""2-bit DNA base coding and sequence helpers.

Coding follows the reference convention A=0, C=1, G=2, T=3 (reference:
base/DNA_string.h:22-70); complement(code) = 3 - code.  Code 4 is used for
'N'/unknown bases: ntHash assigns them a zero seed (reference:
base/nthash.hpp seedN), so k-mers that contain an N *inside the first
window of a (sub)read* still hash, matching reads_to_kmers semantics
(reference: cqf/CQF_mt.h:610-731).  Code 5 marks padding.
"""

from __future__ import annotations

import numpy as np

A, C, G, T, N, PAD = 0, 1, 2, 3, 4, 5

# ASCII -> code lookup (uppercase + lowercase); everything else is N.
_ASCII2CODE = np.full(256, N, dtype=np.uint8)
for _ch, _code in (("A", A), ("C", C), ("G", G), ("T", T)):
    _ASCII2CODE[ord(_ch)] = _code
    _ASCII2CODE[ord(_ch.lower())] = _code

_CODE2ASCII = np.frombuffer(b"ACGTN.", dtype=np.uint8).copy()


def encode(seq: str | bytes) -> np.ndarray:
    """ASCII DNA -> uint8 codes (A=0,C=1,G=2,T=3,N=4)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _ASCII2CODE[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray) -> str:
    """uint8 codes -> ASCII DNA string."""
    return _CODE2ASCII[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement in code space; N maps to N."""
    codes = np.asarray(codes)
    comp = np.where(codes < 4, 3 - codes, codes)
    return comp[::-1]


def revcomp(seq: str) -> str:
    return decode(revcomp_codes(encode(seq)))


def canonical(seq: str) -> str:
    """Lexicographically smaller of seq and its reverse complement."""
    rc = revcomp(seq)
    return rc if rc < seq else seq


def pack_kmer(codes: np.ndarray) -> tuple[int, int]:
    """Pack k<=64 base codes into (hi, lo) 2-bit big-endian words.

    Base 0 occupies the most significant bits so that integer order equals
    lexicographic order.  For k <= 32 ``hi`` is always 0.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    k = len(codes)
    if k > 64:
        raise ValueError("pack_kmer supports k <= 64")
    val = 0
    for c in codes.tolist():
        if c >= 4:
            raise ValueError("cannot pack non-ACGT base")
        val = (val << 2) | int(c)
    val <<= 2 * (64 - k)
    return (val >> 64) & 0xFFFFFFFFFFFFFFFF, val & 0xFFFFFFFFFFFFFFFF


def unpack_kmer(hi: int, lo: int, k: int) -> np.ndarray:
    """Inverse of pack_kmer."""
    val = (int(hi) << 64) | int(lo)
    val >>= 2 * (64 - k)
    out = np.empty(k, dtype=np.uint8)
    for i in range(k - 1, -1, -1):
        out[i] = val & 3
        val >>= 2
    return out


def is_palindrome(seq: str) -> bool:
    """seq equals its own reverse complement (reference: DNA_string.cpp:266)."""
    return seq == revcomp(seq)


def is_hairpin(seq: str, length: int = 0) -> bool:
    """First `length` bases read equal to the reverse complement of the
    last `length` (reference: DNA_string.cpp:273-304).  length=0 means
    half the sequence."""
    n = len(seq)
    if length == 0:
        length = n // 2
    if length > n // 2:
        raise ValueError("hairpin length exceeds half the sequence")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for x in range(length):
        if seq[x] != comp.get(seq[n - 1 - x], "N"):
            return False
    return True


def is_simple(seq: str) -> bool:
    """Single-base repeat (A|C|G|T)* (reference: DNA_string.cpp:306-341)."""
    return len(seq) > 0 and seq.count(seq[0]) == len(seq)


def murmur_hash2(data: bytes, seed: int = 0) -> int:
    """32-bit MurmurHash2 (reference: base/Hash.h:22-75) — the hash the
    reference's concurrent unitig map uses for DNAString keys
    (core/unitig_graph.h:52-93).  Kept for format/test parity; the TPU
    engine's maps are sorted arrays keyed by packed k-mer bits."""
    m = 0x5BD1E995
    r = 24
    length = len(data)
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length >= 4:
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
        length -= 4
    if length >= 3:
        h ^= data[i + 2] << 16
    if length >= 2:
        h ^= data[i + 1] << 8
    if length >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h
