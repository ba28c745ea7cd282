"""Pure-Python oracle implementing the reference pipeline semantics
(slow, dict-based) for parity testing the TPU engine against."""

from __future__ import annotations

import numpy as np

from sh_assembly_tpu.utils import dna, nthash


def oracle_count(reads: list[str], k: int, key_bits: int) -> dict[int, int]:
    """Exact reference counting semantics with deNoise=0.

    Implements reads_to_kmers (cqf/CQF_mt.h:610-731): canonical rolling
    ntHash, key = min(fh, rh) mod 2^key_bits, N-restart rule (N at offset
    >= k of the current sub-read restarts it; earlier Ns hash with seed 0).
    """
    mask = (1 << key_bits) - 1
    counts: dict[int, int] = {}

    def insert(fh, rh):
        key = int(min(fh, rh)) & mask
        counts[key] = counts.get(key, 0) + 1

    for read in reads:
        seq = read
        while True:
            if len(seq) < k:
                break
            codes = dna.encode(seq)
            fh, rh = nthash.fhash(codes[:k]), nthash.rhash(codes[:k])
            insert(fh, rh)
            restarted = False
            for i in range(k, len(seq)):
                if seq[i] == "N":
                    seq = seq[i + 1 :]
                    restarted = True
                    break
                fh, rh = nthash.roll_forward(fh, rh, codes[i - k], codes[i], k)
                insert(fh, rh)
            if not restarted:
                break
    return counts


def oracle_denoise(counts: dict[int, int]) -> dict[int, int]:
    """Singleton sweep: drop count==1 keys (qf_clean_singleton semantics)."""
    return {k: v for k, v in counts.items() if v >= 2}


def random_reads(rng: np.random.Generator, n: int, length: int,
                 n_rate: float = 0.0) -> list[str]:
    reads = []
    for _ in range(n):
        codes = rng.integers(0, 4, size=length)
        if n_rate:
            codes = np.where(rng.random(length) < n_rate, 4, codes)
        reads.append(dna.decode(codes.astype(np.uint8)))
    return reads


def reads_from_genome(rng: np.random.Generator, genome: str, n: int,
                      length: int, error_rate: float = 0.0) -> list[str]:
    """Sample reads uniformly from both strands of a genome."""
    reads = []
    G = len(genome)
    for _ in range(n):
        start = int(rng.integers(0, G - length + 1))
        seq = genome[start : start + length]
        if rng.random() < 0.5:
            seq = dna.revcomp(seq)
        if error_rate:
            codes = dna.encode(seq)
            err = rng.random(length) < error_rate
            shift = rng.integers(1, 4, size=length)
            codes = np.where(err & (codes < 4), (codes + shift) % 4, codes)
            seq = dna.decode(codes.astype(np.uint8))
        reads.append(seq)
    return reads


def random_genome(rng: np.random.Generator, length: int) -> str:
    return dna.decode(rng.integers(0, 4, size=length).astype(np.uint8))
