"""End-to-end assembly-quality gate — the closest achievable form of
BASELINE config 4 (reads -> contigs through all three stages) without the
external Minia binary (/root/reference/README.md:133-139; the reference's
own intended check is src/compare_contigs.cpp).

A 1 Mbp synthetic genome is sequenced at 30x with 0.3% substitution
errors on both strands; the full pipeline (CQF-deNoise counting ->
Contiger -> array simplification) must produce contigs that
  * align exactly to the genome (strand-insensitive substring) — every
    error-induced tip/bubble must have been removed, and
  * reconstruct nearly all of it (total aligned bases, N50 floor).
A random 1 Mbp genome has essentially no k=28 repeats, so near-complete
reconstruction is the correct expectation, not an optimistic one.
"""

import os

import numpy as np
import pytest

BASES = np.frombuffer(b"ACGT", np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}


def _revcomp(s: str) -> str:
    return s.translate({65: 84, 67: 71, 71: 67, 84: 65})[::-1]


def _write_reads(path, genome, n_reads, read_len, err, rng):
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    rows = genome[starts[:, None] + np.arange(read_len)].copy()
    # substitution errors: shift by 1-3 mod 4 so the base always changes
    emask = rng.random(rows.shape) < err
    rows[emask] = (rows[emask] + rng.integers(1, 4, size=int(emask.sum()))) % 4
    chars = BASES[rows]
    # reverse-complement half the reads (real libraries are unstranded)
    flip = rng.random(n_reads) < 0.5
    chars[flip] = np.frombuffer(b"TGCA", np.uint8)[rows[flip]][:, ::-1]
    qual = b"I" * read_len
    with open(path, "wb") as f:
        for i in range(n_reads):
            f.write(b"@r%d\n" % i)
            f.write(chars[i].tobytes())
            f.write(b"\n+\n%s\n" % qual)


@pytest.fixture(scope="module")
def assembled(tmp_path_factory):
    from sh_assembly_tpu.cli import pipeline

    d = tmp_path_factory.mktemp("asm_quality")
    rng = np.random.default_rng(2038074761)
    G = 1_000_000
    read_len, cov, err, k = 100, 30, 0.003, 28
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    n_reads = G * cov // read_len
    _write_reads(d / "reads.fastq", genome, n_reads, read_len, err, rng)
    (d / "ReadFiles.txt").write_text("reads.fastq\n")
    total_kmers = n_reads * (read_len - k + 1)
    rc = pipeline.main([
        "-k", str(k), "-i", str(d / "ReadFiles.txt"),
        "-n", str(G), "-N", str(total_kmers), "-e", str(err),
        "-s", "3",
        "-o", str(d / "contigs.fa"), "--unitigs", str(d / "unitigs.fa"),
        "--genome-size", str(G),
    ])
    assert rc == 0
    seqs = []
    with open(d / "contigs.fa") as f:
        cur = []
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
        if cur:
            seqs.append("".join(cur))
    gs = "".join("ACGT"[b] for b in genome)
    return genome, gs, seqs, k


def test_every_contig_aligns_exactly(assembled):
    """No error k-mer survives into any contig: each contig is a perfect
    strand-insensitive substring of the genome."""
    _, gs, seqs, k = assembled
    assert seqs, "pipeline produced no contigs"
    bad = [s for s in seqs if s not in gs and _revcomp(s) not in gs]
    assert not bad, (
        f"{len(bad)}/{len(seqs)} contigs do not align exactly; "
        f"first bad length={len(bad[0])}")


def test_reconstruction_quality(assembled):
    """Coverage and contiguity: the contigs tile nearly the whole genome
    and the N50 shows real contiguity (not k-mer-sized fragments)."""
    genome, gs, seqs, k = assembled
    G = len(genome)
    covered = np.zeros(G, bool)
    for s in seqs:
        t = s if s in gs else _revcomp(s)
        start = gs.find(t)
        while start != -1:
            covered[start:start + len(t)] = True
            start = gs.find(t, start + 1)
    frac = covered.mean()
    assert frac >= 0.95, f"only {frac:.1%} of the genome is covered"

    lens = sorted((len(s) for s in seqs), reverse=True)
    half = sum(lens) / 2
    acc = 0
    n50 = 0
    for ln in lens:
        acc += ln
        if acc >= half:
            n50 = ln
            break
    # an error-free assembly of a random 1 Mbp genome at 30x yields
    # N50 in the tens of kb; anything under 10 kb means simplification
    # left the graph shattered
    assert n50 >= 10_000, f"N50 {n50} too low"


def test_no_tiny_artifacts(assembled):
    """Tip clipping removed the k-scale fragments (reference behavior:
    Minia drops tips shorter than ~2k)."""
    _, _, seqs, k = assembled
    tiny = [s for s in seqs if len(s) < k + 2]
    assert not tiny, f"{len(tiny)} sub-k+2 contigs survived simplification"
