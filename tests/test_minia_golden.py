"""Stage-3 golden: the full pipeline's contig output is FROZEN.

The reference hands unitigs to an external customized Minia for graph
simplification (/root/reference/README.md:133-139); our in-framework
stage (models/simplify*) replaces it.  This test pins the end-to-end
semantics two ways:

1. ANALYTIC verification (the provenance of the golden): on a synthetic
   20 kb genome at 30x with 0.5% errors, every emitted contig must align
   to the genome EXACTLY (substring of the genome or its reverse
   complement) — i.e. simplification removed every error artifact — and
   the contigs must cover >= 95% of the genome with N50 >= 2 kb.

2. GOLDEN freeze: the canonical contig multiset's sha256 must equal the
   value in tests/golden/minia_small.json (written by this test on first
   run, then frozen in git).  Any change to counting, unitig
   construction, or simplification that alters the output set fails here
   and must consciously re-freeze.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from oracle import random_genome, reads_from_genome
from sh_assembly_tpu.utils import dna

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "minia_small.json")


def _canonical_contigs(path):
    seqs = []
    with open(path) as f:
        cur = []
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line)
        if cur:
            seqs.append("".join(cur))
    return sorted(dna.canonical(s) for s in seqs)


def test_pipeline_contigs_match_golden(tmp_path):
    k = 28
    rng = np.random.default_rng(20260821)
    genome = random_genome(rng, 20_000)
    reads = reads_from_genome(rng, genome, 6000, 100, error_rate=0.005)

    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    lst = tmp_path / "ReadFiles.txt"
    lst.write_text("reads.fastq\n")

    from sh_assembly_tpu.cli import pipeline as pipe

    contigs_fa = tmp_path / "contigs.fa"
    total = len(reads) * (100 - k + 1)
    pipe.main(["-k", str(k), "-i", str(lst), "-n", "20000",
               "-N", str(total), "-e", "0.005", "--deNoise", "0",
               "-o", str(contigs_fa),
               "--unitigs", str(tmp_path / "unitigs.fa")])

    contigs = _canonical_contigs(str(contigs_fa))
    assert contigs, "pipeline produced no contigs"

    # ---- analytic provenance: exact alignment + coverage + N50 ----------
    covered = np.zeros(len(genome), bool)
    grc = dna.revcomp(genome)
    for s in contigs:
        pos = genome.find(s)
        if pos < 0:
            rpos = grc.find(s)
            assert rpos >= 0, (
                f"contig of length {len(s)} is not an exact genome "
                f"substring — simplification left an error artifact")
            pos = len(genome) - rpos - len(s)
        covered[pos : pos + len(s)] = True
    coverage = covered.mean()
    assert coverage >= 0.95, f"genome coverage {coverage:.3f} < 0.95"
    lens = sorted((len(s) for s in contigs), reverse=True)
    acc, n50 = 0, 0
    for ln in lens:
        acc += ln
        if acc * 2 >= sum(lens):
            n50 = ln
            break
    assert n50 >= 2000, f"N50 {n50} < 2000"

    # ---- golden freeze ---------------------------------------------------
    digest = hashlib.sha256("\n".join(contigs).encode()).hexdigest()
    summary = {
        "sha256": digest,
        "n_contigs": len(contigs),
        "total_bp": int(sum(lens)),
        "n50": int(n50),
        "provenance": (
            "deterministic 20kb genome (seed 20260821), 6000x100bp reads "
            "at 0.5% error, k=28, deNoise=0; every contig verified an "
            "exact genome substring in-test (see analytic section)"),
    }
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(summary, f, indent=1)
        pytest.skip("golden written on first run; commit it to freeze")
    want = json.load(open(GOLDEN))
    assert digest == want["sha256"], (
        f"contig set changed: {len(contigs)} contigs, {sum(lens)} bp, "
        f"N50 {n50} (golden: {want['n_contigs']} contigs, "
        f"{want['total_bp']} bp, N50 {want['n50']}); if intentional, "
        f"delete tests/golden/minia_small.json and re-freeze")
