"""Hot-loop parity: our whole counting CLI vs the COMPILED reference path.

tests/ref_harness/ref_count.cpp drives the reference's own nthash.hpp
rolling hash + gqf.c insert1_advance with reads_to_kmers semantics
(/root/reference/cqf/CQF_mt.h:610-731, t=1) on a FASTQ and qf_serialize's
the filter; cli.cqf_denoise must produce a byte-identical .ser — hashing,
N-handling, counting, deNoise sweep, metadata bookkeeping, sizing, and
serialization all at once.
"""

import os
import subprocess

import numpy as np
import pytest

REF_CQF = "/root/reference/cqf"
REF_BASE = "/root/reference/base"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "ref_harness",
                           "ref_count.cpp")


@pytest.fixture(scope="module")
def ref_count(tmp_path_factory):
    exe = tmp_path_factory.mktemp("refhot") / "ref_count"
    r = subprocess.run(
        ["g++", "-O1", "-std=c++11", f"-I{REF_CQF}", f"-I{REF_BASE}",
         "-x", "c++", f"{REF_CQF}/gqf.c",
         "-x", "c++", HARNESS_SRC, "-o", str(exe), "-lm", "-lpthread"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference harness unavailable: {r.stderr[:300]}")
    return str(exe)


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    """Synthetic FASTQ: 30x coverage, substitution errors, Ns, both strands."""
    d = tmp_path_factory.mktemp("hotloop")
    rng = np.random.default_rng(42)
    bases = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    genome = "".join(bases[i] for i in rng.integers(0, 4, size=8000))
    fq = d / "reads.fastq"
    with open(fq, "w") as f:
        for i in range(1200):
            s = int(rng.integers(0, len(genome) - 80))
            seq = list(genome[s:s + 80])
            for j in range(80):
                r = rng.random()
                if r < 0.01:
                    seq[j] = bases[int(rng.integers(0, 4))]
                elif r < 0.013:
                    seq[j] = "N"
            if rng.random() < 0.5:
                seq = [comp[c] for c in reversed(seq)]
            f.write(f"@r{i}\n{''.join(seq)}\n+\n{'I' * 80}\n")
    with open(d / "ReadFiles.txt", "w") as f:
        f.write("reads.fastq\n")
    return d


@pytest.mark.parametrize("end_denoise", [False, True])
def test_ser_byte_identical_to_reference_hot_loop(ref_count, workload,
                                                  tmp_path, end_denoise):
    from sh_assembly_tpu import config as cfg
    from sh_assembly_tpu.cli import cqf_denoise

    k, n_true, total = 28, 8000, 64000
    sizing = cfg.size_counter(k=k, n_true_kmers=n_true, total_kmers=total,
                              alpha=0.012, num_deNoise=0,
                              end_deNoise=end_denoise)

    ref_ser = tmp_path / "ref.ser"
    args = [ref_count, str(sizing.qb), str(sizing.hb), str(k), str(ref_ser)]
    if end_denoise:
        args.append("--endDeNoise")
    with open(workload / "reads.fastq", "rb") as f:
        subprocess.run(args, stdin=f, check=True, capture_output=True)

    our_ser = tmp_path / "ours.ser"
    argv = ["-k", str(k), "-n", str(n_true), "-N", str(total),
            "-e", "0.012", "--deNoise", "0",
            "-i", str(workload / "ReadFiles.txt"), "-o", str(our_ser)]
    if end_denoise:
        argv.append("--endDeNoise")
    assert cqf_denoise.main(argv) == 0

    ref_bytes = open(ref_ser, "rb").read()
    our_bytes = open(our_ser, "rb").read()
    assert len(ref_bytes) == len(our_bytes)
    assert ref_bytes == our_bytes
