"""Native C++ reader vs Python reader: identical batch streams."""

import gzip
import os

import numpy as np
import pytest

from sh_assembly_tpu.io import fastq as pyfastq
from sh_assembly_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native reader not built")


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def collect_rows(stream):
    rows = []
    for b in stream:
        for i in range(b.n_rows):
            rows.append(bytes(b.codes[i, : b.lengths[i]]))
    return sorted(rows)


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, rng, gz):
    from oracle import random_reads

    k = 21
    reads = random_reads(rng, 300, 120, n_rate=0.01)
    reads += ["N" * 8 + random_reads(rng, 1, 90)[0]]
    reads += [random_reads(rng, 1, 700)[0]]  # long read, tiling path
    path = str(tmp_path / "r.fastq")
    write_fastq(path, reads)
    if gz:
        gzpath = path + ".gz"
        with open(path, "rb") as f, gzip.open(gzpath, "wb") as g:
            g.write(f.read())
        path = gzpath

    py_rows = collect_rows(
        pyfastq.batches_from_files([path], k, "auto", 64, 96))
    nat_rows = collect_rows(
        native.batches_from_files([path], k, "auto", 64, 96))
    assert py_rows == nat_rows
    assert len(py_rows) > 300


def test_native_fasta(tmp_path, rng):
    from oracle import random_reads

    k = 15
    seqs = random_reads(rng, 20, 200)
    path = str(tmp_path / "g.fasta")
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            # wrap lines at 60
            for j in range(0, len(s), 60):
                f.write(s[j : j + 60] + "\n")
    py_rows = collect_rows(pyfastq.batches_from_files([path], k, "f", 16, 80))
    nat_rows = collect_rows(native.batches_from_files([path], k, "f", 16, 80))
    assert py_rows == nat_rows


def test_native_multifile_and_batchfill(tmp_path, rng):
    from oracle import random_reads

    k = 21
    paths = []
    all_reads = []
    for fi in range(3):
        reads = random_reads(rng, 120, 100)
        all_reads += reads
        p = str(tmp_path / f"f{fi}.fastq")
        write_fastq(p, reads)
        paths.append(p)
    # tiny batches force segment resume across next_batch calls
    py_rows = collect_rows(pyfastq.batches_from_files(paths, k, "f", 7, 64))
    nat_rows = collect_rows(native.batches_from_files(paths, k, "f", 7, 64))
    assert py_rows == nat_rows


def test_native_missing_file(tmp_path):
    with pytest.raises(IOError):
        list(native.batches_from_files([str(tmp_path / "nope.fastq")], 21))
