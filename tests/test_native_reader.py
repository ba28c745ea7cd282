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


def test_packed_path_matches_codes_path(tmp_path, rng):
    """The native packed stream must reproduce the exact window multiset of
    the codes stream (unpack(pack(x)) == x, and identical counting)."""
    from oracle import random_reads, oracle_count
    from sh_assembly_tpu.ops import packio
    import jax.numpy as jnp

    k = 21
    reads = random_reads(rng, 200, 100, n_rate=0.02)
    reads += [random_reads(rng, 1, 500)[0]]
    path = str(tmp_path / "r.fastq")
    write_fastq(path, reads)

    # the transport collapses N(4) and PAD(5) into one mask bit (both hash
    # with seed 0); normalize before comparing
    rows_codes = []
    for b in native.batches_from_files([path], k, "auto", 64, 96):
        c = np.where(b.codes >= 4, 5, b.codes).astype(np.uint8)
        for i in range(b.n_rows):
            rows_codes.append(bytes(c[i, : b.lengths[i]]))
    rows_packed = []
    for b in native.packed_batches_from_files([path], k, "auto", 64, 96):
        codes = np.asarray(packio.unpack(
            jnp.asarray(b.packed), jnp.asarray(b.nmask), b.row_len))
        for i in range(b.n_rows):
            rows_packed.append(bytes(codes[i, : b.lengths[i]]))
    assert sorted(rows_codes) == sorted(rows_packed)


def test_packed_path_counting_parity(tmp_path, rng):
    from oracle import random_reads, oracle_count
    from sh_assembly_tpu import config as cfg
    from sh_assembly_tpu.models import counter
    from sh_assembly_tpu.ops import spectrum as sp

    k, qb = 21, 20
    reads = random_reads(rng, 150, 100, n_rate=0.02)
    path = str(tmp_path / "r.fastq")
    write_fastq(path, reads)
    with open(str(tmp_path / "files.txt"), "w") as f:
        f.write(path + "\n")

    sizing = cfg.CounterSizing(
        k=k, qb=qb, hb=qb + 8, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
        end_deNoise=False, fr=0.0)
    bc = cfg.BatchConfig(reads_per_batch=64, max_read_len=104)
    spec, _ = counter.build_spectrum_from_files(
        [path], sizing, batch_cfg=bc, capacity=1 << 14,
        buf_capacity=1 << 14)
    keys, counts, _ = sp.to_host(spec, qb + 8)
    assert dict(zip(keys.tolist(), counts.tolist())) == \
        oracle_count(reads, k, qb + 8)


def test_native_bz2(tmp_path, rng):
    """Native .bz2 ingest (dlopen'd libbz2, cpp/fastq_reader.cpp) matches
    the Python reader; multi-stream files (pbzip2-style concatenation)
    decode fully.  Reference: getFileReader bzip2 path, CQF_mt.h:933-957."""
    import bz2

    from oracle import random_reads

    lib = native._load()
    if not getattr(lib, "shr_has_bz2", None) or lib.shr_has_bz2() != 1:
        pytest.skip("libbz2 not bindable at runtime")
    k = 21
    reads = random_reads(rng, 300, 120, n_rate=0.01)
    path = str(tmp_path / "r.fastq")
    write_fastq(path, reads)
    raw = open(path, "rb").read()
    bzpath = path + ".bz2"
    # two concatenated streams, split mid-record
    half = len(raw) // 2
    with open(bzpath, "wb") as f:
        f.write(bz2.compress(raw[:half]))
        f.write(bz2.compress(raw[half:]))

    py_rows = collect_rows(
        pyfastq.batches_from_files([bzpath], k, "auto", 64, 96))
    nat_rows = collect_rows(
        native.batches_from_files([bzpath], k, "auto", 64, 96))
    assert py_rows == nat_rows
    assert len(py_rows) >= 300
