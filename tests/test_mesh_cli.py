"""User-reachable mesh path: --mesh CLIs and the parallel.driver flows on
the 8-device virtual CPU mesh, checked exactly against the oracle."""

import numpy as np
import pytest

from sh_assembly_tpu import config as cfg
from sh_assembly_tpu.formats import cqf_ser
from sh_assembly_tpu.parallel import driver

from oracle import oracle_count, random_genome, reads_from_genome


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


@pytest.fixture
def dataset(tmp_path, rng):
    k = 21
    genome = random_genome(rng, 4000)
    reads = reads_from_genome(rng, genome, 1200, 80, error_rate=0.01)
    fq = tmp_path / "reads.fastq"
    write_fastq(fq, reads)
    lst = tmp_path / "ReadFiles.txt"
    lst.write_text("reads.fastq\n")
    return k, genome, reads, str(fq), str(lst), tmp_path


def sizing_for(k, qb=18):
    return cfg.CounterSizing(
        k=k, qb=qb, hb=qb + 8, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
        end_deNoise=False, fr=0.0)


def test_count_sharded_matches_oracle(dataset):
    k, genome, reads, fq, lst, d = dataset
    sizing = sizing_for(k)
    bc = cfg.BatchConfig(reads_per_batch=256, max_read_len=96)
    sc, spec_v, keys, counts, stats = driver.count_sharded(
        [fq], sizing, n_mesh=8, batch_cfg=bc, super_batch=2)
    oracle = oracle_count(reads, k, sizing.hb)
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == oracle
    assert stats["kmers"] == sum(oracle.values())


def test_contiger_sharded_from_counted_mesh(dataset):
    """counting -> sharded Contiger, packed native-format stream accepted."""
    k, genome, reads, fq, lst, d = dataset
    sizing = sizing_for(k)
    bc = cfg.BatchConfig(reads_per_batch=256, max_read_len=96)
    sc, spec_v, keys, counts, _ = driver.count_sharded(
        [fq], sizing, n_mesh=8, batch_cfg=bc, super_batch=2)
    params = cfg.ContigerParams(k=k, kmer_abundance_min=2)
    arrays = driver.contiger_sharded(sc, spec_v, [fq], params,
                                     batch_cfg=bc)
    assert arrays.n > 0
    # single-device reference
    from sh_assembly_tpu.models import contiger
    from sh_assembly_tpu.ops import spectrum as sp
    from sh_assembly_tpu.io import native

    capacity = 1 << max(int(len(keys)).bit_length(), 10)
    spec1 = sp.from_host(keys, counts, capacity, buf_capacity=1 << 10,
                         key_bits=sizing.hb)
    Lp = (bc.max_read_len + 7) // 8 * 8
    stream = native.packed_batches_from_files(
        [fq], k, "auto", bc.reads_per_batch, Lp)
    ref = contiger.assemble_unitigs_arrays(spec1, stream, params,
                                           key_bits=sizing.hb)

    def uset(au):
        from sh_assembly_tpu.utils import dna
        out = set()
        for i in range(au.n):
            s = au.seq(i)
            out.add(dna.canonical(s))
        return out

    assert uset(arrays) == uset(ref)


def test_cqf_denoise_cli_mesh(dataset):
    """--mesh 8 end to end: CLI writes a .ser identical to the
    single-device CLI's."""
    from sh_assembly_tpu.cli import cqf_denoise

    k, genome, reads, fq, lst, d = dataset
    n_kmers = sum(max(len(r) - k + 1, 0) for r in reads)
    out1 = str(d / "single.ser")
    out8 = str(d / "mesh.ser")
    args = ["-k", str(k), "-n", "20000", "-N", str(n_kmers), "-e", "0.01",
            "--deNoise", "0", "-i", lst]
    assert cqf_denoise.main(args + ["-o", out1]) == 0
    assert cqf_denoise.main(args + ["-o", out8, "--mesh", "8"]) == 0
    assert open(out1, "rb").read() == open(out8, "rb").read()
