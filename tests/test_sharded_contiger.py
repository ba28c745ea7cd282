"""Sharded Contiger on a virtual mesh == single-device Contiger."""

import numpy as np
import pytest

import jax

from sh_assembly_tpu import config as cfg
from sh_assembly_tpu.io import fastq
from sh_assembly_tpu.models import contiger, counter
from sh_assembly_tpu.parallel import sharded, sharded_contiger

from oracle import random_genome, reads_from_genome
from unitig_oracle import oracle_unitigs
from sh_assembly_tpu.utils import dna

K = 21
QB = 12  # key_bits = 20


def _batchify(reads, B, L):
    batcher = fastq.Batcher(K, B, L)
    out = []
    for r in reads:
        out.extend(batcher.add_read(r))
    out.extend(batcher.flush())
    return out


def _pad_batches(batches, B):
    """Equal-row batches (the sharded path wants a fixed geometry)."""
    out = []
    for b in batches:
        codes = b.codes
        lengths = b.lengths
        if codes.shape[0] < B:
            codes = np.pad(codes, ((0, B - codes.shape[0]), (0, 0)),
                           constant_values=5)
            lengths = np.pad(lengths, (0, B - len(lengths)))
        out.append(fastq.Batch(codes=codes, lengths=lengths,
                               n_rows=codes.shape[0]))
    return out


@pytest.mark.parametrize("n_shards", [4, 8])
def test_sharded_contiger_matches_single_device(rng, n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    genome = random_genome(rng, 2500)
    reads = reads_from_genome(rng, genome, 700, 72, error_rate=0.015)
    B, L = 32, 80
    batches = _pad_batches(_batchify(reads, B, L), B)

    # sharded spectrum
    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(n_shards), k=K, key_bits=QB + 8,
        local_capacity=8192, local_buf_capacity=8192)
    spec_v = sc.init()
    step = sc.step_fn()
    merge = sc.merge_fn()
    for b in batches:
        codes, lengths = sc.shard_batch(b.codes, b.lengths)
        spec_v = step(spec_v, codes, lengths)
        spec_v = merge(spec_v)

    params = cfg.ContigerParams(k=K, kmer_abundance_min=2)
    arrays = sharded_contiger.assemble_unitigs_sharded(
        sc, spec_v, batches, params)
    got = {dna.canonical(arrays.seq(i)) for i in range(arrays.n)}

    # single-device reference path on the same reads
    sizing = cfg.CounterSizing(
        k=K, qb=QB, hb=QB + 8, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
        end_deNoise=False, fr=0.0)
    bc = cfg.BatchConfig(reads_per_batch=B, max_read_len=L)
    spec1, _ = counter.build_spectrum(
        iter(batches), sizing, capacity=1 << 15, buf_capacity=1 << 15,
        batch_cfg=bc)
    graph = contiger.assemble_unitigs(spec1, iter(batches), params,
                                      key_bits=QB + 8)
    expect = {dna.canonical(u.seq) for u in graph.unitigs}

    assert got == expect
    assert len(got) > 1


def test_sharded_contiger_solid_filter(rng):
    # key_bits=28 here: at QB=12 the tiny hash range conflates genome_b
    # k-mers with high-count genome_a k-mers (reference-faithful collision
    # behavior) and legitimately seeds B's component
    qb = 20
    n_shards = 4
    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    genome_a = random_genome(rng, 1200)
    genome_b = random_genome(rng, 400)
    reads = reads_from_genome(rng, genome_a, 500, 72)
    reads += [genome_b] * 3
    B, L = 32, 80
    batches = _pad_batches(_batchify(reads, B, L), B)

    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(n_shards), k=K, key_bits=qb + 8,
        local_capacity=8192, local_buf_capacity=8192)
    spec_v = sc.init()
    step = sc.step_fn()
    merge = sc.merge_fn()
    for b in batches:
        codes, lengths = sc.shard_batch(b.codes, b.lengths)
        spec_v = step(spec_v, codes, lengths)
        spec_v = merge(spec_v)

    params = cfg.ContigerParams(k=K, kmer_abundance_min=2,
                                solid_kmer_abundance_min=5)
    arrays = sharded_contiger.assemble_unitigs_sharded(
        sc, spec_v, batches, params)
    for i in range(arrays.n):
        s = arrays.seq(i)
        assert s not in genome_b and dna.revcomp(s) not in genome_b
    assert arrays.n > 0
