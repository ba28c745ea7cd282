"""Vectorized simplification (simplify_arrays.ArrayGraph) vs the
object-graph oracle (simplify.SimpleGraph)."""

import time

import numpy as np
import pytest

from sh_assembly_tpu.models import simplify, simplify_arrays
from sh_assembly_tpu.models.contiger import Unitig, UnitigGraph
from sh_assembly_tpu.utils import dna

from oracle import random_genome, reads_from_genome
from test_simplify import make_graph, overlap_chain
from test_simplify_fixtures import bubble_graph, tip_graph


def canon_contigs(contigs):
    """Order/strand-insensitive contig multiset."""
    return sorted(dna.canonical(c.seq) for c in contigs)


def both(g, passes="simplify"):
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    return sg, ag


# ---------------------------------------------------------------------------
# unit passes mirror the object-graph tests


def test_compact_merges_simple_chain(rng):
    k = 15
    seqs = overlap_chain(rng, k, 3, [40, 50, 60])
    g = make_graph(k, seqs, [10, 12, 14],
                   after=[[2], [3], []], before=[[], [-1], [-2]])
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    ag.compact()
    assert ag.n == 1
    merged = ag.contigs()[0].seq
    expect = seqs[0] + seqs[1][k - 1:] + seqs[2][k - 1:]
    assert merged in (expect, dna.revcomp(expect))


def test_tip_clipping(rng):
    k = 15
    s0, s1 = overlap_chain(rng, k, 2, [60, 200])
    tip = s0[-(k - 1):] + random_genome(rng, 5)
    g = make_graph(
        k, [s0, s1, tip], [20, 20, 2],
        after=[[2, 3], [], []],
        before=[[], [-1], [-1]],
    )
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    n = ag.clip_tips()
    assert n == 1 and not ag.alive[2]
    ag.compact()
    assert ag.n == 1


def test_bubble_popping(rng):
    k = 15
    s0 = random_genome(rng, 60)
    mid1 = s0[-(k - 1):] + random_genome(rng, 20)
    mid2 = s0[-(k - 1):] + random_genome(rng, 20)
    s3 = random_genome(rng, 80)
    g = make_graph(
        k, [s0, mid1, mid2, s3], [30, 25, 3, 30],
        after=[[2, 3], [4], [4], []],
        before=[[], [-1], [-1], [-2, -3]],
    )
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    n = ag.pop_bubbles()
    assert n == 1
    assert ag.alive[1] and not ag.alive[2]


def test_ec_removal(rng):
    k = 15
    g = make_graph(
        k,
        [random_genome(rng, 300), random_genome(rng, 30),
         random_genome(rng, 300)],
        [50, 2, 60],
        after=[[2], [3], []],
        before=[[], [-1], [-2]],
    )
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    n = ag.remove_erroneous_connections()
    assert n == 1 and not ag.alive[1]


# ---------------------------------------------------------------------------
# threshold fixtures must agree with the pinned gatb constants


@pytest.mark.parametrize("tip_nk,tip_cov,sib_cov,clipped", [
    (25, 50.0, 50.0, True),    # topo bound
    (26, 49.0, 50.0, False),   # above topo, strong
    (26, 24.0, 50.0, True),    # RCTC weak
    (26, 25.0, 50.0, False),   # exact ratio kept (strict <)
    (101, 1.0, 50.0, False),   # beyond RCTC length bound
    (100, 1.0, 50.0, True),
])
def test_tip_thresholds_match_object_graph(tip_nk, tip_cov, sib_cov, clipped):
    g = tip_graph(tip_nk=tip_nk, tip_cov=tip_cov, sib_cov=sib_cov)
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    ag.clip_tips()
    assert bool(~ag.alive[1]) == clipped


@pytest.mark.parametrize("blen,cov_a,cov_b,popped", [
    (130, 30.0, 5.0, True),    # within 3k+100 bound
    (131, 30.0, 5.0, False),   # just beyond
])
def test_bubble_thresholds_match_object_graph(blen, cov_a, cov_b, popped):
    g = bubble_graph(blen, cov_a, cov_b)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(g)
    sg.pop_bubbles()
    ag.pop_bubbles()
    assert list(map(bool, ag.alive)) == sg.alive


# ---------------------------------------------------------------------------
# randomized end-to-end equivalence vs the object-graph implementation


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_graph_equivalence(seed):
    from test_contiger import build_all

    rng = np.random.default_rng(seed)
    k = 21
    genome = random_genome(rng, 3000)
    reads = reads_from_genome(rng, genome, 1400, 80, error_rate=0.012)
    graph, _ = build_all(reads, k)

    contigs_obj, stats_obj = simplify.simplify_to_contigs(graph)
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(graph)
    stats_arr = ag.simplify()
    contigs_arr = ag.contigs()

    co = canon_contigs(contigs_obj)
    ca = canon_contigs(contigs_arr)
    # the two formulations apply removals sequentially vs atomically per
    # pass (documented divergence, simplify_arrays module docstring) — they
    # must agree up to a couple of order-sensitive junction resolutions,
    # and exactly on aggregate assembly quality
    diff = set(co) ^ set(ca)
    assert len(diff) <= 4, (
        f"contig sets diverged by {len(diff)}: "
        f"stats obj={stats_obj} arr={stats_arr}")
    tot_o = sum(len(s) for s in co)
    tot_a = sum(len(s) for s in ca)
    assert abs(tot_o - tot_a) <= 0.02 * max(tot_o, tot_a)
    gk = {dna.canonical(genome[i:i + k])
          for i in range(len(genome) - k + 1)}

    def kmer_cov(contigs):
        ck = set()
        for c in contigs:
            for i in range(len(c.seq) - k + 1):
                ck.add(dna.canonical(c.seq[i:i + k]))
        return len(gk & ck) / len(gk)

    assert abs(kmer_cov(contigs_obj) - kmer_cov(contigs_arr)) < 0.02


def test_from_array_unitigs_matches_object_path(rng):
    """ArrayUnitigs -> ArrayGraph (the pipeline path, no Python objects)
    equals UnitigGraph -> ArrayGraph."""
    from sh_assembly_tpu import config as cfg
    from sh_assembly_tpu.io import fastq
    from sh_assembly_tpu.models import contiger, counter

    k = 21
    qb = 20
    genome = random_genome(rng, 2500)
    reads = reads_from_genome(rng, genome, 1100, 80, error_rate=0.01)
    sizing = cfg.CounterSizing(
        k=k, qb=qb, hb=qb + 8, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
        end_deNoise=False, fr=0.0)
    bc = cfg.BatchConfig(reads_per_batch=128, max_read_len=96)

    def stream():
        b = fastq.Batcher(k, bc.reads_per_batch, bc.max_read_len)
        for r in reads:
            yield from b.add_read(r)
        yield from b.flush()

    spec, _ = counter.build_spectrum(
        stream(), sizing, capacity=1 << 15, buf_capacity=1 << 15,
        batch_cfg=bc)
    params = cfg.ContigerParams(k=k, kmer_abundance_min=2)
    arrays = contiger.assemble_unitigs_arrays(spec, stream(), params,
                                              key_bits=qb + 8)

    ag1 = simplify_arrays.ArrayGraph.from_array_unitigs(arrays)
    ag2 = simplify_arrays.ArrayGraph.from_unitig_graph(arrays.to_graph())
    ag1.simplify()
    ag2.simplify()
    assert canon_contigs(ag1.contigs()) == canon_contigs(ag2.contigs())


def test_planted_features_vectorized(rng):
    """The planted bubble/tip scenario from test_simplify, via the
    vectorized path (quality contract of the Minia hand-off)."""
    from test_contiger import build_all

    k = 21
    genome = random_genome(rng, 3000)
    reads = reads_from_genome(rng, genome, 1300, 80)
    pos = 1500
    variant = genome[:pos] + ("A" if genome[pos] != "A" else "C") \
        + genome[pos + 1:]
    for s in range(pos - 60, pos + 1, 12):
        reads.append(variant[s:s + 80])
    junk = random_genome(rng, 30)
    for _ in range(3):
        reads.append(genome[760:800] + junk)

    graph, _ = build_all(reads, k)
    ag = simplify_arrays.ArrayGraph.from_unitig_graph(graph)
    stats = ag.simplify()
    contigs = ag.contigs()

    gk = {dna.canonical(genome[i:i + k]) for i in range(len(genome) - k + 1)}
    vk = {dna.canonical(variant[i:i + k])
          for i in range(pos - k + 1, pos + 1)} - gk
    ck = set()
    for c in contigs:
        for i in range(len(c.seq) - k + 1):
            ck.add(dna.canonical(c.seq[i:i + k]))
    assert stats["tips"] >= 1 and stats["bubbles"] >= 1
    assert not (ck & vk)
    assert len(gk & ck) / len(gk) > 0.95


# ---------------------------------------------------------------------------
# scale: the whole point of the vectorization


def test_scale_1e5_chain_with_tips():
    """10^5-unitig graph (long chains + hanging tips) simplifies in
    seconds — the object-graph version takes minutes at this size."""
    rng = np.random.default_rng(0)
    k = 31
    n_chain = 100_000
    n = 2 * n_chain  # chain node + tip per position
    lens = np.full(n, 40, np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    codes = rng.integers(0, 4, size=int(offsets[-1])).astype(np.uint8)
    cov = np.full(n, 30.0)
    cov[n_chain:] = 2.0  # weak tips
    after, before = [], []
    for i in range(n_chain):
        a = [i + 2] if i + 1 < n_chain else []  # chain i -> i+1
        a.append(n_chain + i + 1)  # tip hangs off every end
        after.append(a)
        before.append([-(i)] if i > 0 else [])
    for i in range(n_chain):
        after.append([])
        before.append([-(i + 1)])
    deg = np.zeros(2 * n, np.int64)
    deg[0::2] = [len(x) for x in after]
    deg[1::2] = [len(x) for x in before]
    row_ptr = np.zeros(2 * n + 1, np.int64)
    np.cumsum(deg, out=row_ptr[1:])
    row_val = np.empty(row_ptr[-1], np.int64)
    for i in range(n):
        row_val[row_ptr[2 * i]:row_ptr[2 * i + 1]] = after[i]
        row_val[row_ptr[2 * i + 1]:row_ptr[2 * i + 2]] = before[i]
    ag = simplify_arrays.ArrayGraph(
        k=k, seq_codes=codes, offsets=offsets, cov=cov,
        row_ptr=row_ptr, row_val=row_val, alive=np.ones(n, bool))
    t0 = time.time()
    ag.simplify()
    dt = time.time() - t0
    assert dt < 30.0, f"vectorized simplify too slow: {dt:.1f}s"
    # all tips clipped, chain fully recompacted
    assert ag.n <= 3
