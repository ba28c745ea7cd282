"""Graph simplification: tips, bubbles, EC removal, compaction, roundtrip."""

import numpy as np
import pytest

from sh_assembly_tpu.models import simplify
from sh_assembly_tpu.models.contiger import Unitig, UnitigGraph
from sh_assembly_tpu.utils import dna

from oracle import random_genome, reads_from_genome


def make_graph(k, seqs, covs, after, before):
    g = UnitigGraph(k=k)
    for s, c in zip(seqs, covs):
        g.unitigs.append(Unitig(seq=s, median_abundance=c))
    g.after = [list(x) for x in after]
    g.before = [list(x) for x in before]
    return g


def overlap_chain(rng, k, n, lens):
    """Build unitigs that chain with k-1 overlaps: u0 -> u1 -> ... -> un."""
    seqs = []
    prev_tail = random_genome(rng, k - 1)
    for L in lens:
        body = random_genome(rng, L - (k - 1))
        seqs.append(prev_tail + body)
        prev_tail = seqs[-1][-(k - 1):]
    return seqs


def test_compact_merges_simple_chain(rng):
    k = 15
    seqs = overlap_chain(rng, k, 3, [40, 50, 60])
    g = make_graph(k, seqs, [10, 12, 14],
                   after=[[2], [3], []], before=[[], [-1], [-2]])
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    sg.compact()
    alive = [i for i in range(3) if sg.alive[i]]
    assert len(alive) == 1
    merged = sg.seqs[alive[0]]
    expect = seqs[0] + seqs[1][k - 1 :] + seqs[2][k - 1 :]
    assert merged == expect


def test_tip_clipping(rng):
    k = 15
    # main path u0 -> u1; short tip u2 also hangs off u0's end
    s0, s1 = overlap_chain(rng, k, 2, [60, 200])
    tip = s0[-(k - 1):] + random_genome(rng, 5)  # 19 bases, 5 kmers
    g = make_graph(
        k, [s0, s1, tip], [20, 20, 2],
        after=[[2, 3], [], []],
        before=[[], [-1], [-1]],
    )
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    n = sg.clip_tips()
    assert n == 1 and not sg.alive[2]
    sg.compact()
    assert sum(sg.alive) == 1  # chain merged after tip removal


def test_bubble_popping(rng):
    k = 15
    # u0 -> (u1 | u2) -> u3; u1 and u2 same endpoints, u1 stronger
    s0 = random_genome(rng, 60)
    mid1 = s0[-(k - 1):] + random_genome(rng, 20)
    mid2 = s0[-(k - 1):] + random_genome(rng, 20)
    # both mids converge into s3
    s3head = random_genome(rng, k - 1)
    mid1 += s3head[: 0]  # keep lengths simple; links define the topology
    s3 = random_genome(rng, 80)
    g = make_graph(
        k, [s0, mid1, mid2, s3], [30, 25, 3, 30],
        after=[[2, 3], [4], [4], []],
        before=[[], [-1], [-1], [-2, -3]],
    )
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    n = sg.pop_bubbles()
    assert n == 1
    assert sg.alive[1] and not sg.alive[2]  # weaker branch removed


def test_ec_removal(rng):
    k = 15
    # strong u0 and u2 joined by a weak short connection u1
    g = make_graph(
        k,
        [random_genome(rng, 300), random_genome(rng, 30), random_genome(rng, 300)],
        [50, 2, 60],
        after=[[2], [3], []],
        before=[[], [-1], [-2]],
    )
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    n = sg.remove_erroneous_connections()
    assert n == 1 and not sg.alive[1]


def test_end_to_end_error_reads_produce_clean_contigs(rng):
    # full pipeline on error-laden reads: after simplification the assembly
    # should collapse to near the clean-genome contigs
    from test_contiger import build_all

    k = 21
    genome = random_genome(rng, 4000)
    reads = reads_from_genome(rng, genome, 1600, 80, error_rate=0.015)
    graph, _ = build_all(reads, k)
    n_before = len(graph.unitigs)
    contigs, stats = simplify.simplify_to_contigs(graph)
    assert len(contigs) <= n_before
    # contigs should cover most of the genome
    gk = {dna.canonical(genome[i : i + k]) for i in range(len(genome) - k + 1)}
    ck = set()
    for c in contigs:
        for i in range(len(c.seq) - k + 1):
            ck.add(dna.canonical(c.seq[i : i + k]))
    cov = len(gk & ck) / len(gk)
    assert cov > 0.9
    # and contain few error k-mers
    assert len(ck - gk) < 0.05 * len(ck)
    s = simplify.contig_stats(contigs, genome_size=len(genome))
    assert s["N50"] > 100


def test_planted_features_end_to_end(rng):
    """Structured synthetic genome with a planted SNP bubble, a planted
    chimeric tip, and clean coverage elsewhere: the full pipeline must pop
    the minor allele, clip the tip, and return to near-single-contig N50
    (the Minia hand-off contract, README.md:133-139)."""
    from test_contiger import build_all

    k = 21
    genome = random_genome(rng, 3000)
    reads = reads_from_genome(rng, genome, 1300, 80)  # ~35x clean

    # planted bubble: minor allele (SNP at 1500) at ~5x
    pos = 1500
    variant = genome[:pos] + ("A" if genome[pos] != "A" else "C") \
        + genome[pos + 1:]
    for s in range(pos - 60, pos + 1, 12):  # 6 reads over the SNP
        reads.append(variant[s:s + 80])

    # planted tip: 3 chimeric reads diverging into junk after position 800
    junk = random_genome(rng, 30)
    for _ in range(3):
        reads.append(genome[760:800] + junk)

    graph, _ = build_all(reads, k)
    contigs, stats = simplify.simplify_to_contigs(graph)

    gk = {dna.canonical(genome[i:i + k]) for i in range(len(genome) - k + 1)}
    vk = {dna.canonical(variant[i:i + k])
          for i in range(pos - k + 1, pos + 1)} - gk
    jk_src = genome[760:800] + junk
    jk = {dna.canonical(jk_src[i:i + k])
          for i in range(len(jk_src) - k + 1)} - gk
    ck = set()
    for c in contigs:
        for i in range(len(c.seq) - k + 1):
            ck.add(dna.canonical(c.seq[i:i + k]))

    assert stats["tips"] >= 1
    assert stats["bubbles"] >= 1
    assert not (ck & vk), "minor bubble allele survived simplification"
    assert not (ck & jk), "chimeric tip survived simplification"
    assert len(gk & ck) / len(gk) > 0.95
    s = simplify.contig_stats(contigs, genome_size=len(genome))
    assert s["N50"] > 0.8 * len(genome)


def test_fasta_roundtrip(tmp_path, rng):
    from test_contiger import build_all

    k = 15
    genome = random_genome(rng, 1500)
    reads = reads_from_genome(rng, genome, 800, 60, error_rate=0.01)
    graph, _ = build_all(reads, k)
    path = str(tmp_path / "unitigs.fa")
    graph.write_fasta(path)
    g2 = simplify.load_unitig_fasta(path, k)
    assert [u.seq for u in g2.unitigs] == [u.seq for u in graph.unitigs]
    assert [u.median_abundance for u in g2.unitigs] == [
        u.median_abundance for u in graph.unitigs]
    assert g2.after == graph.after
    assert g2.before == graph.before


def test_minia_cli(tmp_path, rng):
    from test_contiger import build_all
    from sh_assembly_tpu.cli import minia

    k = 15
    genome = random_genome(rng, 1200)
    reads = reads_from_genome(rng, genome, 700, 60, error_rate=0.02)
    graph, _ = build_all(reads, k)
    upath = str(tmp_path / "unitigs.fa")
    graph.write_fasta(upath)
    rc = minia.main(["-kmer-size", str(k), "-unitig", "-in", upath])
    assert rc == 0
    out = upath.rsplit(".fa", 1)[0] + ".contigs.fa"
    lines = open(out).read().splitlines()
    assert lines and lines[0].startswith(">0 LN:i:")
