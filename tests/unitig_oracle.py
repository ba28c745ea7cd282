"""Sequential-walk unitig oracle replicating get_unitig_forward semantics
(src/contig_assembly.cpp:3028-3218) in plain Python, for parity-testing the
TPU contraction.  Works on exact string k-mers with a count oracle."""

from __future__ import annotations

import numpy as np

from sh_assembly_tpu.utils import dna


def solid_read_kmers(reads: list[str], k: int, count_of, abundance_min: int):
    """Distinct canonical k-mers present in reads (N-free) with
    count >= abundance_min."""
    out = set()
    for r in reads:
        for i in range(len(r) - k + 1):
            km = r[i : i + k]
            if "N" in km:
                continue
            c = dna.canonical(km)
            if count_of(c) >= abundance_min:
                out.add(c)
    return out


def oracle_unitigs(reads: list[str], k: int, count_of, abundance_min: int = 2,
                   solid_min: int | None = None, solid_max: int | None = None):
    """Canonical unitig sequence set via sequential walks.

    count_of(kmer_str) must return the abundance of a canonical k-mer (use
    the same count source as the engine under test so collision semantics
    agree).  Returns a set of canonical (min of seq/rc) unitig strings.

    With solid_min/solid_max set, models the reference's -x/-X seed rule
    (contig_assembly.cpp:2082): traversal only *starts* from k-mers with
    count in [solid_min, solid_max] but extends through any k-mer with
    count >= abundance_min, so exactly the connected components containing
    at least one solid k-mer are emitted.
    """
    nodes = solid_read_kmers(reads, k, count_of, abundance_min)

    def succs(km: str):
        out = []
        for X in "ACGT":
            s = km[1:] + X
            if count_of(dna.canonical(s)) >= abundance_min and dna.canonical(s) in nodes:
                out.append(s)
        return out

    def preds(km: str):
        out = []
        for X in "ACGT":
            p = X + km[:-1]
            if count_of(dna.canonical(p)) >= abundance_min and dna.canonical(p) in nodes:
                out.append(p)
        return out

    visited: set[str] = set()
    unitigs: set[str] = set()
    for seed in sorted(nodes):
        if seed in visited:
            continue
        # walk backward to the start of the unbranched stretch
        cur = seed
        seen_local = {seed}
        while True:
            ps = preds(cur)
            if len(ps) != 1:
                break
            p = ps[0]
            if len(succs(p)) != 1:
                break
            if dna.canonical(p) in seen_local:  # cycle
                break
            cur = p
            seen_local.add(dna.canonical(cur))
        # walk forward collecting the unitig
        seq = cur
        seen_local = {dna.canonical(cur)}
        while True:
            ss = succs(seq[-k:])
            if len(ss) != 1:
                break
            nxt = ss[0]
            if len(preds(nxt)) != 1:
                break
            if dna.canonical(nxt) in seen_local:  # cycle closure
                break
            seq += nxt[-1]
            seen_local.add(dna.canonical(nxt))
        for i in range(len(seq) - k + 1):
            visited.add(dna.canonical(seq[i : i + k]))
        unitigs.add(dna.canonical(seq))

    if solid_min is None:
        return unitigs

    # component seed filter: BFS closure over abundance_min adjacency from
    # k-mers whose count lies in [solid_min, solid_max]
    seeds = {n for n in nodes if solid_min <= count_of(n) <= solid_max}
    reach: set[str] = set()
    frontier = list(seeds)
    while frontier:
        cur = frontier.pop()
        if cur in reach:
            continue
        reach.add(cur)
        fwd = cur if cur == dna.canonical(cur) else dna.revcomp(cur)
        for nb in succs(fwd) + preds(fwd):
            c = dna.canonical(nb)
            if c not in reach:
                frontier.append(c)
        rc = dna.revcomp(fwd)
        for nb in succs(rc) + preds(rc):
            c = dna.canonical(nb)
            if c not in reach:
                frontier.append(c)
    kept = set()
    for useq in unitigs:
        if any(dna.canonical(useq[i:i + k]) in reach
               for i in range(len(useq) - k + 1)):
            kept.add(useq)
    return kept
