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
    """Canonical unitig sequence set via sequential walks with the
    reference's exact discovery semantics (find_unitigs_mt_master +
    get_unitig_forward, contig_assembly.cpp:2034-3218):

      * traversal SEEDS only from the middle k-mer of each read, skipped
        when N-containing or with count outside [solid_min, solid_max]
        (defaults -x 2 / -X 1e6 when not given);
      * extension/branch decisions use the COUNT filter alone (count of
        the canonical hash >= abundance_min) — a probe whose key aliases a
        counted key is a real candidate even if its k-mer appears in no
        read ("phantom" nodes, possible because of hash collisions);
      * the emitted set is the closure of the seeds over that implicit
        graph.

    count_of(kmer_str) must return the abundance of a canonical k-mer via
    the same hash-keyed count source as the engine under test so collision
    semantics agree.  Returns a set of canonical (min of seq/rc) unitig
    strings.
    """
    if solid_min is None:
        solid_min = 2
    if solid_max is None:
        solid_max = 1_000_000

    # seed set: read-middle k-mers (contig_assembly.cpp:2068-2082)
    seeds: set[str] = set()
    for r in reads:
        if len(r) < k:
            continue
        m = len(r) // 2
        if m + k > len(r):
            continue
        km = r[m : m + k].upper()
        if any(c not in "ACGT" for c in km):
            continue
        c = dna.canonical(km)
        if solid_min <= count_of(c) <= solid_max:
            seeds.add(c)

    def succs(km: str):
        return [km[1:] + X for X in "ACGT"
                if count_of(dna.canonical(km[1:] + X)) >= abundance_min]

    def preds(km: str):
        return [X + km[:-1] for X in "ACGT"
                if count_of(dna.canonical(X + km[:-1])) >= abundance_min]

    def siblings(km: str):
        # suffix-sharing k-mers: spawned as before-candidates at a junction
        # (contig_assembly.cpp:3140-3165) even without a k-1 overlap edge
        return [X + km[1:] for X in "ACGT"
                if X != km[0]
                and count_of(dna.canonical(X + km[1:])) >= abundance_min]

    # closure over the implicit count-filtered graph (phantoms included)
    reach: set[str] = set()
    frontier = list(seeds)
    while frontier:
        c = frontier.pop()
        if c in reach:
            continue
        reach.add(c)
        for base in (c, dna.revcomp(c)):
            for nb in succs(base) + preds(base) + siblings(base):
                cc = dna.canonical(nb)
                if cc not in reach:
                    frontier.append(cc)

    visited: set[str] = set()
    unitigs: set[str] = set()
    for seed in sorted(reach):
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
    return unitigs
