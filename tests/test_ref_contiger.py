"""Unitig-graph parity vs the COMPILED reference traversal.

tests/ref_harness/ref_contiger.cpp drives the reference's own gqf.c
traveled-bit machinery + nthash.hpp probes with the single-thread
semantics of find_unitigs_mt_master/get_unitig_forward
(/root/reference/src/contig_assembly.cpp:2034-3218).  This test counts a
read set with cli.cqf_denoise (already byte-parity-checked against the
reference counting loop, test_ref_hotloop), hands the SAME .ser to both
Contiger implementations, and asserts:

  * identical unitig SET (sequences canonicalized to min(seq, RC));
  * identical per-unitig (median, KC) metadata;
  * identical link multiset under canonical renaming.

Reference ids are traversal-order dependent (min-id races resolved by
arrival), so ids are normalized through the canonical sequence before
comparison (the reference's own output is id-nondeterministic across
thread counts; SURVEY §5.2).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from oracle import random_genome, reads_from_genome

REF = "/root/reference"
HARNESS = os.path.join(os.path.dirname(__file__), "ref_harness",
                       "ref_contiger.cpp")


def _build_harness(tmp):
    exe = os.path.join(tmp, "ref_contiger")
    r = subprocess.run(
        ["g++", "-O1", "-std=c++11", f"-I{REF}/cqf", f"-I{REF}/base",
         "-x", "c++", f"{REF}/cqf/gqf.c", "-x", "c++", HARNESS,
         "-o", exe, "-lm", "-lpthread"],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[-500:]}")
    return exe


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def parse_unitig_fasta(path):
    """-> list of (seq, median, kc, [links]) with links as raw strings."""
    out = []
    with open(path) as f:
        header = None
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                header = line
            else:
                fields = header.split(" ")
                med = kc = None
                links = []
                for fl in fields[1:]:
                    if fl.startswith("km:f:"):
                        med = float(fl[5:])
                    elif fl.startswith("KC:i:"):
                        kc = int(fl[5:])
                    elif fl.startswith("L:"):
                        links.append(fl)
                out.append((line, med, kc, links))
    return out


_COMP = str.maketrans("ACGT", "TGCA")


def rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


def canon(s: str):
    r = rc(s)
    return (s, +1) if s <= r else (r, -1)


def canonical_graph(units):
    """Normalize ids through canonical sequences.

    Returns (node list, edge list): nodes are (canonical seq, median, kc);
    each link record maps to the DIRECTED oriented-sequence edge it
    denotes — `L:+:t:d` at U is U -> orient(t, d), `L:-:t:d` is
    RC(U) -> orient(t, d) (build_graph_worker semantics,
    contig_assembly.cpp:1012-1084) — which is id-free and orientation-
    unambiguous.
    """
    nodes = []
    seq_by_id = []
    for seq, med, kc, _ in units:
        nodes.append((canon(seq)[0], med, kc))
        seq_by_id.append(seq)
    edges = []
    for i, (seq, _, _, links) in enumerate(units):
        for fl in links:
            _, side, tid, tdir = fl.split(":")
            tseq = seq_by_id[int(tid)]
            to = tseq if tdir == "+" else rc(tseq)
            frm = seq if side == "+" else rc(seq)
            edges.append((frm, to))
    return sorted(nodes), sorted(edges)


@pytest.mark.parametrize("k,glen,nreads,rlen,err", [
    (21, 4000, 1500, 80, 0.01),
    (31, 8000, 2500, 100, 0.005),
])
def test_unitig_parity_vs_compiled_reference(tmp_path, k, glen, nreads,
                                             rlen, err):
    if not os.path.isdir(REF):
        pytest.skip("no reference tree")
    rng = np.random.default_rng(42 + k)
    genome = random_genome(rng, glen)
    reads = reads_from_genome(rng, genome, nreads, rlen, error_rate=err)

    tmp = str(tmp_path)
    fq = os.path.join(tmp, "reads.fastq")
    _write_fastq(fq, reads)
    lst = os.path.join(tmp, "ReadFiles.txt")
    with open(lst, "w") as f:
        f.write("reads.fastq\n")

    # counting stage: ours (byte-parity with the reference counting loop
    # is separately pinned by test_ref_hotloop)
    from sh_assembly_tpu.cli import cqf_denoise, contiger

    ser = os.path.join(tmp, "k.ser")
    total = nreads * (rlen - k + 1)
    cqf_denoise.main([
        "-k", str(k), "-n", str(glen), "-N", str(total), "-e", "0.005",
        "--deNoise", "0", "-i", lst, "-o", ser])

    exe = _build_harness(tmp)
    ref_fa = os.path.join(tmp, "ref_unitigs.fa")
    with open(fq, "rb") as fin:
        subprocess.run(
            [exe, ser, str(k), "2", "2", "1000000", ref_fa],
            stdin=fin, check=True, capture_output=True)

    # our Contiger on a FRESH copy of the .ser (the harness mutates
    # traveled bits in its own memory only; ours reads the file)
    our_fa = os.path.join(tmp, "our_unitigs.fa")
    contiger.main(["-k", str(k), "-i", lst, "-c", ser,
                   "-s", "2", "-x", "2", "-o", our_fa])

    ref_units = parse_unitig_fasta(ref_fa)
    our_units = parse_unitig_fasta(our_fa)
    assert len(ref_units) > 10, "workload produced a trivial graph"

    ref_nodes, ref_edges = canonical_graph(ref_units)
    our_nodes, our_edges = canonical_graph(our_units)

    ref_seqs = {n[0] for n in ref_nodes}
    our_seqs = {n[0] for n in our_nodes}
    # The reference's probes SET the traveled bit of every existing key
    # they touch (qf_count_key_value_set_traveled, gqf.c:3092-3128), and a
    # later seed whose key was already probed is silently skipped
    # (contig_assembly.cpp:2080).  Which components die to that is
    # TRAVERSAL-ORDER dependent — the reference itself gives different
    # sets under different thread schedules.  Our engine is order-free, so
    # the invariant is: reference set SUBSET of ours, with a tiny gap of
    # whole extra components (aliased-probe seed suppression).
    assert ref_seqs <= our_seqs, (
        f"{len(ref_seqs - our_seqs)} reference unitigs missing from ours "
        f"(of {len(ref_seqs)}): {sorted(ref_seqs - our_seqs)[:3]}")
    extra = our_seqs - ref_seqs
    assert len(extra) <= max(2, len(ref_seqs) // 50), (
        f"{len(extra)} extra unitigs vs suppression allowance")

    # per-unitig metadata and links must agree exactly on the shared set
    shared = ref_seqs & our_seqs
    assert ([n for n in ref_nodes if n[0] in shared]
            == [n for n in our_nodes if n[0] in shared]), \
        "median/KC metadata differs on shared unitigs"
    def in_shared(e):
        return canon(e[0])[0] in shared and canon(e[1])[0] in shared

    ref_e = [e for e in ref_edges if in_shared(e)]
    our_e = [e for e in our_edges if in_shared(e)]
    assert ref_e == our_e, (
        f"link sets differ on shared unitigs: "
        f"{len(set(ref_e) - set(our_e))} only-ref, "
        f"{len(set(our_e) - set(ref_e))} only-ours")
