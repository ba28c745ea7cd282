"""Threshold-boundary fixtures for the Minia-style simplification pass.

Pin the exact gatb-core Simplifications constants the module implements
(TIP_TOPO_KMULT=2.5, TIP_RCTC_KMULT=10, TIP_RCTC=2.0, BUBBLE 3k+100,
EC_KMULT=9, EC_RCTC=4.0) at their boundaries, so any off-by-k or off-by-one
threshold regression fails loudly.  Lengths are measured in k-mers
(unitig length - k + 1), coverage is mean k-mer abundance.
"""

import pytest

from sh_assembly_tpu.models import simplify
from sh_assembly_tpu.models.contiger import Unitig, UnitigGraph

K = 10  # topo tip bound = 25 k-mers, RCTC bound = 100, EC bound = 90


def seq_of_nkmers(nk: int, k: int = K) -> str:
    return "A" * (nk + k - 1)


def tip_graph(tip_nk: int, tip_cov: float, sib_cov: float = 50.0):
    """anchor A with tip T and strong sibling S entering its beginning,
    A continuing into long C (so A is internal, T/S are the branches)."""
    g = UnitigGraph(k=K)
    # 0=A anchor, 1=T tip, 2=S sibling (long, never a tip), 3=C continuation
    for seq, cov in [
        (seq_of_nkmers(200), 50.0),
        (seq_of_nkmers(tip_nk), tip_cov),
        (seq_of_nkmers(200), sib_cov),
        (seq_of_nkmers(200), 50.0),
    ]:
        g.unitigs.append(Unitig(seq=seq, median_abundance=int(cov),
                                mean_abundance=cov))
    g.after = [[4], [1], [1], []]  # T.after/S.after -> +A; A.after -> +C
    g.before = [[2, 3], [], [], [1]]  # A.before lists T and S
    return g


def run_tips(g):
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    sg.clip_tips()
    return sg


def test_topo_tip_at_bound_clipped():
    # nk == 2.5*k exactly -> unconditionally clipped
    sg = run_tips(tip_graph(tip_nk=25, tip_cov=50.0))
    assert not sg.alive[1]


def test_topo_tip_above_bound_kept_when_strong():
    # nk just above 2.5*k, coverage holds up against the sibling -> kept
    sg = run_tips(tip_graph(tip_nk=26, tip_cov=49.0, sib_cov=50.0))
    assert sg.alive[1]


def test_rctc_tip_above_bound_clipped_when_weak():
    # nk above topo bound but <= 10*k, cov * 2.0 < sibling cov -> clipped
    sg = run_tips(tip_graph(tip_nk=26, tip_cov=24.0, sib_cov=50.0))
    assert not sg.alive[1]


def test_rctc_exact_ratio_is_kept():
    # cov * 2.0 == sibling cov: gatb uses strict '<', boundary must be kept
    sg = run_tips(tip_graph(tip_nk=26, tip_cov=25.0, sib_cov=50.0))
    assert sg.alive[1]


def test_rctc_tip_beyond_len_bound_kept():
    # nk > 10*k: too long to ever be a tip, however weak
    sg = run_tips(tip_graph(tip_nk=101, tip_cov=1.0, sib_cov=50.0))
    assert sg.alive[1]
    sg = run_tips(tip_graph(tip_nk=100, tip_cov=1.0, sib_cov=50.0))
    assert not sg.alive[1]


def bubble_graph(branch_len_nt: int, cov_a: float, cov_b: float):
    g = UnitigGraph(k=K)
    # 0=u, 1=a, 2=b, 3=w
    for seq, cov in [
        (seq_of_nkmers(150), 40.0),
        ("A" * branch_len_nt, cov_a),
        ("A" * branch_len_nt, cov_b),
        (seq_of_nkmers(150), 40.0),
    ]:
        g.unitigs.append(Unitig(seq=seq, median_abundance=int(cov),
                                mean_abundance=cov))
    g.after = [[2, 3], [4], [4], []]
    g.before = [[], [-1], [-1], [-2, -3]]
    return g


def test_bubble_pops_weaker_branch_at_len_bound():
    # branch length == 3k + 100 nt is still poppable
    max_len = int(simplify.BUBBLE_KMULT * K + simplify.BUBBLE_KADD)
    g = bubble_graph(max_len, cov_a=30.0, cov_b=5.0)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    assert sg.pop_bubbles() == 1
    assert sg.alive[1] and not sg.alive[2]


def test_bubble_beyond_len_bound_kept():
    max_len = int(simplify.BUBBLE_KMULT * K + simplify.BUBBLE_KADD)
    g = bubble_graph(max_len + 1, cov_a=30.0, cov_b=5.0)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    assert sg.pop_bubbles() == 0
    assert sg.alive[1] and sg.alive[2]


def ec_graph(ec_nk: int, ec_cov: float, neigh_cov: float = 40.0):
    g = UnitigGraph(k=K)
    # 0=left, 1=ec, 2=right
    for seq, cov in [
        (seq_of_nkmers(200), neigh_cov),
        (seq_of_nkmers(ec_nk), ec_cov),
        (seq_of_nkmers(200), neigh_cov),
    ]:
        g.unitigs.append(Unitig(seq=seq, median_abundance=int(cov),
                                mean_abundance=cov))
    g.after = [[2], [3], []]
    g.before = [[], [-1], [-2]]
    return g


def test_ec_removed_at_len_bound():
    # nk == 9*k and cov * 4.0 < neighbor min -> removed
    g = ec_graph(ec_nk=90, ec_cov=9.0, neigh_cov=40.0)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    assert sg.remove_erroneous_connections() == 1
    assert not sg.alive[1]


def test_ec_len_and_ratio_bounds_kept():
    # one k-mer too long -> kept
    g = ec_graph(ec_nk=91, ec_cov=9.0)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    assert sg.remove_erroneous_connections() == 0
    # exact RCTC ratio (cov * 4.0 == neighbor min) -> kept (strict '<')
    g = ec_graph(ec_nk=90, ec_cov=10.0, neigh_cov=40.0)
    sg = simplify.SimpleGraph.from_unitig_graph(g)
    assert sg.remove_erroneous_connections() == 0


def test_rctc_uses_mean_not_median():
    # mean and median disagree: the RCTC decision must follow the mean
    g = tip_graph(tip_nk=26, tip_cov=24.0, sib_cov=50.0)
    # tip's MEAN says weak (24 * 2 < 50) but median says strong
    g.unitigs[1].median_abundance = 49
    sg = run_tips(g)
    assert not sg.alive[1]
    # reloaded-from-FASTA graphs have no mean: median fallback applies
    g2 = tip_graph(tip_nk=26, tip_cov=24.0, sib_cov=50.0)
    for u in g2.unitigs:
        u.mean_abundance = 0.0
    g2.unitigs[1].median_abundance = 49
    sg2 = run_tips(g2)
    assert sg2.alive[1]
