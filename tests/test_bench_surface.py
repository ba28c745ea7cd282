"""The driver runs bench.py / the dryrun uncompiled — pin their surface.

A syntax error or a renamed symbol in bench.py would otherwise surface
only in the driver's end-of-round run, silently costing the round its
benchmark record.
"""

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse(name):
    with open(os.path.join(ROOT, name)) as f:
        return ast.parse(f.read(), filename=name)


def test_bench_parses_and_binds():
    tree = _parse("bench.py")
    names = {n.name for n in ast.walk(tree)
             if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))}
    assert {"main", "measure_cpu_baseline", "measure_ref_e2e_baseline",
            "stage2", "extended"} <= names
    # the driver parses the LAST JSON line: the primary metric must be the
    # final print in main (VERDICT r4 #3)
    with open(os.path.join(ROOT, "bench.py")) as f:
        src = f.read()
    assert src.rindex("primary_json") > src.rindex("e2e_json")


def test_bench_mesh_parses():
    tree = _parse("bench_mesh.py")
    names = {n.name for n in ast.walk(tree)
             if isinstance(n, ast.FunctionDef)}
    assert "main" in names


def test_graft_entry_binds():
    import __graft_entry__ as g

    assert callable(g.entry) and callable(g.dryrun_multichip)
    # entry() must build its example args without touching the device
    fn, args = g.entry()
    assert callable(fn) and len(args) == 3
