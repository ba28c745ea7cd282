"""TRUE multi-host counting test: two OS processes, each with two virtual
CPU devices, connected by jax.distributed (Gloo) — the pod-slice analogue
with DCN-crossing collectives, not just a single-process virtual mesh.

Each process streams its own partition of the reads (the
multihost.partition_files rule) and feeds only its local rows; the
key-range-sharded spectrum must equal the single-process oracle exactly.
"""

import os
import subprocess
import sys

import numpy as np

from oracle import oracle_count, random_reads

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    """Ephemeral port: bind :0, read the number, release it (a fixed
    constant collides with concurrent CI runs / xdist workers)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_counting_matches_oracle(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # combine both processes' shard dumps -> the global spectrum
    keys, counts = [], []
    for pid in range(2):
        z = np.load(tmp_path / f"mh_{pid}.npz")
        keys.append(z["keys"])
        counts.append(z["counts"])
        nd, ne = int(z["ndistinct"]), int(z["nelts"])
    got = dict(zip(np.concatenate(keys).tolist(),
                   np.concatenate(counts).tolist()))

    rng = np.random.default_rng(907)
    reads = random_reads(rng, 256, 90)
    expect = oracle_count(reads, 21, 22)
    assert got == expect
    # psum'd global stats agree on both processes with the oracle
    assert nd == len(expect)
    assert ne == sum(expect.values())
