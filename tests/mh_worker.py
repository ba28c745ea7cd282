"""Worker process for the multi-host (multi-process) counting test.

Each process owns half the reads (the multihost file-partition rule),
feeds ONLY its local rows of the globally sharded batch, and the
key-range-sharded spectrum is built with the same collective programs the
single-process path uses (parallel/sharded.py) — all_gather/psum now ride
the Gloo cross-process backend instead of intra-process threads.

Usage: python mh_worker.py <pid> <nprocs> <port> <outdir>
"""

import os
import sys

pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
# force EXACTLY 2 local devices (a parent pytest process may have exported
# a different device count in XLA_FLAGS)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sh_assembly_tpu.io import fastq  # noqa: E402
from sh_assembly_tpu.ops import spectrum as sp  # noqa: E402
from sh_assembly_tpu.parallel import multihost, sharded  # noqa: E402
from oracle import random_reads  # noqa: E402

K, KEY_BITS = 21, 22
ROWS_PER_DEV = 32
L = 96

mesh = multihost.make_global_mesh()
n_dev = mesh.devices.size
assert jax.process_count() == nprocs

# every process generates the SAME read list deterministically, then takes
# its partition (the file-level analogue is multihost.partition_files)
rng = np.random.default_rng(907)
reads = random_reads(rng, 256, 90)
mine = [r for i, r in enumerate(reads) if i % nprocs == pid]

sc = sharded.ShardedCounter(
    mesh=mesh, k=K, key_bits=KEY_BITS,
    local_capacity=1 << 14, local_buf_capacity=1 << 14)
spec = sc.init()
scan = sc.append_scan_fn(S=2)
merge = sc.merge_fn()

# pack local reads into fixed [local_rows, L] batches; local_rows spans
# this process's devices only
local_rows = ROWS_PER_DEV * len(jax.local_devices())
global_rows = ROWS_PER_DEV * n_dev
batcher = fastq.Batcher(K, local_rows, L)
batches = []
for r in mine:
    batches.extend(batcher.add_read(r))
batches.extend(batcher.flush())
assert len(batches) == 2, "keep one fused scan per process for this test"

# one fused sharded scan (sorted all_to_all routing), stacked [S=2, rows, L]
s_stack = NamedSharding(mesh, P(None, "shard"))
codes = jax.make_array_from_process_local_data(
    s_stack, np.stack([b.codes for b in batches]), (2, global_rows, L))
lengths = jax.make_array_from_process_local_data(
    s_stack, np.stack([b.lengths for b in batches]), (2, global_rows))
spec, dropped = scan(spec, codes, lengths)
assert all(int(np.asarray(s.data)[0]) == 0
           for s in dropped.addressable_shards)
spec = merge(spec)

nd, ne = sc.stats_fn()(spec)

# dump THIS process's addressable shards.  hi/lo are [n_dev*Cl] sharded in
# Cl-sized rows (shard i starts at i*Cl); n_main is [n_dev] with one
# element per shard, so its global index IS the shard index.
Cl = sc.local_capacity
hi_shards = {(s.index[0].start or 0) // Cl: np.asarray(s.data)
             for s in spec.hi.addressable_shards}
lo_shards = {(s.index[0].start or 0) // Cl: np.asarray(s.data)
             for s in spec.lo.addressable_shards}
nm = {s.index[0].start or 0: int(np.asarray(s.data)[0])
      for s in spec.n_main.addressable_shards}
out_k, out_c = [], []
for shard_i in sorted(hi_shards):
    m = nm[shard_i]
    keys, counts, _ = sp.unpack_entries_np(
        hi_shards[shard_i][:m], lo_shards[shard_i][:m], KEY_BITS)
    out_k.append(keys)
    out_c.append(counts)

np.savez(os.path.join(outdir, f"mh_{pid}.npz"),
         keys=np.concatenate(out_k) if out_k else np.zeros(0, np.uint64),
         counts=np.concatenate(out_c) if out_c else np.zeros(0, np.int64),
         ndistinct=nd, nelts=ne)
print(f"proc {pid}: ndistinct={nd} nelts={ne}", flush=True)
