"""Mesh counting throughput: the fused sharded scan over an N-device mesh.

The driver's bench.py measures the single-chip path; this standalone
times the SHARDED path (u32-plane hash -> pair-plane routing sort ->
all_to_all -> per-shard append, host-driven merges) so the per-shard
routing overhead vs the single-chip scan is quantified (VERDICT r3 #5).

On the single-real-TPU dev environment run it on the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_mesh.py [n_devices]

CPU numbers are correctness-shaped (no ICI, emulated collectives) — the
useful output is the RATIO of routed-scan cost to plain-scan cost at the
same per-device geometry, which upper-bounds the routing tax a real mesh
would pay (real ICI all_to_alls are far cheaper than XLA:CPU's memcpy
emulation).
"""

import sys
import time

import numpy as np

import sh_assembly_tpu  # noqa: F401  (jax config)
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sh_assembly_tpu.models import counter
from sh_assembly_tpu.ops import spectrum as sp
from sh_assembly_tpu.parallel import sharded


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    n = min(n, len(jax.devices()))
    k, qb = 31, 22
    key_bits = qb + 8
    S, B, L = 4, 1024 * n, 160
    W = L - k + 1
    keys_per_super = S * B * W

    sc = sharded.ShardedCounter(
        mesh=sharded.make_mesh(n), k=k, key_bits=key_bits,
        local_capacity=1 << qb, local_buf_capacity=1 << 22)
    scan = sc.append_scan_fn(S)
    merge = sc.merge_fn()

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=(S, B))
    codes = genome[(starts[..., None] + np.arange(L))]
    lengths = np.full((S, B), L, np.int32)
    row = NamedSharding(sc.mesh, P(None, "shard"))
    dcodes = jax.device_put(codes, row)
    dlengths = jax.device_put(lengths, row)

    spec = sc.init()
    spec, dropped = scan(spec, dcodes, dlengths)  # compile
    assert int(np.asarray(dropped).sum()) == 0
    spec = merge(spec)
    jax.block_until_ready(spec.hi)

    reps = 6
    t0 = time.time()
    for _ in range(reps):
        spec, _ = scan(spec, dcodes, dlengths)
        spec = merge(spec)
    jax.block_until_ready(spec.hi)
    dt = (time.time() - t0) / reps
    rate = keys_per_super / dt
    print(f"# mesh({n}x{jax.devices()[0].platform}): "
          f"{rate / 1e6:.1f}M keys/s routed scan+merge "
          f"({keys_per_super} keys/{dt * 1e3:.0f} ms)", file=sys.stderr)

    # single-device comparison at the same per-device geometry
    spec1 = sp.make(1 << qb, 1 << 22)
    pk = codes[:, : B // n]
    ln1 = lengths[:, : B // n]
    c1 = jnp.asarray(pk)
    l1 = jnp.asarray(ln1)
    s1 = counter.append_scan(spec1, c1, l1, k, key_bits)
    s1 = sp.merge(s1, key_bits)
    jax.block_until_ready(s1.hi)
    t0 = time.time()
    for _ in range(reps):
        s1 = counter.append_scan(
            s1._replace(n_buf=jnp.zeros((), jnp.int64)), c1, l1, k,
            key_bits)
        s1 = sp.merge(s1, key_bits)
    jax.block_until_ready(s1.hi)
    dt1 = (time.time() - t0) / reps
    per_dev = keys_per_super // n
    rate1 = per_dev / dt1
    print(f"# single-device same geometry: {rate1 / 1e6:.1f}M keys/s "
          f"-> routing tax x{rate1 * n / max(rate, 1):.2f} "
          f"(ideal 1.0)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
