"""Benchmark: k-mer counting throughput per chip (k=47, the reference's
headline configuration, README.md:76-101).

Measures the steady-state fused device pipeline (windowed canonical ntHash
+ log-buffer append + on-device packed sort-merges, counter.count_scan) on
synthetic reads pre-staged on device — the same work the reference's
16-thread insert1_advance hot loop does per k-mer (SURVEY.md §3.1),
excluding host FASTQ decode (covered by the end-to-end configs).

Baseline: the repository publishes no numbers (BASELINE.md).  vs_baseline
is anchored to 20M canonical k-mer inserts/sec, a representative figure for
the 16-thread CQF insert loop on server CPUs from the CQF/squeakr
literature the reference builds on; see README for the derivation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_KMERS_PER_SEC = 20e6


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sh_assembly_tpu.models import counter
    from sh_assembly_tpu.ops import spectrum as sp

    k = 47
    qb = 24  # 16M-entry spectrum
    key_bits = qb + 8
    S, B, L = 32, 8192, 160  # 32 batches x 934k windows per fused dispatch
    C, BC = 1 << qb, 1 << 25
    windows = B * (L - k + 1)

    rng = np.random.default_rng(2038074761)
    # reads sampled from a synthetic genome at ~30x so the spectrum load
    # factor and duplicate-key mix resemble real counting, not all-novel
    genome = rng.integers(0, 4, size=4_000_000).astype(np.uint8)
    n_super = 4
    supers = []
    for _ in range(n_super):
        stack = np.empty((S, B, L), np.uint8)
        for s in range(S):
            starts = rng.integers(0, len(genome) - L, size=B)
            stack[s] = np.stack([genome[st : st + L] for st in starts])
        supers.append(jax.device_put(jnp.asarray(stack)))
    lengths = jax.device_put(jnp.asarray(np.full((S, B), L, np.int32)))
    threshold = jnp.asarray(1 << 62, jnp.int64)

    spec = sp.make(C, BC)
    rl = jnp.asarray(0, jnp.int32)

    def run_once(spec, rl, data):
        merges = 0
        for stack in data:
            spec, rl, m = counter.count_scan(
                spec, rl, stack, lengths, threshold, k, key_bits)
            merges += int(m)
        spec = counter._merge_keep(spec, key_bits)
        jax.block_until_ready(spec.hi)
        return spec, rl, merges + 1

    # warmup: compiles + fills the spectrum to steady-state occupancy
    spec, rl, _ = run_once(spec, rl, supers[:2])

    t0 = time.time()
    spec, rl, merges = run_once(spec, rl, supers)
    dt = time.time() - t0

    kmers = n_super * S * windows
    rate = kmers / dt
    print(
        json.dumps(
            {
                "metric": "kmers_counted_per_sec_per_chip_k47",
                "value": round(rate),
                "unit": "kmers/s",
                "vs_baseline": round(rate / CPU_BASELINE_KMERS_PER_SEC, 3),
            }
        )
    )
    print(
        f"# {kmers} kmers in {dt:.2f}s ({merges} merges), "
        f"distinct={int(spec.ndistinct)}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
