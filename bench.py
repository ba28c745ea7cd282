"""Benchmark: k-mer counting throughput per chip (k=47, the reference's
headline configuration, README.md:76-101).

Measures the steady-state device pipeline (windowed canonical ntHash +
sorted-spectrum insert + amortized sort-merge compactions) on synthetic
reads pre-staged on device, i.e. the same work the reference's 16-thread
insert1_advance hot loop does per k-mer (SURVEY.md §3.1), excluding host
FASTQ decode (measured separately by the end-to-end configs).

Baseline: the repository publishes no numbers (BASELINE.md).  We anchor
vs_baseline to 20M canonical k-mer inserts/sec, a representative figure for
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
    qb = 24  # 16M-slot spectrum (~0.2 GB device state)
    key_bits = qb + 8
    B, L = 4096, 160  # 467k windows per batch
    C, BC = 1 << qb, 1 << 22
    windows = B * (L - k + 1)

    rng = np.random.default_rng(2038074761)
    # reads sampled from a synthetic genome at ~30x so the spectrum load
    # factor and duplicate-key mix resemble real counting, not all-novel
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    n_batches = 12
    batches = []
    for _ in range(n_batches):
        starts = rng.integers(0, len(genome) - L, size=B)
        codes = np.stack([genome[s : s + L] for s in starts])
        batches.append(jax.device_put(jnp.asarray(codes)))
    lengths = jax.device_put(jnp.asarray(np.full(B, L, np.int32)))

    spec = sp.make(C, BC)

    def run_once(spec, data):
        merges = 0
        nbuf = 0
        for codes in data:
            spec = counter.count_batch(spec, codes, lengths, k, key_bits)
            nbuf += windows
            if nbuf + windows > BC:
                spec = counter._merge_keep(spec, key_bits)
                merges += 1
                nbuf = 0
        spec = counter._merge_keep(spec, key_bits)
        jax.block_until_ready(spec.keys)
        return spec, merges

    # warmup: compiles + fills the spectrum to steady-state occupancy
    spec, _ = run_once(spec, batches[:4])

    t0 = time.time()
    spec, merges = run_once(spec, batches)
    dt = time.time() - t0

    kmers = n_batches * windows
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
