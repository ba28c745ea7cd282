"""Benchmarks: k-mer counting throughput per chip (k=47, the reference's
headline configuration, README.md:76-101) plus honesty checks.

Primary metric (the ONE JSON line): steady-state fused counting throughput
at a REALISTIC filter load — the spectrum is pre-filled to ~150M distinct
keys in a 2^28-slot store (same load factor as the flagship C. elegans
config at its deNoise trigger, see CAPACITY.md) before timing.  Reads are
pre-staged on device; the host-feed-included and end-to-end numbers are
reported alongside on stderr.

vs_baseline: measured, not literature — the reference's own hot loop
(tests/ref_harness/ref_count.cpp: its nthash.hpp + gqf.c insert1_advance,
compiled -Ofast) is timed single-thread on this host and scaled by the
reference's default 16 threads (generous: assumes perfect scaling, the
spinlock protocol is not free).  Falls back to the 20M/s literature anchor
if the harness can't build.

Also reported (stderr):
  - low-load geometry (round-1 comparable: empty 2^24 store)
  - feed-included rate (host 2-bit pack + H2D inside the timed loop)
  - merge roofline: buffer sort / merge kernel / full merge, achieved GB/s
    vs the ~819 GB/s v5e HBM peak
  - TPU-vs-XLA merge bit-identity check (Pallas kernel vs sort path)
  - end-to-end reads -> unitigs -> contigs wall clock on a synthetic
    1 Mbp x 30x workload (host decode + H2D + device + host assembly)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

LITERATURE_ANCHOR = 20e6  # fallback: 16-thread CQF counting, CQF/squeakr lit
HBM_PEAK_GBPS = 819.0  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_cpu_baseline() -> tuple[float, str]:
    """16 x single-thread rate of the reference's compiled hot loop."""
    ref = "/root/reference"
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "ref_harness", "ref_count.cpp")
    if not (os.path.isdir(ref) and os.path.isfile(src)):
        return LITERATURE_ANCHOR, "literature (no reference tree)"
    exe = os.path.join(tempfile.gettempdir(), "bench_ref_count")
    r = subprocess.run(
        ["g++", "-Ofast", "-m64", "-std=c++11", f"-I{ref}/cqf",
         f"-I{ref}/base", "-x", "c++", f"{ref}/cqf/gqf.c", "-x", "c++",
         src, "-o", exe, "-lm", "-lpthread"], capture_output=True)
    if r.returncode != 0:
        return LITERATURE_ANCHOR, "literature (harness build failed)"

    k, read_len, n_reads = 47, 100, 150_000
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    b = np.frombuffer(b"ACGT", np.uint8)
    fq = os.path.join(tempfile.gettempdir(), "bench_ref.fastq")
    with open(fq, "wb") as f:
        quals = b"I" * read_len
        starts = rng.integers(0, len(genome) - read_len, size=n_reads)
        for i, s in enumerate(starts):
            f.write(b"@r%d\n" % i)
            f.write(b[genome[s:s + read_len]].tobytes())
            f.write(b"\n+\n%s\n" % quals)
    kmers = n_reads * (read_len - k + 1)
    qb = 24  # ~8.1M distinct kmers -> comfortably inside 2^24 slots
    with open(fq, "rb") as f:
        t0 = time.time()
        subprocess.run([exe, str(qb), str(qb + 8), str(k), "/dev/null"],
                       stdin=f, check=True, capture_output=True)
        dt = time.time() - t0
    single = kmers / dt
    rate = 16 * single
    log(f"# cpu baseline: ref hot loop {single/1e6:.1f}M kmers/s/thread "
        f"x16 = {rate/1e6:.1f}M/s ({kmers} kmers in {dt:.2f}s)")
    return rate, f"measured 16x single-thread ({single/1e6:.1f}M/s/thread)"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sh_assembly_tpu.models import counter
    from sh_assembly_tpu.ops import spectrum as sp

    baseline, baseline_src = measure_cpu_baseline()

    k = 47
    S, B, L = 32, 8192, 160
    windows = B * (L - k + 1)
    rng = np.random.default_rng(2038074761)
    genome = rng.integers(0, 4, size=8_000_000).astype(np.uint8)

    def make_supers(n_super):
        out = []
        for _ in range(n_super):
            stack = np.empty((S, B, L), np.uint8)
            for s in range(S):
                starts = rng.integers(0, len(genome) - L, size=B)
                stack[s] = np.stack([genome[st:st + L] for st in starts])
            out.append(stack)
        return out

    lengths = jax.device_put(jnp.asarray(np.full((S, B), L, np.int32)))
    threshold = jnp.asarray(1 << 62, jnp.int64)

    def run_once(spec, rl, data, key_bits):
        for stack in data:
            spec, rl, m = counter.count_scan(
                spec, rl, stack, lengths, threshold, k, key_bits)
        spec = counter._merge_keep(spec, key_bits)
        jax.block_until_ready(spec.hi)
        return spec, rl

    # ---- primary: realistic load (flagship-equivalent occupancy) ---------
    qb = 28
    key_bits = qb + 8
    C, BC = 1 << qb, 1 << 27
    n_fill = int(0.55 * C)  # ~ flagship load factor at the deNoise trigger
    fill_keys = rng.integers(0, 1 << key_bits, size=n_fill, dtype=np.uint64)
    fill_keys = np.unique(fill_keys)
    fill_counts = rng.integers(2, 50, size=len(fill_keys)).astype(np.int64)
    spec = sp.from_host(fill_keys, fill_counts, C, BC, key_bits=key_bits)
    del fill_keys, fill_counts
    supers = [jax.device_put(jnp.asarray(s)) for s in make_supers(4)]
    rl = jnp.asarray(0, jnp.int32)
    spec, rl = run_once(spec, rl, supers[:1], key_bits)  # compile+warm
    t0 = time.time()
    spec, rl = run_once(spec, rl, supers, key_bits)
    dt = time.time() - t0
    kmers = len(supers) * S * windows
    rate = kmers / dt
    log(f"# primary(qb=28, {int(spec.ndistinct)/1e6:.0f}M distinct): "
        f"{rate/1e6:.1f}M kmers/s ({kmers} in {dt:.2f}s)")
    del spec, supers

    # ---- low-load geometry (round-1 comparable) ---------------------------
    qb2, kb2 = 24, 32
    spec2 = sp.make(1 << qb2, BC)
    supers2 = [jax.device_put(jnp.asarray(s)) for s in make_supers(4)]
    rl = jnp.asarray(0, jnp.int32)
    spec2, rl = run_once(spec2, rl, supers2[:2], kb2)
    t0 = time.time()
    spec2, rl = run_once(spec2, rl, supers2, kb2)
    dt2 = time.time() - t0
    log(f"# low-load(qb=24): {len(supers2)*S*windows/dt2/1e6:.1f}M kmers/s")
    del spec2, supers2

    # ---- feed-included: the REAL production path (FASTQ on disk -> native
    # C++ decode/pack -> H2D -> fused device counting) ----------------------
    try:
        from sh_assembly_tpu import config as cfgmod

        fq = os.path.join(tempfile.gettempdir(), "bench_ref.fastq")
        if not os.path.exists(fq):
            raise RuntimeError("baseline FASTQ missing")
        files4 = [fq] * 4  # ~32.4M kmers at k=47
        kmers4 = 4 * 150_000 * (100 - k + 1)
        sz = cfgmod.CounterSizing(
            k=k, qb=qb2, hb=kb2, num_true_kmers=0, num_false_kmers=0,
            n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
            end_deNoise=False, fr=0.0)
        bcfg = cfgmod.BatchConfig(reads_per_batch=8192, max_read_len=104)
        counter.build_spectrum_from_files(  # warmup: compiles this geometry
            [fq], sz, batch_cfg=bcfg, capacity=1 << qb2, buf_capacity=BC)
        t0 = time.time()
        _, st3 = counter.build_spectrum_from_files(
            files4, sz, batch_cfg=bcfg, capacity=1 << qb2, buf_capacity=BC)
        dt3 = time.time() - t0
        log(f"# feed-included(qb=24): {kmers4/dt3/1e6:.1f}M kmers/s "
            f"(disk + C++ decode/pack + H2D + device; {dt3:.2f}s)")
    except Exception as e:
        log(f"# feed-included skipped: {e!r}")

    # ---- merge roofline ----------------------------------------------------
    try:
        from sh_assembly_tpu.ops import merge_pallas as mp

        Cr, BCr = 1 << 25, 1 << 25
        keys_m = np.unique(rng.integers(0, 1 << key_bits, size=Cr // 2,
                                        dtype=np.uint64))
        specr = sp.from_host(keys_m, np.full(len(keys_m), 2, np.int64),
                             Cr, BCr, key_bits=key_bits)
        bufk = rng.integers(0, 1 << key_bits, size=BCr, dtype=np.uint64)
        specr = sp.insert(specr, jnp.asarray(bufk))

        sortfn = jax.jit(lambda x: jax.lax.sort(
            mp.kernel_pack_buf(x, key_bits)))
        _ = jax.block_until_ready(sortfn(specr.buf_keys))
        t0 = time.time()
        _ = jax.block_until_ready(sortfn(specr.buf_keys))
        t_sort = time.time() - t0

        mergefn = jax.jit(sp._merge_kernel_path,
                          static_argnames=("key_bits", "drop_singletons")) \
            if sp._pallas_available() else \
            jax.jit(sp._merge_xla_path,
                    static_argnames=("key_bits", "drop_singletons"))
        _ = jax.block_until_ready(
            mergefn(specr, key_bits=key_bits, drop_singletons=False).hi)
        t0 = time.time()
        out = mergefn(specr, key_bits=key_bits, drop_singletons=False)
        jax.block_until_ready(out.hi)
        t_merge = time.time() - t0
        gb = 16 * (Cr + BCr) / 1e9
        log(f"# roofline(C=BC=2^25): buf sort {t_sort*1e3:.0f}ms, full merge "
            f"{t_merge*1e3:.0f}ms = {gb/t_merge:.0f} GB/s achieved vs "
            f"{HBM_PEAK_GBPS:.0f} GB/s HBM peak "
            f"({100*gb/t_merge/HBM_PEAK_GBPS:.0f}%)")

        # ---- bit identity: Pallas kernel vs XLA sort path ------------------
        if sp._pallas_available():
            a = jax.jit(sp._merge_kernel_path,
                        static_argnames=("key_bits", "drop_singletons"))(
                specr, key_bits=key_bits, drop_singletons=True)
            bq = jax.jit(sp._merge_xla_path,
                         static_argnames=("key_bits", "drop_singletons"))(
                specr, key_bits=key_bits, drop_singletons=True)
            same = (np.array_equal(np.asarray(a.hi), np.asarray(bq.hi))
                    and np.array_equal(np.asarray(a.lo), np.asarray(bq.lo)))
            log(f"# bit-identity kernel-vs-xla (merge+sweep): "
                f"{'OK' if same else 'MISMATCH'}")
            if not same:
                raise RuntimeError("kernel/XLA merge mismatch")
        del specr
    except Exception as e:  # roofline is diagnostic; never kill the bench
        log(f"# roofline skipped: {e!r}")

    # ---- end-to-end reads -> contigs ---------------------------------------
    try:
        from sh_assembly_tpu.cli import pipeline as pipe

        d = tempfile.mkdtemp(prefix="bench_e2e_")
        g2 = rng.integers(0, 4, size=1_000_000).astype(np.uint8)
        bmap = np.frombuffer(b"ACGT", np.uint8)
        n_reads, rl_ = 300_000, 100
        with open(os.path.join(d, "reads.fastq"), "wb") as f:
            quals = b"I" * rl_
            starts = rng.integers(0, len(g2) - rl_, size=n_reads)
            for i, s in enumerate(starts):
                f.write(b"@r%d\n" % i)
                f.write(bmap[g2[s:s + rl_]].tobytes())
                f.write(b"\n+\n%s\n" % quals)
        with open(os.path.join(d, "ReadFiles.txt"), "w") as f:
            f.write("reads.fastq\n")
        total_kmers = n_reads * (rl_ - k + 1)
        t0 = time.time()
        pipe.main(["-k", str(k), "-i", os.path.join(d, "ReadFiles.txt"),
                   "-n", "1000000", "-N", str(total_kmers), "-e", "0.001",
                   "--deNoise", "0",
                   "-o", os.path.join(d, "contigs.fa"),
                   "--unitigs", os.path.join(d, "unitigs.fa")])
        dte = time.time() - t0
        log(f"# end-to-end reads->contigs: {dte:.1f}s for {n_reads} reads "
            f"({total_kmers/dte/1e6:.1f}M kmers/s incl. everything)")
    except Exception as e:
        log(f"# end-to-end skipped: {e!r}")

    print(json.dumps({
        "metric": "kmers_counted_per_sec_per_chip_k47_loaded",
        "value": round(rate),
        "unit": "kmers/s",
        "vs_baseline": round(rate / baseline, 3),
    }))
    log(f"# baseline source: {baseline_src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
