"""Quantify the deNoise trigger-cadence divergence (documented at
ops/spectrum.insert): the reference checks ndistinct >= threshold once per
~8 MB chunk (CQF_runtime_mt::needDeNoise, cqf/CQF_mt.h:307-313, checked at
CQF_mt.h:858-875); the TPU engine's ndistinct only advances at buffer
merges, so sweeps can fire up to one buffer later.

Checks:
  1. when the engine's merge boundaries coincide with the simulation's
     chunk boundaries, the final spectra match EXACTLY (the cadence is the
     only divergence);
  2. on a realistic schedule (buffer >> chunk) sweep-time shifts change the
     outcome ONLY in the provable ways: keys present in one run and not
     the other are pure singletons (one occurrence total, swept by one
     run's sweep window and not the other's), shared keys' counts differ
     by at most the number of sweeps, and the number of diverging keys is
     bounded by the insertion lag (one buffer per sweep).
"""

import numpy as np

from sh_assembly_tpu import config as cfg
from sh_assembly_tpu.io import fastq
from sh_assembly_tpu.models import counter
from sh_assembly_tpu.ops import spectrum as sp

from oracle import random_genome, reads_from_genome


K, QB = 21, 14
KEY_BITS = QB + 8
ROUNDS = 2


def _sizing(rounds, threshold):
    return cfg.CounterSizing(
        k=K, qb=QB, hb=KEY_BITS, num_true_kmers=0, num_false_kmers=0,
        n_true_kmers=1, num_deNoise=rounds, ndistinct_for_deNoise=threshold,
        end_deNoise=False, fr=0.0)


def _batches(reads, reads_per_batch, max_read_len=96):
    batcher = fastq.Batcher(K, reads_per_batch, max_read_len)
    out = []
    for r in reads:
        out.extend(batcher.add_read(r))
    out.extend(batcher.flush())
    return out


def _engine(reads, rounds, threshold, reads_per_batch, buf_capacity,
            tight=True, capacity=1 << 15):
    bc = cfg.BatchConfig(reads_per_batch=reads_per_batch, max_read_len=96)
    spec, stats = counter.build_spectrum(
        iter(_batches(reads, reads_per_batch)), _sizing(rounds, threshold),
        capacity=capacity, buf_capacity=buf_capacity, batch_cfg=bc,
        tight_denoise=tight)
    return spec, stats


def _per_chunk_sim(reads, rounds, threshold, reads_per_chunk,
                   capacity=1 << 15):
    """Reference cadence: merge + trigger check after EVERY chunk (the
    analogue of the reference's 8 MB read part)."""
    import jax.numpy as jnp

    from sh_assembly_tpu.ops import nthash

    spec = sp.make(capacity, 1 << 15)
    rounds_left = rounds
    sweeps = 0
    for b in _batches(reads, reads_per_chunk):
        keys, valid = nthash.windowed_canonical(
            jnp.asarray(b.codes), jnp.asarray(b.lengths), K)
        keys = keys & jnp.uint64((1 << KEY_BITS) - 1)
        keys = jnp.where(valid, keys, sp.SENTINEL)
        spec = sp.insert(spec, keys.reshape(-1))
        spec = sp.merge(spec, KEY_BITS)
        if rounds_left > 0 and int(spec.ndistinct) >= threshold:
            spec = sp.sweep(spec, KEY_BITS)
            rounds_left -= 1
            sweeps += 1
    return spec, sweeps


def _counts(spec):
    keys, counts, _ = sp.to_host(spec, KEY_BITS)
    return dict(zip(keys.tolist(), counts.tolist()))


def _workload(rng):
    genome = random_genome(rng, 2000)
    # ~30x true coverage + 2% errors -> a steady stream of singletons
    return reads_from_genome(rng, genome, 700, 80, error_rate=0.02)


def test_exact_match_on_aligned_boundaries(rng):
    reads = _workload(rng)
    ref_spec, _ = _engine(reads, 0, 1 << 62, 64, 2 * 64 * 76)
    threshold = int(ref_spec.ndistinct) // 2
    # 64 reads x 76 window-slots = 4864 keys/batch; a 9728-key buffer
    # merges after every SECOND batch -> cadence == 128-read chunks.
    # tight=False pins the pure buffer-boundary cadence this test aligns
    # (the production near-threshold early merge would fire mid-chunk)
    eng, stats = _engine(reads, ROUNDS, threshold, 64, 2 * 64 * 76,
                         tight=False)
    sim, sim_sweeps = _per_chunk_sim(reads, ROUNDS, threshold, 128)
    assert stats.sweeps == sim_sweeps > 0
    assert _counts(eng) == _counts(sim)


def test_realistic_buffer_divergence_characterized(rng):
    reads = _workload(rng)
    ref_spec, _ = _engine(reads, 0, 1 << 62, 16, 1 << 12)
    total_distinct = int(ref_spec.ndistinct)
    threshold = total_distinct // 2

    # 16-read chunks (1216 key slots) against a 4096-key buffer: the
    # engine merges every ~3 chunks, so each sweep fires up to one buffer
    # of insertions later than the per-chunk check
    BC = 1 << 12
    eng, stats = _engine(reads, ROUNDS, threshold, 16, BC)
    sim, sim_sweeps = _per_chunk_sim(reads, ROUNDS, threshold, 16)
    assert stats.sweeps == sim_sweeps > 0

    ce, cs = _counts(eng), _counts(sim)
    sym = set(ce) ^ set(cs)
    # a key in one run but not the other was swept while count==1 in every
    # one of the other run's lag windows it appeared in: each of the
    # remover's <= ROUNDS sweeps eats at most one occurrence, so the
    # keeper's total count is <= ROUNDS
    for key in sym:
        assert max(ce.get(key, 0), cs.get(key, 0)) <= ROUNDS
    # shared keys: a sweep boundary between two occurrences shifts the
    # final count by 1; bounded by the number of sweeps
    for key in set(ce) & set(cs):
        assert abs(ce[key] - cs[key]) <= ROUNDS
    # magnitude: diverging singletons are bounded by the insertion lag
    # (<= one buffer of raw keys per sweep; far fewer distinct new keys)
    assert len(sym) <= ROUNDS * BC, (
        f"{len(sym)} diverging keys vs lag bound {ROUNDS * BC}")
    # the count-bearing spectrum (count >= 2, what the Contiger consumes
    # at abundance_min=2) is nearly identical: drift is a singleton story
    solid_e = {k for k, v in ce.items() if v >= 2}
    solid_s = {k for k, v in cs.items() if v >= 2}
    drift = len(solid_e ^ solid_s) / max(len(solid_e | solid_s), 1)
    assert drift < 0.02, f"solid-set drift {drift:.3f}"


def test_flagship_proportional_ratio(rng):
    """VERDICT r2 #7: the flagship geometry has BC=2^27 raw keys against a
    ~310M-distinct deNoise threshold — insertion lag ~0.43 of the threshold
    per sweep, far coarser than the toy ratios above.  Reproduce that RATIO
    at test scale and assert the production tight_denoise trigger (early
    merge once ndistinct + n_buf could cross, counter.build_spectrum)
    keeps the count-bearing spectrum within an explicit 2% drift bound of
    the reference's per-chunk cadence (CQF_mt.h:858-875)."""
    genome = random_genome(rng, 3000)
    reads = reads_from_genome(rng, genome, 2500, 80, error_rate=0.03)
    CAP = 1 << 17
    ref_spec, _ = _engine(reads, 0, 1 << 62, 16, 1 << 12, capacity=CAP)
    total_distinct = int(ref_spec.ndistinct)
    BC = 1 << 12
    threshold = int(BC / 0.43)  # flagship lag ratio: BC/threshold = 0.43
    assert threshold < total_distinct // 2, "workload too small for ratio"

    eng, stats = _engine(reads, ROUNDS, threshold, 16, BC, capacity=CAP)
    sim, sim_sweeps = _per_chunk_sim(reads, ROUNDS, threshold, 16,
                                     capacity=CAP)
    assert stats.sweeps == sim_sweeps > 0

    ce, cs = _counts(eng), _counts(sim)
    # symmetric-difference keys are bounded-singleton artifacts, exactly as
    # in the characterized test above
    for key in set(ce) ^ set(cs):
        assert max(ce.get(key, 0), cs.get(key, 0)) <= ROUNDS
    for key in set(ce) & set(cs):
        assert abs(ce[key] - cs[key]) <= ROUNDS
    solid_e = {k for k, v in ce.items() if v >= 2}
    solid_s = {k for k, v in cs.items() if v >= 2}
    drift = len(solid_e ^ solid_s) / max(len(solid_e | solid_s), 1)
    assert drift < 0.02, f"solid-set drift {drift:.3f} at flagship ratio"
