"""Pipeline configuration and CQF-deNoise sizing math.

Reimplements, bit-for-bit where it matters, the sizing/scheduling decisions of
the reference counting stage:

  * Poisson deNoise-round selection  (mean_CDF2deNoise, cqf/CQF_mt.h:94-133)
  * slot sizing and round shrinking  (src/CQF-deNoise.cpp:96-161)
  * error-profile true:false DP      (cqf/true2falseKmer_DP.cpp:12-51)

The TPU engine does not use slots, but qb determines the hash range
(range = 2^(qb+8)) and therefore the collision behavior that parity with the
reference requires, and the deNoise trigger threshold controls which k-mers
survive sweeps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def _poisson_cdf(x: float, mean: float) -> float:
    """P(X <= x) for X ~ Poisson(mean); x truncated to an integer."""
    n = int(math.floor(x))
    if n < 0:
        return 0.0
    if mean <= 0:
        return 1.0
    # Stable log-space accumulation.
    logmean = math.log(mean)
    total = 0.0
    for i in range(n + 1):
        total += math.exp(i * logmean - mean - math.lgamma(i + 1))
        if i > mean and math.exp(i * logmean - mean - math.lgamma(i + 1)) < 1e-18 * total:
            break
    return min(total, 1.0)


def cdfpoi_positive(x: float, mean: float) -> float:
    """CDF of a positive (zero-truncated) Poisson (cqf/CQF_mt.h:84-92)."""
    cdf0 = _poisson_cdf(0, mean)
    return (_poisson_cdf(x, mean) - cdf0) / (1 - cdf0)


def mean_CDF2deNoise(mean: float, cdf_desired: float) -> int:
    """Smallest #rounds whose positive-Poisson CDF covers cdf_desired.

    Faithful port of the integer binary search in cqf/CQF_mt.h:94-133
    (including its off-by-one quirks) so that chosen round counts match the
    reference for identical inputs.
    """
    start, end = 0, int(mean + 1)
    cdf0 = _poisson_cdf(0, mean)

    def cdf_positive(x):
        return (_poisson_cdf(x, mean) - cdf0) / (1 - cdf0)

    while cdf_positive(end) < cdf_desired:
        end *= 2
    while start <= end:
        if start == end:
            return start
        if start + 1 == end:
            if cdf_positive(end) <= cdf_desired:
                return end
            if cdf_positive(start) <= cdf_desired:
                return start
            return max(start - 1, 0)
        mid = (start + end) // 2
        cdf = cdf_positive(mid)
        if cdf < cdf_desired:
            start = mid + 1
        elif cdf > cdf_desired:
            end = mid - 1
        else:
            return start
    return start


def true2false_kmer_dp(base_errors: list[float], k: int) -> float:
    """Expected true:false k-mer ratio of a read given per-base error rates.

    DP over "bases since the last error" (cqf/true2falseKmer_DP.cpp:12-51).
    """
    seq_len = len(base_errors)
    dp = [0.0] * (k + 1)
    tmp = 1.0
    for x in range(k):
        tmp *= 1 - base_errors[x]
    dp[0] = tmp
    for x in range(1, k + 1):
        tmp = base_errors[x - 1]
        for y in range(x, k):
            tmp *= 1 - base_errors[y]
        dp[x] = tmp

    true_p = dp[0]
    for x in range(k, seq_len):
        new_dp = [0.0] * (k + 1)
        new_dp[0] = dp[0] * (1 - base_errors[x])
        for y in range(1, k + 1):
            new_dp[y - 1] += dp[y] * (1 - base_errors[x])
        new_dp[k] = base_errors[x]
        true_p += new_dp[0]
        dp = new_dp
    return true_p / (seq_len - k + 1 - true_p)


@dataclass
class CounterSizing:
    """Resolved counting-stage parameters (mirrors CQF-deNoise.cpp:96-161)."""

    k: int
    qb: int
    hb: int
    num_true_kmers: int  # total true k-mer occurrences N*(1-a)^K
    num_false_kmers: int
    n_true_kmers: int  # distinct true k-mers (CLI -n)
    num_deNoise: int
    ndistinct_for_deNoise: int
    end_deNoise: bool
    fr: float

    @property
    def range(self) -> int:
        """Hash range = nslots << 8 (qf_init, gqf.c:2230-2231 with hb=qb+8)."""
        return 1 << (self.qb + 8)

    @property
    def nslots(self) -> int:
        return 1 << self.qb


def size_counter(
    k: int,
    n_true_kmers: int,
    total_kmers: int,
    alpha: float = -1.0,
    error_profile: list[float] | None = None,
    fr: float = 0.0,
    num_deNoise: int = -1,
    end_deNoise: bool = False,
) -> CounterSizing:
    """Replicates the CQF-deNoise main sizing block (CQF-deNoise.cpp:96-161)."""
    if alpha == -1.0:
        if error_profile is None:
            raise ValueError("either alpha or error_profile is required")
        ratio = true2false_kmer_dp(error_profile, k)
        num_true = int(total_kmers * ratio / (1 + ratio))
    else:
        num_true = int(total_kmers * math.pow(1 - alpha, k))
    num_false = total_kmers - num_true

    if num_deNoise < 0:
        if not fr:
            fr = 1.0 / n_true_kmers
        num_deNoise = mean_CDF2deNoise(num_true // n_true_kmers, fr)

    enc = 0
    tmp = num_true // n_true_kmers + 1
    while tmp:
        tmp >>= 7
        enc += 1

    def slots(rounds: int) -> int:
        return int(n_true_kmers * (enc + 1.5) + num_false * 10 // ((rounds + 1) * 9))

    num_slots = slots(num_deNoise)
    qb, base = 1, 2
    while base < num_slots:
        qb += 1
        base <<= 1
    # Shrink rounds while the result still fits the same power of two.
    tmp_slots = num_slots
    while num_deNoise and tmp_slots < (1 << qb):
        num_deNoise -= 1
        tmp_slots = slots(num_deNoise)
    if tmp_slots >= (1 << qb):
        num_deNoise += 1
    ndistinct_for_deNoise = n_true_kmers + num_false // (num_deNoise + 1)

    return CounterSizing(
        k=k,
        qb=qb,
        hb=qb + 8,
        num_true_kmers=num_true,
        num_false_kmers=num_false,
        n_true_kmers=n_true_kmers,
        num_deNoise=num_deNoise,
        ndistinct_for_deNoise=ndistinct_for_deNoise,
        end_deNoise=end_deNoise,
        fr=fr,
    )


@dataclass
class ContigerParams:
    """Contiger stage parameters (reference: base/Params.h:14-61)."""

    k: int
    kmer_abundance_min: int = 2
    solid_kmer_abundance_min: int = 2
    solid_kmer_abundance_max: int = 1_000_000
    output: str = "unitigs.fa"


@dataclass
class BatchConfig:
    """Device batch geometry for the streaming stages."""

    reads_per_batch: int = 8192
    max_read_len: int = 160  # longer (sub-)reads are tiled with k-1 overlap

    @property
    def windows_per_batch(self) -> int:
        return self.reads_per_batch * self.max_read_len
