import os, time, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp

from sh_assembly_tpu.io import fastq as fq
from sh_assembly_tpu.models import contiger
from sh_assembly_tpu.ops import nthash, spectrum as sp

k = 28
qb = 22
kb = qb + 8
rng = np.random.default_rng(0)
G = 500_000
genome = rng.integers(0, 4, size=G).astype(np.uint8)
Lr = 100
n_reads = 150_000
B = 8192
batches = []
for i in range(0, n_reads, B):
    n = min(B, n_reads - i)
    starts = rng.integers(0, G - Lr, size=n)
    codes = np.full((B, Lr), 5, np.uint8)
    codes[:n] = genome[starts[:, None] + np.arange(Lr)]
    lengths = np.zeros(B, np.int32); lengths[:n] = Lr
    batches.append(fq.Batch(codes=codes, lengths=lengths, n_rows=n))

spec = sp.make(1 << qb, 1 << 21)
hashfn = jax.jit(lambda c, ln: nthash.windowed_canonical(c, ln, k)[0])
for b in batches:
    kk = hashfn(jnp.asarray(b.codes), jnp.asarray(b.lengths))
    valid = (jnp.arange(Lr - k + 1)[None, :] + k) <= jnp.asarray(b.lengths)[:, None]
    kk = jnp.where(valid, kk & jnp.uint64((1 << kb) - 1), sp.SENTINEL)
    spec = sp.insert(spec, kk.reshape(-1))
    spec = sp.merge(spec, kb)
jax.block_until_ready(spec.hi)
print("spectrum ready", int(spec.ndistinct), file=sys.stderr)

import cProfile, pstats
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
hi, lo, _ = contiger.collect_nodes(spec, iter(batches), k, kb, 2)
pr.disable()
print(f"collect_nodes: {time.time()-t0:.1f}s, {len(hi)} nodes", file=sys.stderr)
st = pstats.Stats(pr, stream=sys.stderr)
st.sort_stats("cumulative").print_stats(25)
