"""Flagship-scale stage-2 sizing probe (VERDICT r4 #8, CAPACITY.md input).

Runs the Contiger's device passes at the flagship counting geometry
(qb=28, C=2^28, ~134M distinct) with the largest node store that fits
beside the spectrum (N=2^25 = 33.5M nodes by default), on real genome-
derived k-mers so successor probes hit and chains contract.

Prints measured constants for the CAPACITY.md stage-2 section.
"""
import sys, time
import numpy as np
import sh_assembly_tpu
import jax, jax.numpy as jnp

from sh_assembly_tpu.models import contiger
from sh_assembly_tpu.ops import spectrum as sp

def log(*a): print(*a, file=sys.stderr, flush=True)

k = 47
qb = 28
key_bits = qb + 8
C, BC = 1 << qb, 1 << 26  # small buffer: only used for the fill
Nl = int(sys.argv[1]) if len(sys.argv) > 1 else 25
N = 1 << Nl

rng = np.random.default_rng(7)
t_all = time.time()

# --- node k-mers: consecutive genome windows, packed left-aligned -------
G = N + k
genome = rng.integers(0, 4, size=G).astype(np.uint64)
hp = np.zeros(N, np.uint64)
lp = np.zeros(N, np.uint64)
for j in range(k):
    sh_amt = 126 - 2 * j
    col = genome[j : j + N]
    if sh_amt >= 64:
        hp |= col << np.uint64(sh_amt - 64)
    else:
        lp |= col << np.uint64(sh_amt)
log(f"built {N/1e6:.1f}M node kmers ({time.time()-t_all:.0f}s)")

# --- spectrum: genome keys (so probes hit) + random to flagship load ----
dh = jnp.asarray(hp)
dl = jnp.asarray(lp)
fh, rh = contiger._node_hashes(dh, dl, k)
gkeys = jnp.minimum(fh, rh) & jnp.uint64((1 << key_bits) - 1)
spec = sp.make(C, BC)
CH = 1 << 26
for i in range(0, N, CH):
    spec = sp.insert(spec, gkeys[i : i + CH])
    spec = sp.merge(spec, key_bits)
# counts >= 2 everywhere so the abundance filter passes: re-insert
for i in range(0, N, CH):
    spec = sp.insert(spec, gkeys[i : i + CH])
    spec = sp.merge(spec, key_bits)
del gkeys, fh, rh
# random filler to ~134M distinct
@jax.jit
def rand_keys(seed):
    kk = jax.random.key(seed)
    a = jax.random.bits(kk, (CH,), jnp.uint32).astype(jnp.uint64)
    b2 = jax.random.bits(jax.random.fold_in(kk, 1), (CH,), jnp.uint32
                         ).astype(jnp.uint64)
    return ((a << jnp.uint64(32)) | b2) & jnp.uint64((1 << key_bits) - 1)
target = 134_000_000
while int(np.asarray(spec.ndistinct)) < target:
    spec = sp.insert(spec, rand_keys(int(np.asarray(spec.ndistinct)) & 0xFFFF))
    spec = sp.insert(spec, rand_keys((int(np.asarray(spec.ndistinct)) & 0xFFFF) | 1))
    spec = sp.merge(spec, key_bits)
n_loaded = int(np.asarray(spec.ndistinct))
log(f"spectrum loaded: {n_loaded/1e6:.0f}M distinct at load "
    f"{n_loaded/C:.2f} ({time.time()-t_all:.0f}s)")

# --- probe + contract timing -------------------------------------------
def run():
    t0 = time.time()
    nsucc, chain_next, ncnt = contiger.build_oriented_graph(
        spec, dh, dl, k, key_bits, 2)
    jax.block_until_ready(chain_next)
    cn = np.asarray(chain_next)
    t_probe = time.time() - t0
    t0 = time.time()
    head, dist, is_tail = contiger.contract_paths_host(cn)
    t_contract = time.time() - t0
    return t_probe, t_contract, cn

try:
    run()  # compile
    t_probe, t_contract, cn = run()
    n_chain = int((cn >= 0).sum())
    log(f"stage2-flagship(qb={qb}, N={N/1e6:.1f}M nodes, "
        f"{n_loaded/1e6:.0f}M-key spectrum):")
    log(f"  probe (build_oriented_graph): {t_probe:.2f}s = "
        f"{N/t_probe/1e6:.2f}M nodes/s")
    log(f"  contract (native host walk):  {t_contract:.2f}s = "
        f"{N/t_contract/1e6:.2f}M nodes/s ({n_chain} chain edges)")
    log(f"  total stage2 device+host: {t_probe+t_contract:.2f}s")
except Exception as e:
    log(f"FAILED at N=2^{Nl}: {type(e).__name__}: {str(e)[:200]}")
log(f"total {time.time()-t_all:.0f}s")
