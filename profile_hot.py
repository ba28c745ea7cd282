"""Decompose the counting hot path cost on the real chip.

Times, at the bench geometry (qb=28, BC=2^27, k=47):
  1. unpack+hash only          (windowed_canonical_planes on packed batches)
  2. hash+append (no merge)    (append_scan_packed, fresh buffer)
  3. buffer sort variants      (pair u32 sort / u64 packed sort / single u32)
  4. merge kernel pass alone   (merge_planes on presorted planes)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from sh_assembly_tpu.models import counter
from sh_assembly_tpu.ops import nthash, packio, spectrum as sp
from sh_assembly_tpu.ops import merge_pallas as mp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

k = 47
qb = 28
key_bits = qb + 8
C, BC = 1 << qb, 1 << 27
S, B, L = 8, 8192, 160
W = L - k + 1
keys_per_super = S * B * W

rng = np.random.default_rng(1)
genome = rng.integers(0, 4, size=8_000_000).astype(np.uint8)

def make_super():
    starts = rng.integers(0, len(genome) - L, size=(S, B))
    codes = genome[(starts[..., None] + np.arange(L))]
    pk = np.empty((S, B, L // 4), np.uint8)
    nm = np.empty((S, B, L // 8), np.uint8)
    for s in range(S):
        pk[s], nm[s] = packio.pack_np(codes[s])
    return (jax.device_put(jnp.asarray(pk)), jax.device_put(jnp.asarray(nm)),
            jax.device_put(jnp.asarray(np.full((S, B), L, np.int32))))

sup = make_super()

# --- 1. unpack + hash only -------------------------------------------------
@jax.jit
def hash_only(pk, nm, ln):
    acc_h = jnp.zeros((), jnp.uint32)
    acc_l = jnp.zeros((), jnp.uint32)
    def body(carry, xs):
        ah, al = carry
        p, m, l = xs
        codes = packio.unpack(p, m, L)
        kh, kl, valid = nthash.windowed_canonical_planes(codes, l, k)
        return (ah ^ jnp.bitwise_xor.reduce(kh.reshape(-1)),
                al ^ jnp.bitwise_xor.reduce(kl.reshape(-1))), ()
    (ah, al), _ = jax.lax.scan(body, (acc_h, acc_l), sup)
    return ah, al

r = jax.block_until_ready(hash_only(*sup))
t0 = time.time(); r = jax.block_until_ready(hash_only(*sup)); dt = time.time() - t0
log(f"hash-only: {dt*1e3:.1f}ms for {keys_per_super} keys = {dt/keys_per_super*1e9:.2f} ns/key ({keys_per_super/dt/1e6:.0f}M/s)")

# --- 2. hash+append (no merge) --------------------------------------------
# chain several dependent dispatches so tunnel latency amortizes out
REP = 8
spec = sp.make(C, BC)
spec = counter.append_scan_packed(spec, *sup, k, key_bits, L)
spec = spec._replace(n_buf=jnp.zeros((), jnp.int64))
jax.block_until_ready(spec.hi)
t0 = time.time()
for _ in range(REP):
    spec = counter.append_scan_packed(spec, *sup, k, key_bits, L)
    spec = spec._replace(n_buf=jnp.zeros((), jnp.int64))
jax.block_until_ready(spec.hi)
dt = (time.time() - t0) / REP
log(f"hash+append: {dt*1e3:.1f}ms = {dt/keys_per_super*1e9:.2f} ns/key ({keys_per_super/dt/1e6:.0f}M/s)")

# --- 3. sorts --------------------------------------------------------------
kk = jax.random.key(0)
bh = jax.random.bits(kk, (BC,), jnp.uint32) & jnp.uint32((1 << (key_bits - 32)) - 1)
bl = jax.random.bits(jax.random.fold_in(kk, 1), (BC,), jnp.uint32)
bh, bl = jax.block_until_ready((bh, bl))

pair = jax.jit(lambda h, l: jax.lax.sort((h, l), num_keys=2))
r = jax.block_until_ready(pair(bh, bl))
t0 = time.time(); r = jax.block_until_ready(pair(bh, bl)); t_pair = time.time() - t0

u64s = jax.jit(lambda h, l: jax.lax.sort((h.astype(jnp.uint64) << jnp.uint64(32)) | l.astype(jnp.uint64)))
r = jax.block_until_ready(u64s(bh, bl))
t0 = time.time(); r = jax.block_until_ready(u64s(bh, bl)); t_u64 = time.time() - t0

u32s = jax.jit(lambda l: jax.lax.sort(l))
r = jax.block_until_ready(u32s(bl))
t0 = time.time(); r = jax.block_until_ready(u32s(bl)); t_u32 = time.time() - t0

log(f"sort 2^27: pair(u32,u32) {t_pair*1e3:.0f}ms | u64 {t_u64*1e3:.0f}ms | single u32 {t_u32*1e3:.0f}ms")

# sort a quarter (2^25) for scaling law
q = BC // 4
pair_q = jax.jit(lambda h, l: jax.lax.sort((h[:q], l[:q]), num_keys=2))
r = jax.block_until_ready(pair_q(bh, bl))
t0 = time.time(); r = jax.block_until_ready(pair_q(bh, bl)); t_pq = time.time() - t0
log(f"sort 2^25 pair: {t_pq*1e3:.0f}ms (4x = {4*t_pq*1e3:.0f}ms vs {t_pair*1e3:.0f}ms)")

# --- 4. merge kernel pass alone -------------------------------------------
Lw, A = mp.DEF_WINDOW, mp.DEF_ALIGN
C_pad = mp._pad_len(C, Lw, A)
BC_pad = mp._pad_len(BC, Lw, A)
mh = jnp.full((C_pad,), sp.SENT32, jnp.uint32)
ml = jnp.full((C_pad,), sp.SENT32, jnp.uint32)
# fill main with ~134M sorted entries
keys = jax.block_until_ready(u64s(bh, bl))
kshift = 64 - key_bits
n_half = C // 2
mh = mh.at[:n_half].set((keys[:n_half] >> jnp.uint64(32)).astype(jnp.uint32) << jnp.uint32(kshift - 32) if kshift >= 32 else 0)
# simpler: pack keys<<kshift | 1
pk64 = (keys[:n_half] << jnp.uint64(kshift)) | jnp.uint64(1)
mh = jnp.full((C_pad,), sp.SENT32, jnp.uint32).at[:n_half].set((pk64 >> jnp.uint64(32)).astype(jnp.uint32))
ml = jnp.full((C_pad,), sp.SENT32, jnp.uint32).at[:n_half].set(pk64.astype(jnp.uint32))
bk64 = keys << jnp.uint64(kshift)
bh2 = jnp.full((BC_pad,), sp.SENT32, jnp.uint32).at[:BC].set((bk64 >> jnp.uint64(32)).astype(jnp.uint32))
bl2 = jnp.full((BC_pad,), sp.SENT32, jnp.uint32).at[:BC].set(bk64.astype(jnp.uint32))
mh, ml, bh2, bl2 = jax.block_until_ready((mh, ml, bh2, bl2))

mfn = jax.jit(lambda a,b,c,d: mp.merge_planes(a,b,c,d, key_bits, False))
r = jax.block_until_ready(mfn(mh, ml, bh2, bl2))
t0 = time.time(); r = jax.block_until_ready(mfn(mh, ml, bh2, bl2)); t_mp = time.time() - t0
n_el = C_pad + BC_pad
log(f"merge kernel pass: {t_mp*1e3:.0f}ms for {n_el/1e6:.0f}M el = {t_mp/n_el*1e9:.2f} ns/el, {16*n_el/t_mp/1e9:.0f} GB/s eff")
log("done")
