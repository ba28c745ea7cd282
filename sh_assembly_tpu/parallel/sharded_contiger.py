"""Multi-chip sharded Contiger: distributed node store, probe joins, and
count queries over the mesh.

The single-device Contiger (models/contiger) holds the whole node table and
issues its 9N count probes against a local spectrum.  Here both stores stay
sharded — the spectrum by key range (same ownership rule as counting,
parallel/sharded.py) and the node table by packed-kmer range — and every
cross-shard lookup is a sorted quota all_to_all round trip:

  count query:   pack (key | query-idx) -> sort -> slice per owner ->
                 all_to_all -> owner query_join -> pack (idx | count) ->
                 reverse all_to_all -> scatter by idx
  node join:     route (hi, lo, idx) by kmer owner -> owner join2 against
                 its table slice -> global index = shard * cap + local ->
                 reverse all_to_all

This distributes the reference's two big shared structures — the CQF the
workers probe 8x per extended base (src/contig_assembly.cpp:3064-3120) and
the TBB concurrent unitig map (core/unitig_graph.h:85-97) — without locks.
Contraction runs single-device on the gathered chain array (int32[2N]: even
the flagship's 330M nodes need only ~2.6 GB, see CAPACITY.md), and the host
assembly is the shared vectorized pass (contiger.finalize_unitigs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import config as cfg
from ..io import fastq
from ..models import contiger
from ..ops import kmerpack as kp, nthash, packio, spectrum as sp
from ..utils.logging import log
from .sharded import ShardedCounter

_U64 = jnp.uint64
U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _quota_rows(sorted_vals, bounds, n, Qd, sentinel):
    """Slice per-owner quota rows out of a sorted array -> ([n, Qd], dropped).

    bounds: int32[n+1] owner range boundaries into sorted_vals (already
    clamped to the valid prefix).
    """
    padded = jnp.concatenate(
        [sorted_vals, jnp.full((Qd,), sentinel, sorted_vals.dtype)])
    rows = []
    drop = jnp.zeros((), jnp.int64)
    iota = jnp.arange(Qd, dtype=jnp.int32)
    for o in range(n):
        start, end = bounds[o], bounds[o + 1]
        cnt = end - start
        row = jax.lax.dynamic_slice(padded, (start,), (Qd,))
        row = jnp.where(iota < cnt, row, sentinel)
        rows.append(row)
        drop = drop + jnp.maximum(cnt - Qd, 0).astype(jnp.int64)
    return jnp.stack(rows), drop


def _a2a(x):
    return jax.lax.all_to_all(x, "shard", split_axis=0, concat_axis=0,
                              tiled=False)


@dataclass(frozen=True)
class ShardedContiger:
    """Collective Contiger programs over the counting mesh."""

    counter: ShardedCounter
    k: int
    abundance_min: int
    node_cap_local: int  # node-table capacity per shard (power of two)
    quota_slack: float = 2.0

    @property
    def mesh(self):
        return self.counter.mesh

    @property
    def n_shards(self) -> int:
        return self.counter.n_shards

    @property
    def key_bits(self) -> int:
        return self.counter.key_bits

    # -- distributed count queries (round trip) ---------------------------
    def _dist_counts(self, spec_local, keys, Qd):
        """Inside shard_map: counts for local query keys [Q] against the
        key-range-sharded spectrum.  Returns (counts int32[Q], dropped)."""
        n = self.n_shards
        key_bits = self.key_bits
        if n == 1:
            return sp.query_join(spec_local, keys, key_bits), \
                jnp.zeros((), jnp.int64)
        Q = keys.shape[0]
        idx_bits = max(int(np.ceil(np.log2(max(Q, 2)))), 1)
        assert key_bits + idx_bits <= 63, "dist-count packing overflow"
        shard_bits = self.counter.shard_bits
        iota = jnp.arange(Q, dtype=jnp.uint64)
        valid = keys != sp.SENTINEL
        packed = jnp.where(
            valid, (keys << _U64(idx_bits)) | iota, U64MAX)
        sortp = sp.xsort(packed)
        n_valid = jnp.sum(valid, dtype=jnp.int32)
        kb = jnp.asarray(
            [o << (key_bits - shard_bits) for o in range(n + 1)],
            dtype=jnp.uint64) << _U64(idx_bits)
        bounds = jnp.minimum(
            jnp.searchsorted(sortp, kb).astype(jnp.int32), n_valid)
        send, drop = _quota_rows(sortp, bounds, n, Qd, U64MAX)
        recv = _a2a(send).reshape(-1)

        rkeys = jnp.where(recv == U64MAX, sp.SENTINEL,
                          recv >> _U64(idx_bits))
        rcounts = sp.query_join(spec_local, rkeys, key_bits)
        imask = _U64((1 << idx_bits) - 1)
        resp = jnp.where(
            recv == U64MAX, U64MAX,
            ((recv & imask) << _U64(32)) | rcounts.astype(jnp.uint64))
        back = _a2a(resp.reshape(n, Qd)).reshape(-1)

        ridx = (back >> _U64(32)).astype(jnp.int64)
        rcnt = (back & _U64(0xFFFFFFFF)).astype(jnp.int32)
        pos = jnp.where(ridx < Q, ridx, Q).astype(jnp.int32)
        counts = jnp.zeros((Q,), jnp.int32).at[pos].set(rcnt, mode="drop")
        return counts, drop

    # -- distributed node-table join (round trip) -------------------------
    def _dist_join(self, store_hi, store_lo, qhi, qlo, valid, Qd):
        """Inside shard_map: global node index per (qhi, qlo) query against
        the kmer-range-sharded node table (-1 = absent).  Returns
        (idx int64[Q], dropped)."""
        n = self.n_shards
        Cl = self.node_cap_local
        Q = qhi.shape[0]
        if n == 1:
            j = kp.join2(store_hi, store_lo, qhi, qlo).astype(jnp.int64)
            return jnp.where(valid, j, -1), jnp.zeros((), jnp.int64)
        idx_bits = max(int(np.ceil(np.log2(max(Q, 2)))), 1)
        shard_bits = self.counter.shard_bits
        iota = jnp.arange(Q, dtype=jnp.uint64)
        h = jnp.where(valid, qhi, U64MAX)
        l = jnp.where(valid, qlo, U64MAX)
        pay = jnp.where(valid, iota, U64MAX)
        sh, sl, so = sp.xsort((h, l, pay), num_keys=2)
        n_valid = jnp.sum(valid, dtype=jnp.int32)
        hb = jnp.asarray(
            [(o << (64 - shard_bits)) if o < n else 0xFFFFFFFFFFFFFFFF
             for o in range(n + 1)], dtype=jnp.uint64)
        bounds = jnp.minimum(
            jnp.searchsorted(sh, hb).astype(jnp.int32), n_valid)
        rh, d1 = _quota_rows(sh, bounds, n, Qd, U64MAX)
        rl, _ = _quota_rows(sl, bounds, n, Qd, U64MAX)
        ro, _ = _quota_rows(so, bounds, n, Qd, U64MAX)
        gh = _a2a(rh).reshape(-1)
        gl = _a2a(rl).reshape(-1)
        go = _a2a(ro).reshape(-1)

        j = kp.join2(store_hi, store_lo, gh, gl).astype(jnp.int64)
        me = jax.lax.axis_index("shard").astype(jnp.int64)
        gidx = jnp.where(j >= 0, me * Cl + j, -1)
        resp = jnp.where(
            go == U64MAX, U64MAX,
            (go << _U64(32)) | (gidx + 1).astype(jnp.uint64))
        back = _a2a(resp.reshape(n, Qd)).reshape(-1)

        ridx = (back >> _U64(32)).astype(jnp.int64)
        rval = (back & _U64(0xFFFFFFFF)).astype(jnp.int64) - 1
        pos = jnp.where((back != U64MAX) & (ridx < Q), ridx, Q) \
            .astype(jnp.int32)
        out = jnp.full((Q,), -1, jnp.int64).at[pos].set(rval, mode="drop")
        return out, d1

    # -- shared helpers ----------------------------------------------------
    def _route_and_merge(self, store_hi, store_lo, store_seed,
                         chi, clo, nflag, n_valid_hint, Qc):
        """Inside shard_map: route (kmer, inverted-seed-flag) triples to
        their owner shards by top kmer bits, then dedup-merge into the
        local sorted store (seed flags OR across duplicates via the
        inverted-flag sort key).  Returns (hi, lo, seed, n_store, drop)."""
        n = self.n_shards
        Cl = self.node_cap_local
        shard_bits = self.counter.shard_bits
        if n > 1:
            sh, sl, sf = sp.xsort((chi, clo, nflag), num_keys=2)
            hb = jnp.asarray(
                [(o << (64 - shard_bits)) if o < n
                 else 0xFFFFFFFFFFFFFFFF for o in range(n + 1)],
                dtype=jnp.uint64)
            bounds = jnp.minimum(
                jnp.searchsorted(sh, hb).astype(jnp.int32), n_valid_hint)
            rh, d1 = _quota_rows(sh, bounds, n, Qc, U64MAX)
            rl, _ = _quota_rows(sl, bounds, n, Qc, U64MAX)
            rf, _ = _quota_rows(sf, bounds, n, Qc, jnp.uint8(1))
            chi = _a2a(rh).reshape(-1)
            clo = _a2a(rl).reshape(-1)
            nflag = _a2a(rf).reshape(-1)
        else:
            d1 = jnp.zeros((), jnp.int64)

        # merge + dedup into the local store (sorted, SENTINEL tail)
        ah = jnp.concatenate([store_hi, chi])
        al = jnp.concatenate([store_lo, clo])
        nf = jnp.concatenate([jnp.uint8(1) - store_seed, nflag])
        sh2, sl2, sf2 = sp.xsort((ah, al, nf), num_keys=3)
        is_sent = (sh2 == U64MAX) & (sl2 == U64MAX)
        first = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh2[1:] != sh2[:-1]) | (sl2[1:] != sl2[:-1])])
        keep = first & ~is_sent
        kh = jnp.where(keep, sh2, U64MAX)
        kl = jnp.where(keep, sl2, U64MAX)
        kf = jnp.where(keep, jnp.uint8(1) - sf2, jnp.uint8(0))
        oh, ol, of_ = sp.xsort((kh, kl, kf), num_keys=2)
        n_store = jnp.sum(keep, dtype=jnp.int64)
        return oh[:Cl], ol[:Cl], of_[:Cl], n_store, d1

    # -- phase A: sharded node collection ----------------------------------
    def collect_fn(self, B: int, Lp: int):
        """jit fn(spec_v, store_hi, store_lo, store_seed, packed[B,Lp/4],
        nmask, lengths, seed_cols)
        -> (store_hi, store_lo, store_seed, n_store_v, dropped_v);
        rows sharded."""
        n = self.n_shards
        k, key_bits = self.k, self.key_bits
        mask = _U64((1 << key_bits) - 1)
        W = Lp - k + 1
        Bl = B // n
        Qc = int(np.ceil(Bl * W / max(n, 1) * self.quota_slack))

        def local_fn(spec_v, store_hi, store_lo, store_seed,
                     packed, nmask, lengths, seed_cols):
            spec = spec_v._replace(
                n_main=spec_v.n_main[0], n_buf=spec_v.n_buf[0],
                ndistinct=spec_v.ndistinct[0], nelts=spec_v.nelts[0])
            codes = packio.unpack(packed, nmask, Lp)
            SB = codes.shape[0]
            # u32-plane hash (VERDICT r4 weak #5): the u64 windowed hash
            # is vector-emulated on v5e; one u64 combine after masking is
            # a single op (the distributed count round trip still packs
            # u64 for routing)
            kh32, kl32, valid = nthash.windowed_canonical_planes(
                codes, lengths, k)
            keys = (kh32.astype(_U64) << _U64(32)) | kl32.astype(_U64)
            keys = jnp.where(valid, keys & mask, sp.SENTINEL)
            counts, d0 = self._dist_counts(spec, keys.reshape(-1), Qc)
            counts = counts.reshape(SB, W)

            bad = (codes >= 4).astype(jnp.int32)
            cbad = jnp.cumsum(bad, axis=1)
            nfree = (cbad[:, k - 1:] - jnp.concatenate(
                [jnp.zeros((SB, 1), jnp.int32), cbad[:, : W - 1]],
                axis=1)) == 0
            solid = valid & nfree & (counts >= self.abundance_min)
            is_seed = solid & (jnp.arange(W, dtype=jnp.int32)[None, :]
                               == seed_cols[:, None])

            hi, lo = kp.pack_windows(codes, k)
            rhi, rlo = kp.revcomp_packed(hi, lo, k)
            chi, clo, _ = kp.canonicalize(hi, lo, rhi, rlo)
            flat = solid.reshape(-1)
            chi = jnp.where(flat, chi.reshape(-1), U64MAX)
            clo = jnp.where(flat, clo.reshape(-1), U64MAX)
            nflag = jnp.where(is_seed.reshape(-1), jnp.uint8(0),
                              jnp.uint8(1))
            n_valid = jnp.sum(flat, dtype=jnp.int32)
            oh, ol, of_, n_store, d1 = self._route_and_merge(
                store_hi, store_lo, store_seed, chi, clo, nflag,
                n_valid, Qc)
            return (oh, ol, of_, n_store[None], (d0 + d1)[None])

        f = shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(self.counter._spec_pspec(), P("shard"), P("shard"),
                      P("shard"), P("shard"), P("shard"), P("shard"),
                      P("shard")),
            out_specs=(P("shard"),) * 5,
            check_vma=False)
        return sp.jit_collective(f, donate_argnums=(1, 2, 3))

    # -- phase A2: sharded phantom closure ---------------------------------
    def phantom_fn(self):
        """jit fn(spec_v, store_hi, store_lo, store_seed) ->
        (store_hi, store_lo, store_seed, n_store_v, n_new_v, dropped_v).

        One closure round of contiger.phantom_candidates over the mesh:
        each shard probes its nodes' 16 candidate k-mers (8 successors of
        both orientations + 8 suffix-siblings, the reference's candidate
        spawns, contig_assembly.cpp:3140-3165), keeps the count-passing
        ones absent from the distributed node table, and routes them to
        their owner shards.  Iterate until n_new == 0
        (assemble_unitigs_sharded).
        """
        n = self.n_shards
        k, key_bits = self.k, self.key_bits
        Cl = self.node_cap_local
        mask = _U64((1 << key_bits) - 1)
        Qc = int(np.ceil(16 * Cl / max(n, 1) * self.quota_slack))

        def local_fn(spec_v, store_hi, store_lo, store_seed):
            spec = spec_v._replace(
                n_main=spec_v.n_main[0], n_buf=spec_v.n_buf[0],
                ndistinct=spec_v.ndistinct[0], nelts=spec_v.nelts[0])
            hi, lo = store_hi, store_lo
            valid = ~((hi == U64MAX) & (lo == U64MAX))
            fh0, rh0 = contiger._node_hashes(hi, lo, k)
            rhi, rlo = kp.revcomp_packed(hi, lo, k)
            probe_keys, succ_hi, succ_lo, _ = contiger._succ_probes(
                hi, lo, rhi, rlo, fh0, rh0, k, mask)
            skeys, shi2, slo2 = contiger._sibling_probes(
                hi, lo, rhi, rlo, fh0, rh0, k, mask)
            probe_keys = probe_keys + skeys
            succ_hi = succ_hi + shi2
            succ_lo = succ_lo + slo2
            Pn = len(succ_hi)
            vall = jnp.tile(valid, Pn)
            pk = jnp.where(vall, jnp.concatenate(probe_keys), sp.SENTINEL)
            all_j, dj = self._dist_join(
                hi, lo, jnp.concatenate(succ_hi), jnp.concatenate(succ_lo),
                vall, Qc)
            cnts, dc = self._dist_counts(spec, pk, Qc)
            ph = (cnts >= self.abundance_min) & (all_j < 0) & vall
            chi = jnp.where(ph, jnp.concatenate(succ_hi), U64MAX)
            clo = jnp.where(ph, jnp.concatenate(succ_lo), U64MAX)
            nflag = jnp.ones(chi.shape, jnp.uint8)  # phantoms never seed
            n_valid = jnp.sum(ph, dtype=jnp.int32)
            old_n = jnp.sum(valid, dtype=jnp.int64)
            oh, ol, of_, n_store, d1 = self._route_and_merge(
                store_hi, store_lo, store_seed, chi, clo, nflag,
                n_valid, Qc)
            n_new = jax.lax.psum(n_store - old_n, "shard")
            return (oh, ol, of_, n_store[None], n_new[None],
                    (dj + dc + d1)[None])

        f = shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(self.counter._spec_pspec(), P("shard"), P("shard"),
                      P("shard")),
            out_specs=(P("shard"),) * 6,
            check_vma=False)
        return sp.jit_collective(f, donate_argnums=(1, 2, 3))

    # -- phase B: sharded probe/graph build --------------------------------
    def probe_fn(self):
        """jit fn(spec_v, store_hi, store_lo) ->
        (ecount[2Cl], succ_gidx[2Cl], succ_orient[2Cl], node_counts[Cl],
         valid[Cl], dropped) per shard; indices are GLOBAL (shard*Cl+j)."""
        n = self.n_shards
        k, key_bits = self.k, self.key_bits
        Cl = self.node_cap_local
        mask = _U64((1 << key_bits) - 1)
        Qc = int(np.ceil(9 * Cl / max(n, 1) * self.quota_slack))
        Qj = int(np.ceil(8 * Cl / max(n, 1) * self.quota_slack))

        def local_fn(spec_v, store_hi, store_lo):
            spec = spec_v._replace(
                n_main=spec_v.n_main[0], n_buf=spec_v.n_buf[0],
                ndistinct=spec_v.ndistinct[0], nelts=spec_v.nelts[0])
            hi, lo = store_hi, store_lo
            valid = ~((hi == U64MAX) & (lo == U64MAX))
            fh0, rh0 = contiger._node_hashes(hi, lo, k)
            node_keys = jnp.where(valid, jnp.minimum(fh0, rh0) & mask,
                                  sp.SENTINEL)
            rhi, rlo = kp.revcomp_packed(hi, lo, k)

            seeds = nthash.seed_table()
            cseeds = nthash.cseed_table()
            probe_keys = [node_keys]
            succ_hi, succ_lo, succ_flip = [], [], []
            for o in range(2):
                ohi = hi if o == 0 else rhi
                olo = lo if o == 0 else rlo
                ofh = fh0 if o == 0 else rh0
                orh = rh0 if o == 0 else fh0
                out_b = kp.first_base(ohi, olo, k)
                for X in range(4):
                    sfh = contiger._rol(ofh, 1) ^ \
                        contiger._rol(seeds[out_b], k % 64) ^ seeds[X]
                    srh = contiger._rol(orh, 63) ^ \
                        contiger._rol(cseeds[out_b], 63) ^ \
                        contiger._rol(cseeds[X], (k - 1) % 64)
                    pk = jnp.where(valid, jnp.minimum(sfh, srh) & mask,
                                   sp.SENTINEL)
                    probe_keys.append(pk)
                    shi, slo = kp.shift_in_base(ohi, olo, jnp.uint64(X), k)
                    srchi, srclo = kp.revcomp_packed(shi, slo, k)
                    schi, sclo, sflip = kp.canonicalize(shi, slo, srchi,
                                                        srclo)
                    succ_hi.append(schi)
                    succ_lo.append(sclo)
                    succ_flip.append(sflip.astype(jnp.int32))

            vall = jnp.tile(valid, 8)
            all_j, dj = self._dist_join(
                hi, lo, jnp.concatenate(succ_hi), jnp.concatenate(succ_lo),
                vall, Qj)
            all_j = all_j.reshape(8, Cl)

            all_counts, dc = self._dist_counts(
                spec, jnp.concatenate(probe_keys), Qc)
            all_counts = all_counts.reshape(9, Cl)
            node_counts = all_counts[0]

            ecount_o, sj_o, sp_o = [], [], []
            for o in range(2):
                exist, tgt_j, tgt_p = [], [], []
                for X in range(4):
                    scnt = all_counts[1 + o * 4 + X]
                    e = (scnt >= self.abundance_min) & valid
                    exist.append(e)
                    tgt_j.append(all_j[o * 4 + X])
                    tgt_p.append(succ_flip[o * 4 + X])
                ec = sum(e.astype(jnp.int32) for e in exist)
                uj = sum(jnp.where(e, j, 0) for e, j in zip(exist, tgt_j))
                up = sum(jnp.where(e, p_, 0) for e, p_ in zip(exist, tgt_p))
                ecount_o.append(ec)
                sj_o.append(uj)
                sp_o.append(up)
            ecount = jnp.stack(ecount_o, axis=1).reshape(-1)
            sj = jnp.stack(sj_o, axis=1).reshape(-1)
            so_ = jnp.stack(sp_o, axis=1).reshape(-1)
            return (ecount, sj, so_, node_counts,
                    valid, (dj + dc)[None])

        f = shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(self.counter._spec_pspec(), P("shard"), P("shard")),
            out_specs=(P("shard"),) * 5 + (P("shard"),),
            check_vma=False)
        return sp.jit_collective(f)


def assemble_unitigs_sharded(
    sc: ShardedCounter,
    spec_v: sp.Spectrum,
    batches: Iterable[fastq.Batch],
    params: cfg.ContigerParams,
    node_cap_local: int | None = None,
    quota_slack: float = 2.0,
) -> contiger.ArrayUnitigs:
    """Full Contiger over a sharded spectrum -> ArrayUnitigs.

    Phases A and B (node collection, 9N probes, successor joins) run
    sharded over the mesh; contraction and host assembly are the shared
    single-device tail (contiger.finalize_unitigs).
    """
    k = params.k
    n = sc.n_shards
    contiger.check_solid_cap(sc.key_bits, params.solid_kmer_abundance_max)
    if node_cap_local is None:
        nd = max(int(np.asarray(spec_v.ndistinct).sum()), 1024)
        per = nd // n + nd // (8 * n) + 1024
        node_cap_local = 1 << int(np.ceil(np.log2(per)))
    st = ShardedContiger(counter=sc, k=k,
                         abundance_min=params.kmer_abundance_min,
                         node_cap_local=node_cap_local,
                         quota_slack=quota_slack)

    # ---- phase A over host batches ----------------------------------------
    row_sh = NamedSharding(sc.mesh, P("shard"))
    store_hi = jax.device_put(
        np.full((n * node_cap_local,), 0xFFFFFFFFFFFFFFFF, np.uint64), row_sh)
    store_lo = jax.device_put(
        np.full((n * node_cap_local,), 0xFFFFFFFFFFFFFFFF, np.uint64), row_sh)
    store_seed = jax.device_put(
        np.zeros((n * node_cap_local,), np.uint8), row_sh)
    n_peak = 0
    collect = None
    B = Lp = None
    dropped_total = 0
    saw_seed_meta = False
    for b in batches:
        if isinstance(b, fastq.PackedBatch):
            # native transport format: already 2-bit packed + N-masked
            packed, nmask, Lp_b, rows = b.packed, b.nmask, b.row_len, \
                b.packed.shape[0]
        else:
            codes = b.codes
            L = codes.shape[1]
            Lp_b = (L + 7) // 8 * 8
            if Lp_b != L:
                codes = np.pad(codes, ((0, 0), (0, Lp_b - L)),
                               constant_values=5)
            packed, nmask = packio.pack_np(codes)
            rows = codes.shape[0]
        if Lp is None:
            Lp, B = Lp_b, rows
            if B % n:
                raise ValueError(f"batch rows {B} not divisible by mesh {n}")
            collect = st.collect_fn(B, Lp)
        if Lp_b != Lp or rows != B:
            raise ValueError("mixed batch geometry")
        if b.seed_col is not None:
            saw_seed_meta = True
            seedc = np.asarray(b.seed_col, np.int32)
        else:
            seedc = np.full(rows, -1, np.int32)
        store_hi, store_lo, store_seed, n_store_v, dropped_v = collect(
            spec_v, store_hi, store_lo, store_seed,
            jax.device_put(packed, row_sh), jax.device_put(nmask, row_sh),
            jax.device_put(b.lengths, row_sh),
            jax.device_put(seedc, row_sh))
        n_peak = max(n_peak, int(np.asarray(n_store_v).max()))
        dropped_total += int(np.asarray(dropped_v).sum())
    if collect is None:
        return contiger.ArrayUnitigs.empty(k)
    if dropped_total:
        raise RuntimeError(
            f"sharded collect dropped {dropped_total} routed k-mers: raise "
            f"quota_slack")
    if n_peak >= node_cap_local:
        raise RuntimeError(
            f"node store overflow: shard peak {n_peak} reached cap "
            f"{node_cap_local}; pass a larger node_cap_local")

    # ---- phase A2: phantom closure ----------------------------------------
    phantom = st.phantom_fn()
    max_rounds = 8
    for _round in range(max_rounds):
        (store_hi, store_lo, store_seed, n_store_v, n_new_v,
         dropped_v) = phantom(spec_v, store_hi, store_lo, store_seed)
        if int(np.asarray(dropped_v).sum()):
            raise RuntimeError(
                "sharded phantom closure dropped routed k-mers: raise "
                "quota_slack")
        n_peak = max(n_peak, int(np.asarray(n_store_v).max()))
        if n_peak >= node_cap_local:
            raise RuntimeError(
                f"node store overflow during phantom closure: shard peak "
                f"{n_peak} reached cap {node_cap_local}")
        n_new = int(np.asarray(n_new_v).max())
        if n_new == 0:
            break
        log(f"[Contiger/sharded] phantom closure round {_round + 1}: "
            f"{n_new} nodes added")
    else:
        raise RuntimeError(
            f"sharded phantom closure not converged after {max_rounds} "
            f"rounds: the node set would silently diverge from reference "
            f"candidate semantics; raise key_bits (hash collisions are "
            f"pathologically dense)")

    # ---- phase B ----------------------------------------------------------
    probe = st.probe_fn()
    ecount, sj, so_, node_counts, valid, dropped_v = probe(
        spec_v, store_hi, store_lo)
    if int(np.asarray(dropped_v).sum()):
        raise RuntimeError("sharded probe dropped routed queries: raise "
                           "quota_slack")

    # ---- combine chain rule on host (global numbering) --------------------
    Npt = n * node_cap_local
    ec = np.asarray(ecount).astype(np.int64)  # [2*Npt] interleaved per shard
    sjg = np.asarray(sj).astype(np.int64)
    sog = np.asarray(so_).astype(np.int64)
    target = np.where(sjg >= 0, 2 * sjg + sog, -1)
    flip_target = np.where(sjg >= 0, 2 * sjg + (1 - sog), -1)
    # clamp: lanes with ecount != 1 carry garbage summed indices (masked
    # out by the ok rule below, but numpy gathers don't clip like XLA's)
    ft = np.clip(flip_target, 0, 2 * Npt - 1)
    ok = (ec == 1) & (target >= 0) & (ec[ft] == 1)
    a_idx = np.arange(2 * Npt, dtype=np.int64)
    ok &= (target != a_idx) & (target != (a_idx ^ 1))
    chain_next = np.where(ok, target, -1).astype(np.int32)

    real = np.asarray(valid)
    log(f"[Contiger/sharded] {int(real.sum())} distinct solid k-mers over "
        f"{n} shards (peak shard fill {n_peak}/{node_cap_local})")
    is_seed = (np.asarray(store_seed) != 0) if saw_seed_meta else None
    return contiger.finalize_unitigs(
        jnp.asarray(np.asarray(store_hi)), jnp.asarray(np.asarray(store_lo)),
        real, jnp.asarray(np.asarray(node_counts)),
        jnp.asarray(chain_next), params, is_seed=is_seed)
