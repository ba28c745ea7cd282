"""Multi-chip sharded counting: mesh, key routing, collective sweeps.

The reference scales counting with 16 pthread workers over one lock-sharded
filter (one spinlock per 2^16 slots, gqf.h:31; local overflow QFs,
CQF_mt.h:57).  The TPU design shards the *key space* instead: device i of an
n-device mesh owns keys whose top log2(n) bits equal i, so the concatenation
of per-device sorted spectra is the globally sorted spectrum.  Every device
plays both roles of the reference's workers — it hashes its own slice of the
read batch (data parallelism) and owns a key range (the lock shard,
locklessly):

  step:   hash local reads -> all_gather keys over the mesh -> keep the
          keys this device owns -> local sorted-spectrum insert
  merge:  per-shard sort-merge (no communication)
  sweep:  deNoise compaction on every shard, triggered by the psum'd
          global distinct count crossing the reference threshold
          (CQF_runtime_mt::needDeNoise, CQF_mt.h:307-313)

all_gather+mask is the v1 routing (O(n*B) traffic); a sorted all_to_all
exchange is the planned upgrade for large meshes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import nthash, spectrum as sp

_U64 = jnp.uint64


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("shard",))


@dataclass(frozen=True)
class ShardedCounter:
    """Compiled collective counting programs over a fixed mesh."""

    mesh: Mesh
    k: int
    key_bits: int
    local_capacity: int
    local_buf_capacity: int

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    @property
    def shard_bits(self) -> int:
        return int(np.log2(self.n_shards))

    def _spec_pspec(self):
        # every Spectrum leaf is sharded on axis 0 except the scalars
        return sp.Spectrum(
            keys=P("shard"), counts=P("shard"), traveled=P("shard"),
            buf_keys=P("shard"),
            n_main=P("shard"), n_buf=P("shard"), ndistinct=P("shard"),
            nelts=P("shard"),
        )

    def init(self) -> sp.Spectrum:
        """Per-device empty spectra; scalar leaves become length-n vectors."""
        n = self.n_shards

        def mk():
            local = sp.make(self.local_capacity, self.local_buf_capacity)
            return local._replace(
                n_main=local.n_main[None], n_buf=local.n_buf[None],
                ndistinct=local.ndistinct[None], nelts=local.nelts[None])

        f = shard_map(mk, mesh=self.mesh, in_specs=(),
                      out_specs=self._spec_pspec(), check_vma=False)
        return jax.jit(f)()

    def step_fn(self):
        """jit'd (spec, codes, lengths) -> spec — one counting superstep."""
        k, key_bits = self.k, self.key_bits
        shard_bits = self.shard_bits
        mask = _U64((1 << key_bits) - 1)
        owner_shift = _U64(key_bits - shard_bits) if shard_bits else None

        def local_step(spec_v, codes, lengths):
            spec = spec_v._replace(
                n_main=spec_v.n_main[0], n_buf=spec_v.n_buf[0],
                ndistinct=spec_v.ndistinct[0], nelts=spec_v.nelts[0])
            keys, valid = nthash.windowed_canonical(codes, lengths, k)
            keys = jnp.where(valid, keys & mask, sp.SENTINEL)
            all_keys = jax.lax.all_gather(keys.reshape(-1), "shard")
            if owner_shift is not None:
                me = jax.lax.axis_index("shard").astype(jnp.uint64)
                mine = (all_keys >> owner_shift) == me
            else:
                mine = all_keys != sp.SENTINEL
            routed = jnp.where(mine, all_keys, sp.SENTINEL)
            out = sp.insert(spec, routed.reshape(-1))
            return out._replace(
                n_main=out.n_main[None], n_buf=out.n_buf[None],
                ndistinct=out.ndistinct[None], nelts=out.nelts[None])

        f = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(self._spec_pspec(), P("shard"), P("shard")),
            out_specs=self._spec_pspec(), check_vma=False)
        return jax.jit(f, donate_argnums=(0,))

    def merge_fn(self, drop_singletons: bool = False):
        key_bits = self.key_bits

        def local_merge(spec_v):
            spec = spec_v._replace(
                n_main=spec_v.n_main[0], n_buf=spec_v.n_buf[0],
                ndistinct=spec_v.ndistinct[0], nelts=spec_v.nelts[0])
            out = sp.merge(spec, key_bits, drop_singletons=drop_singletons)
            return out._replace(
                n_main=out.n_main[None], n_buf=out.n_buf[None],
                ndistinct=out.ndistinct[None], nelts=out.nelts[None])

        f = shard_map(local_merge, mesh=self.mesh,
                      in_specs=(self._spec_pspec(),),
                      out_specs=self._spec_pspec(), check_vma=False)
        return jax.jit(f, donate_argnums=(0,))

    def stats_fn(self):
        """Global (ndistinct, nelts) via psum over the mesh."""

        def local_stats(spec_v):
            nd = jax.lax.psum(spec_v.ndistinct[0], "shard")
            ne = jax.lax.psum(spec_v.nelts[0], "shard")
            return nd[None], ne[None]

        f = shard_map(local_stats, mesh=self.mesh,
                      in_specs=(self._spec_pspec(),),
                      out_specs=(P("shard"), P("shard")), check_vma=False)
        jf = jax.jit(f)

        def run(spec):
            nd, ne = jf(spec)
            return int(nd[0]), int(ne[0])

        return run

    def shard_batch(self, codes: np.ndarray, lengths: np.ndarray):
        """Place a host batch sharded by rows across the mesh."""
        s = NamedSharding(self.mesh, P("shard"))
        return jax.device_put(codes, s), jax.device_put(lengths, s)

    def gather_spectrum(self, spec: sp.Spectrum):
        """Concatenate per-shard live entries -> global sorted (keys, counts)."""
        n = self.n_shards
        Cl = self.local_capacity
        keys = np.asarray(spec.keys).reshape(n, Cl)
        counts = np.asarray(spec.counts).reshape(n, Cl)
        n_main = np.asarray(spec.n_main).reshape(-1)
        out_k, out_c = [], []
        for i in range(n):
            m = int(n_main[i])
            out_k.append(keys[i, :m])
            out_c.append(counts[i, :m])
        return np.concatenate(out_k), np.concatenate(out_c)
