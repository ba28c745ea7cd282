"""Multi-host scale-out: global mesh, per-host file partitioning, and
process-local batch placement.

The reference scales with 16 threads popping 8 MB chunks off one lockfree
file queue on one machine (cqf/CQF_mt.h:334-412).  The pod-slice analogue:

  * every HOST streams its own slice of the read files (round-robin
    partition below — coarser than the reference's chunk queue, but files
    in real runs are many and similar-sized),
  * every host packs batches for its LOCAL devices only and places them
    into the global [rows]-sharded array with
    `jax.make_array_from_process_local_data`,
  * the counting/Contiger collectives (`parallel/sharded.py`,
    `parallel/sharded_contiger.py`) run unchanged over the GLOBAL mesh —
    shard_map's all_to_all/psum ride ICI within a slice and DCN across
    slices; key-range ownership is host-agnostic.

Usage (per process, after jax.distributed.initialize()):

    mesh = multihost.make_global_mesh()
    sc = sharded.ShardedCounter(mesh=mesh, ...)
    files = multihost.partition_files(all_files)
    for b in native.batches_from_files(files, ...):
        codes, lengths = multihost.shard_host_batch(mesh, b.codes, b.lengths)
        spec = step(spec, codes, lengths)

Single-process meshes degrade to the local behavior (partition = all
files), so the same code path runs everywhere.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global_mesh(devices=None) -> Mesh:
    """1-D mesh over ALL devices of the job (all hosts)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("shard",))


def partition_files(paths: list[str], process_index: int | None = None,
                    process_count: int | None = None) -> list[str]:
    """Round-robin slice of the read files owned by this process."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(paths)
    return [p for i, p in enumerate(paths) if i % pc == pi]


def coordinated_stream(local_batches, mesh: Mesh, make_empty):
    """Wrap a process-local batch iterator so that EVERY process yields the
    same number of batches: a host whose files run out keeps yielding
    ``make_empty()`` batches until all hosts are done.

    Collective programs require every participant to issue the same number
    of steps — with round-robin file partitioning (partition_files), one
    host's stream can end first and the others would deadlock in their next
    all_to_all.  The agreement is one tiny psum per batch ("how many hosts
    still have data"), negligible next to the batch itself.  Single-process
    meshes skip the collective entirely.
    """
    it = iter(local_batches)
    if jax.process_count() <= 1:
        yield from it
        return

    s = NamedSharding(mesh, P("shard"))
    n_local = jax.local_device_count()

    @jax.jit
    def global_alive(flags):
        return jnp.sum(flags)

    while True:
        nxt = next(it, None)
        flags = jax.make_array_from_process_local_data(
            s, np.full(n_local, 0 if nxt is None else 1, np.int32),
            (n_local * jax.process_count(),))
        alive = int(global_alive(flags)) // n_local
        if alive == 0:
            return
        yield make_empty() if nxt is None else nxt


def shard_host_batch(mesh: Mesh, codes: np.ndarray, lengths: np.ndarray):
    """Place a PROCESS-LOCAL batch as this host's rows of the globally
    row-sharded array.  codes rows must be divisible by the local device
    count; the global array has process_count x rows."""
    s = NamedSharding(mesh, P("shard"))
    pc = jax.process_count()
    if pc <= 1:
        return jax.device_put(codes, s), jax.device_put(lengths, s)
    gshape_c = (codes.shape[0] * pc,) + codes.shape[1:]
    gshape_l = (lengths.shape[0] * pc,) + lengths.shape[1:]
    return (
        jax.make_array_from_process_local_data(s, codes, gshape_c),
        jax.make_array_from_process_local_data(s, lengths, gshape_l),
    )
