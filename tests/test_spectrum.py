"""Spectrum store vs dict oracle: insert/merge/query/sweep/traveled."""

import numpy as np
import pytest

import jax.numpy as jnp

from sh_assembly_tpu.ops import spectrum as sp

SENT = 0xFFFFFFFFFFFFFFFF
KB = 40  # key_bits used for packed merges in these tests


def to_dict(spec):
    keys, counts, _ = sp.to_host(spec, KB)
    return dict(zip(keys.tolist(), counts.tolist()))


def ref_counts(batches):
    d = {}
    for b in batches:
        for k in b:
            if k != SENT:
                d[k] = d.get(k, 0) + 1
    return d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_insert_merge_matches_dict(rng, seed):
    r = np.random.default_rng(seed)
    B, C, BC = 256, 4096, 1024
    batches = [
        r.integers(0, 500, size=B).astype(np.uint64) for _ in range(8)
    ]
    # pepper in some sentinels (invalid windows)
    for b in batches:
        b[r.random(B) < 0.1] = SENT

    spec = sp.make(C, BC)
    nbuf = 0
    for b in batches:
        spec = sp.insert(spec, jnp.asarray(b))
        nbuf += B
        if nbuf + B > BC:
            spec = sp.merge(spec, KB)
            nbuf = 0
    spec = sp.merge(spec, KB)

    expect = ref_counts(batches)
    assert to_dict(spec) == expect
    assert int(spec.ndistinct) == len(expect)
    assert int(spec.nelts) == sum(expect.values())


def test_merge_drop_singletons(rng):
    C, BC = 1024, 512
    keys = np.array([1, 1, 2, 3, 3, 3, 4], dtype=np.uint64)
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(keys))
    spec = sp.merge(spec, KB, drop_singletons=True)
    assert to_dict(spec) == {1: 2, 3: 3}


def test_split_count_survives_sweep():
    # A key counted once in main and once in buffer has total 2 at the
    # sweep -> must survive (reference: counts are combined before cleaning).
    C, BC = 256, 128
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(np.array([7], np.uint64)))
    spec = sp.merge(spec, KB)  # 7 -> main with count 1
    spec = sp.insert(spec, jnp.asarray(np.array([7, 9], np.uint64)))
    spec = sp.merge(spec, KB, drop_singletons=True)
    assert to_dict(spec) == {7: 2}


def test_query(rng):
    C, BC = 2048, 1024
    keys = rng.integers(0, 10_000, size=600).astype(np.uint64)
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(keys))
    spec = sp.merge(spec, KB)
    expect = ref_counts([keys])
    probes = np.concatenate([keys[:50], np.array([123456789, SENT], np.uint64)])
    got = np.asarray(sp.query(spec, jnp.asarray(probes), KB))
    for p, g in zip(probes.tolist(), got.tolist()):
        assert g == expect.get(p, 0)


def test_query_join_matches_query(rng):
    C, BC = 2048, 1024
    keys = rng.integers(0, 1 << 20, size=900).astype(np.uint64)
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(keys))
    spec = sp.merge(spec, KB)
    probes = np.concatenate([
        keys[::3],
        rng.integers(0, 1 << 20, size=200).astype(np.uint64),
        np.array([SENT, SENT], np.uint64),
    ])
    rng.shuffle(probes)
    a = np.asarray(sp.query(spec, jnp.asarray(probes), KB))
    b = np.asarray(sp.query_join(spec, jnp.asarray(probes), KB))
    np.testing.assert_array_equal(a, b)


def test_traveled_semantics(rng):
    C, BC = 256, 128
    keys = np.array([5, 6, 7], np.uint64)
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(keys))
    spec = sp.merge(spec, KB)

    probes = jnp.asarray(np.array([5, 5, 99], np.uint64))
    counts, was, spec = sp.query_set_traveled(spec, probes, KB)
    # batched probes all see the pre-batch state (benign-race analogue)
    assert np.asarray(counts).tolist() == [1, 1, 0]
    assert np.asarray(was).tolist() == [False, False, False]
    counts2, was2, spec = sp.query_set_traveled(spec, probes, KB)
    assert np.asarray(was2).tolist() == [True, True, False]
    # read-only variant does not set
    counts3, was3 = sp.query_is_traveled(spec, jnp.asarray(np.array([6], np.uint64)), KB)
    assert np.asarray(was3).tolist() == [False]


def test_merge_preserves_traveled():
    C, BC = 256, 128
    spec = sp.make(C, BC)
    spec = sp.insert(spec, jnp.asarray(np.array([5, 6], np.uint64)))
    spec = sp.merge(spec, KB)
    _, _, spec = sp.query_set_traveled(spec, jnp.asarray(np.array([5], np.uint64)), KB)
    spec = sp.insert(spec, jnp.asarray(np.array([8], np.uint64)))
    spec = sp.merge(spec, KB)
    keys, counts, trav = sp.to_host(spec, KB)
    d = dict(zip(keys.tolist(), trav.tolist()))
    assert d[5] == 1 and d[6] == 0 and d[8] == 0


def test_max_key_vs_sentinel_runs():
    # the maximum representable key (2^key_bits - 1) shares its extracted
    # key value with SENTINEL padding slots; merges must still keep it
    # (regression: the packed-plane dedup scan once merged their runs)
    kb = 12
    spec = sp.make(256, 128)
    keys = np.array([0, 1, 1, 4095, 4095, 4095], np.uint64)
    spec = sp.insert(spec, jnp.asarray(keys))
    spec = sp.merge(spec, kb)
    k, c, _ = sp.to_host(spec, kb)
    assert dict(zip(k.tolist(), c.tolist())) == {0: 1, 1: 2, 4095: 3}
    spec = sp.merge(sp.insert(
        spec, jnp.asarray(np.array([4095], np.uint64))), kb,
        drop_singletons=True)
    k, c, _ = sp.to_host(spec, kb)
    assert dict(zip(k.tolist(), c.tolist())) == {1: 2, 4095: 4}


def test_near_capacity_flagship_keybits(rng):
    # flagship packing geometry (key_bits = qb + 8 = 37) driven to ~95%
    # load: all entries survive, counts exact, overflow check passes
    kb = 37
    C, BC = 1 << 14, 1 << 13
    target = int(C * 0.95)
    keys = rng.integers(0, 1 << kb, size=target, dtype=np.uint64)
    spec = sp.make(C, BC)
    for i in range(0, target, BC // 2):
        spec = sp.insert(spec, jnp.asarray(keys[i : i + BC // 2]))
        spec = sp.merge(spec, kb)
    sp.check_overflow(spec)
    expect = ref_counts([keys])
    assert to_dict_kb(spec, kb) == expect
    assert int(spec.n_main) == len(expect)
    assert int(spec.n_main) > 0.9 * C


def to_dict_kb(spec, kb):
    keys, counts, _ = sp.to_host(spec, kb)
    return dict(zip(keys.tolist(), counts.tolist()))


def test_from_host_roundtrip(rng):
    keys = np.unique(rng.integers(0, 1 << 40, size=300).astype(np.uint64))
    counts = rng.integers(1, 100, size=len(keys)).astype(np.int32)
    spec = sp.from_host(keys, counts, 1024, 256, key_bits=KB)
    k2, c2, _ = sp.to_host(spec, KB)
    np.testing.assert_array_equal(np.sort(keys), k2)
    assert dict(zip(keys.tolist(), counts.tolist())) == dict(
        zip(k2.tolist(), c2.tolist())
    )
