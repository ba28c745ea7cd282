"""Spectrum set operations vs dict oracle (qf_merge/inner/intersect)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sh_assembly_tpu.ops import spectrum as sp

KB = 40


def build(keys):
    spec = sp.make(2048, 1024)
    spec = sp.insert(spec, jnp.asarray(np.asarray(keys, np.uint64)))
    return sp.merge(spec, KB)


def as_dict(spec):
    k, c, _ = sp.to_host(spec, KB)
    return dict(zip(k.tolist(), c.tolist()))


def test_union(rng):
    a = rng.integers(0, 300, size=400)
    b = rng.integers(0, 300, size=350)
    u = sp.union(build(a), build(b), KB)
    expect = {}
    for x in list(a) + list(b):
        expect[int(x)] = expect.get(int(x), 0) + 1
    assert as_dict(u) == expect


def test_inner_product(rng):
    a = rng.integers(0, 100, size=300)
    b = rng.integers(50, 150, size=300)
    sa, sb = build(a), build(b)
    da, db = as_dict(sa), as_dict(sb)
    expect = sum(da[k] * db.get(k, 0) for k in da)
    assert int(sp.inner_product(sa, sb, KB)) == expect


def test_intersect(rng):
    a = rng.integers(0, 120, size=300)
    b = rng.integers(60, 200, size=300)
    sa, sb = build(a), build(b)
    da, db = as_dict(sa), as_dict(sb)
    expect = {k: min(v, db[k]) for k, v in da.items() if k in db}
    assert as_dict(sp.intersect(sa, sb, KB)) == expect


def test_magnitude(rng):
    a = rng.integers(0, 50, size=200)
    sa = build(a)
    da = as_dict(sa)
    expect = np.sqrt(sum(v * v for v in da.values()))
    assert abs(float(sp.magnitude(sa, KB)) - expect) < 1e-6
