"""Bit-exact .ser format parity against the compiled reference gqf.c."""

import os
import subprocess

import numpy as np
import pytest

from sh_assembly_tpu.formats import cqf_ser

REF = "/root/reference/cqf"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "ref_harness", "ref_cqf.cpp")


@pytest.fixture(scope="module")
def ref_cqf(tmp_path_factory):
    exe = tmp_path_factory.mktemp("ref") / "ref_cqf"
    r = subprocess.run(
        ["g++", "-O1", f"-I{REF}", "-x", "c++", f"{REF}/gqf.c",
         "-x", "c++", HARNESS_SRC, "-o", str(exe), "-lm", "-lpthread"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference harness unavailable: {r.stderr[:200]}")
    return str(exe)


def _ref_build(exe, qb, hb, entries, path):
    inp = "".join(f"{k} {c} {int(t)}\n" for k, c, t in entries)
    subprocess.run([exe, "build", str(qb), str(hb), path], input=inp.encode(),
                   check=True)


def _ref_dump(exe, path):
    out = subprocess.run([exe, "dump", path], capture_output=True, check=True)
    res = []
    for line in out.stdout.decode().splitlines():
        k, c, t = line.split()
        res.append((int(k), int(c), int(t)))
    return res


def random_entries(rng, qb, hb, n, max_count=300, traveled_rate=0.3):
    keys = np.unique(rng.integers(0, 1 << hb, size=n).astype(np.uint64))
    counts = rng.integers(1, max_count, size=len(keys)).astype(np.int64)
    trav = (rng.random(len(keys)) < traveled_rate)
    return list(zip(keys.tolist(), counts.tolist(), trav.tolist()))


@pytest.mark.parametrize("case", ["sparse", "dense", "bigcounts", "clustered"])
def test_write_bitexact_vs_reference(ref_cqf, tmp_path, rng, case):
    qb, hb = 10, 18
    if case == "sparse":
        entries = random_entries(rng, qb, hb, 50)
    elif case == "dense":
        # ~600 entries * <=2 slots stays under xnslots = 1344 (the reference
        # has no overflow check and would corrupt memory beyond that)
        entries = random_entries(rng, qb, hb, 650, max_count=5)
    elif case == "bigcounts":
        entries = random_entries(rng, qb, hb, 40, max_count=3_000_000)
    else:  # clustered: many keys share buckets, forcing long shifted runs
        base = rng.integers(0, 1 << qb, size=8)
        keys = np.unique(
            np.concatenate(
                [(b << 8) + rng.integers(0, 256, size=60) for b in base]
            ).astype(np.uint64)
        )
        counts = rng.integers(1, 200, size=len(keys)).astype(np.int64)
        entries = list(zip(keys.tolist(), counts.tolist(), [False] * len(keys)))

    ref_path = str(tmp_path / "ref.ser")
    our_path = str(tmp_path / "our.ser")
    _ref_build(ref_cqf, qb, hb, entries, ref_path)

    keys = np.array([k for k, _, _ in entries], np.uint64)
    counts = np.array([c for _, c, _ in entries], np.int64)
    trav = np.array([t for _, _, t in entries], np.uint8)
    # harness qf_insert doesn't maintain the informational counters
    cqf_ser.write_ser(our_path, keys, counts, qb=qb, key_bits=hb,
                      traveled=trav, nelts=0, ndistinct=0)

    a = open(ref_path, "rb").read()
    b = open(our_path, "rb").read()
    assert a == b


def test_read_of_reference_file(ref_cqf, tmp_path, rng):
    qb, hb = 9, 17
    entries = random_entries(rng, qb, hb, 200, max_count=1000)
    ref_path = str(tmp_path / "ref.ser")
    _ref_build(ref_cqf, qb, hb, entries, ref_path)
    m, keys, counts, trav = cqf_ser.read_ser(ref_path)
    assert m.qb == qb and m.key_bits == hb
    got = list(zip(keys.tolist(), counts.tolist(), (trav != 0).tolist()))
    assert got == sorted(entries)


def test_reference_reads_our_file(ref_cqf, tmp_path, rng):
    qb, hb = 9, 17
    entries = random_entries(rng, qb, hb, 150, max_count=500)
    our_path = str(tmp_path / "our.ser")
    keys = np.array([k for k, _, _ in entries], np.uint64)
    counts = np.array([c for _, c, _ in entries], np.int64)
    trav = np.array([t for _, _, t in entries], np.uint8)
    cqf_ser.write_ser(our_path, keys, counts, qb=qb, key_bits=hb, traveled=trav)
    got = _ref_dump(ref_cqf, our_path)
    assert got == sorted([(k, c, int(t)) for k, c, t in entries])


def test_roundtrip_no_reference(tmp_path, rng):
    qb, hb = 12, 20
    keys = np.unique(rng.integers(0, 1 << hb, size=500).astype(np.uint64))
    counts = rng.integers(1, 10_000, size=len(keys)).astype(np.int64)
    path = str(tmp_path / "x.ser")
    cqf_ser.write_ser(path, keys, counts, qb=qb, key_bits=hb)
    m, k2, c2, t2 = cqf_ser.read_ser(path)
    np.testing.assert_array_equal(keys, k2)
    np.testing.assert_array_equal(counts, c2)
    assert not t2.any()
    assert m.nelts == counts.sum() and m.ndistinct_elts == len(keys)


@pytest.mark.parametrize("qb,hb", [(12, 17), (12, 22), (12, 24), (12, 36)])
def test_roundtrip_generic_bits_per_slot(tmp_path, rng, qb, hb):
    """bits_per_slot != 8 (hb != qb+8): generic LSB-first slot packing,
    matching the reference's runtime get_slot/set_slot arithmetic
    (gqf.c BITS_PER_SLOT==0 path)."""
    keys = np.unique(rng.integers(0, 1 << hb, size=400).astype(np.uint64))
    counts = rng.integers(1, 100_000, size=len(keys)).astype(np.int64)
    trav = (rng.integers(0, 2, size=len(keys))).astype(np.uint8)
    path = str(tmp_path / "g.ser")
    m = cqf_ser.write_ser(path, keys, counts, qb=qb, key_bits=hb,
                          traveled=trav)
    assert m.bits_per_slot == hb - qb
    m2, k2, c2, t2 = cqf_ser.read_ser(path)
    np.testing.assert_array_equal(keys, k2)
    np.testing.assert_array_equal(counts, c2)
    np.testing.assert_array_equal(trav, t2)


@pytest.mark.parametrize("qb,hb,max_count", [
    (14, 22, 300),        # default 8-bit slots
    (14, 26, 100_000),    # 12-bit slots, multi-digit counters
    (13, 21, 2),          # all-singleton
])
def test_native_transcoder_matches_python(tmp_path, rng, qb, hb, max_count):
    """The streaming C++ transcoder (cpp/cqf_ser.cpp) must produce
    byte-identical files to the numpy specification writer and decode
    identically to the numpy reader."""
    if cqf_ser._native_lib() is None:
        pytest.skip("native transcoder unavailable")
    n = 4000
    keys = np.unique(rng.integers(0, 1 << hb, size=n).astype(np.uint64))
    counts = rng.integers(1, max_count + 1, size=len(keys)).astype(np.int64)
    trav = (rng.random(len(keys)) < 0.3).astype(np.uint8)

    p_native = str(tmp_path / "native.ser")
    p_python = str(tmp_path / "python.ser")
    cqf_ser.write_ser_native(p_native, keys, counts, qb=qb, key_bits=hb,
                             traveled=trav)
    cqf_ser.write_ser_py(p_python, keys, counts, qb=qb, key_bits=hb,
                         traveled=trav)
    a = open(p_native, "rb").read()
    b = open(p_python, "rb").read()
    assert a == b, "native writer output differs from the numpy spec"

    m1, k1, c1, t1 = cqf_ser.read_ser_native(p_python)
    m2, k2, c2, t2 = cqf_ser.read_ser_py(p_python)
    assert np.array_equal(k1, k2)
    assert np.array_equal(c1, c2)
    assert np.array_equal(t1, t2)
    assert (m1.nelts, m1.ndistinct_elts) == (m2.nelts, m2.ndistinct_elts)
    # small-chunk streaming exercises the pending spill path
    m3, k3, c3, t3 = cqf_ser.read_ser_native(p_python, chunk=37)
    assert np.array_equal(k3, k2) and np.array_equal(c3, c2)
    assert np.array_equal(t3, t2)
