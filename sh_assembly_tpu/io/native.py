"""ctypes bindings for the native C++ reader (cpp/fastq_reader.cpp).

Builds lazily via `make -C cpp` on first use if the toolchain is present;
falls back to the pure-Python reader otherwise (io/fastq.py — identical
semantics, validated against each other in tests/test_native_reader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

import numpy as np

from ..utils.logging import log
from . import fastq as pyfastq

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "cpp", "build", "libshasm.so")
_lib = None
_tried = False


_ABI_VERSION = 3


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "cpp")],
            capture_output=True, check=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing: stay on the Python path
        log(f"[io] native reader unavailable ({e}); using Python reader")
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None

    def open_lib():
        try:
            return ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log(f"[io] failed to load {_LIB_PATH}: {e}")
            return None

    lib = open_lib()
    if lib is None:
        return None
    # stale .so from an older checkout: rebuild once on ABI mismatch
    try:
        ver = lib.shr_abi_version()
    except AttributeError:
        ver = 1
    if ver != _ABI_VERSION:
        log(f"[io] native reader ABI {ver} != {_ABI_VERSION}; rebuilding")
        try:
            os.remove(_LIB_PATH)
        except OSError:
            pass
        if not _build():
            return None
        lib = open_lib()
        if lib is None:
            return None
        if lib.shr_abi_version() != _ABI_VERSION:
            log("[io] native reader ABI still stale; using Python reader")
            return None
    lib.shr_open.restype = ctypes.c_void_p
    lib.shr_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.shr_next_batch.restype = ctypes.c_int
    lib.shr_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.shr_next_batch_packed.restype = ctypes.c_int
    lib.shr_next_batch_packed.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.shr_failed.restype = ctypes.c_int
    lib.shr_failed.argtypes = [ctypes.c_void_p]
    lib.shr_close.restype = None
    lib.shr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _needs_py_fallback(lib, fmode: str, paths: list[str]) -> bool:
    """bz2 inputs stay on the Python reader only when the native library
    could not bind libbz2 at runtime (cpp/fastq_reader.cpp dlopen path;
    reference handles .bz2 natively via getFileReader, CQF_mt.h:933-957)."""
    wants_bz2 = fmode == "b" or any(p.endswith(".bz2") for p in paths)
    if not wants_bz2:
        return False
    try:
        return lib.shr_has_bz2() != 1
    except AttributeError:
        return True


def batches_from_files(
    paths: list[str],
    k: int,
    fmode: str = "auto",
    reads_per_batch: int = 16384,
    max_read_len: int = 160,
    n_threads: int = 4,
) -> Iterator[pyfastq.Batch]:
    """Native batch stream; falls back to the Python reader for bzip2 or a
    missing toolchain."""
    lib = _load()
    if lib is None or _needs_py_fallback(lib, fmode, paths):
        yield from pyfastq.batches_from_files(
            paths, k, fmode, reads_per_batch, max_read_len)
        return

    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    h = lib.shr_open(arr, len(paths), k, n_threads)
    if not h:
        raise RuntimeError("shr_open failed")
    B, L = reads_per_batch, max_read_len
    try:
        while True:
            codes = np.full((B, L), pyfastq._PAD, dtype=np.uint8)
            lengths = np.zeros(B, dtype=np.int32)
            seed_col = np.full(B, -1, dtype=np.int32)
            n = lib.shr_next_batch(
                h,
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                B, L,
                seed_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n <= 0:
                if lib.shr_failed(h):
                    raise IOError("native reader failed (bad file?)")
                break
            yield pyfastq.Batch(codes, lengths, n, seed_col)
    finally:
        lib.shr_close(h)


def packed_batches_from_files(
    paths: list[str],
    k: int,
    fmode: str = "auto",
    reads_per_batch: int = 16384,
    row_len: int = 160,
    n_threads: int = 4,
):
    """Batch stream in device transport format (fastq.PackedBatch): the
    native reader encodes + N-segments + 2-bit packs in C++; the Python
    fallback packs with packio.pack_np.  row_len must be a multiple of 8.
    """
    assert row_len % 8 == 0, "row_len must be a multiple of 8"
    lib = _load()
    B, L = reads_per_batch, row_len
    if lib is None or _needs_py_fallback(lib, fmode, paths):
        from ..ops import packio

        for b in pyfastq.batches_from_files(paths, k, fmode, B, L):
            p, m = packio.pack_np(b.codes)
            yield pyfastq.PackedBatch(p, m, b.lengths, b.n_rows, b.seed_col)
        return

    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    h = lib.shr_open(arr, len(paths), k, n_threads)
    if not h:
        raise RuntimeError("shr_open failed")
    try:
        while True:
            packed = np.zeros((B, L // 4), dtype=np.uint8)
            nmask = np.zeros((B, L // 8), dtype=np.uint8)
            lengths = np.zeros(B, dtype=np.int32)
            seed_col = np.full(B, -1, dtype=np.int32)
            n = lib.shr_next_batch_packed(
                h,
                packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                nmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                B, L,
                seed_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n <= 0:
                if lib.shr_failed(h):
                    raise IOError("native reader failed (bad file?)")
                break
            yield pyfastq.PackedBatch(packed, nmask, lengths, n, seed_col)
    finally:
        lib.shr_close(h)
