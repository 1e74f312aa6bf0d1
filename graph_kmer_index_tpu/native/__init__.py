"""ctypes loader for the native runtime library (gki.cpp).

Compiles lazily with g++ on first use (cached next to the source); all
call sites fall back to the pure-numpy implementations when a compiler
is unavailable, so the native layer is an accelerator, not a dependency.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "gki.cpp")
_SO = os.path.join(_HERE, "libgki.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logging.info("native build unavailable (%s); using numpy fallbacks", e)
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logging.info("native load failed (%s)", e)
            return None

        i64, u64, i32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32
        p = ctypes.POINTER
        lib.gki_encode_ascii.restype = i64
        lib.gki_encode_ascii.argtypes = [ctypes.c_char_p, i64,
                                         p(ctypes.c_int8)]
        lib.gki_sliding_hashes.restype = i64
        lib.gki_sliding_hashes.argtypes = [p(ctypes.c_int8), i64, i32,
                                           p(ctypes.c_uint64)]
        lib.gki_bucket_lookup.restype = i64
        lib.gki_bucket_lookup.argtypes = [
            p(ctypes.c_uint64), i64, p(ctypes.c_uint64),
            p(ctypes.c_uint32), p(ctypes.c_uint64), p(ctypes.c_uint16),
            p(ctypes.c_float), p(ctypes.c_int64), p(ctypes.c_uint32),
            u64, i64, i64, i32, p(ctypes.c_uint64), i64]
        lib.gki_map_kmers.restype = None
        lib.gki_map_kmers.argtypes = [
            p(ctypes.c_uint64), i64, p(ctypes.c_uint64), p(ctypes.c_uint32),
            p(ctypes.c_int64), p(ctypes.c_uint32), u64, i64,
            p(ctypes.c_uint32)]
        lib.gki_has_kmers.restype = None
        lib.gki_has_kmers.argtypes = [
            p(ctypes.c_uint64), i64, p(ctypes.c_uint64), p(ctypes.c_int64),
            p(ctypes.c_uint32), u64, p(ctypes.c_uint8)]
        lib.gki_fasta_encode.restype = i64
        lib.gki_fasta_encode.argtypes = [
            ctypes.c_char_p, i64, p(ctypes.c_int8), i64, p(ctypes.c_int64),
            p(ctypes.c_int64), i64]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return get_lib() is not None


def encode_ascii(seq: bytes) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(seq), dtype=np.int8)
    lib.gki_encode_ascii(seq, len(seq), _ptr(out, ctypes.c_int8))
    return out


def sliding_hashes(seq: np.ndarray, k: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq, dtype=np.int8)
    n = len(seq)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(n - k + 1, dtype=np.uint64)
    lib.gki_sliding_hashes(_ptr(seq, ctypes.c_int8), n, k,
                           _ptr(out, ctypes.c_uint64))
    return out


def bucket_lookup(kmers, table_kmers, table_nodes, table_ref_offsets,
                  table_frequencies, table_allele_frequencies, starts_tbl,
                  sizes_tbl, modulo, hit_cap=10000, freq_cap=20):
    """(5, n_hits) uint64 matrix — the CythonKmerIndex.get contract."""
    lib = get_lib()
    if lib is None:
        return None
    kmers = np.ascontiguousarray(kmers, dtype=np.uint64)
    args = (
        _ptr(kmers, ctypes.c_uint64), len(kmers),
        _ptr(np.ascontiguousarray(table_kmers, np.uint64), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(table_nodes, np.uint32), ctypes.c_uint32),
        _ptr(np.ascontiguousarray(table_ref_offsets, np.uint64),
             ctypes.c_uint64),
        _ptr(np.ascontiguousarray(table_frequencies, np.uint16),
             ctypes.c_uint16),
        _ptr(np.ascontiguousarray(table_allele_frequencies, np.float32),
             ctypes.c_float),
        _ptr(np.ascontiguousarray(starts_tbl, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(sizes_tbl, np.uint32), ctypes.c_uint32),
        int(modulo), int(hit_cap), int(freq_cap))
    n_hits = lib.gki_bucket_lookup(*args, 1, None, 0)
    out = np.zeros((5, max(1, n_hits)), dtype=np.uint64)
    if n_hits > 0:
        lib.gki_bucket_lookup(*args, 0, _ptr(out, ctypes.c_uint64), n_hits)
    return out[:, :n_hits]


def map_kmers(kmers, table_kmers, table_nodes, starts_tbl, sizes_tbl,
              modulo, n_nodes) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    kmers = np.ascontiguousarray(kmers, dtype=np.uint64)
    counts = np.zeros(n_nodes, dtype=np.uint32)
    lib.gki_map_kmers(
        _ptr(kmers, ctypes.c_uint64), len(kmers),
        _ptr(np.ascontiguousarray(table_kmers, np.uint64), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(table_nodes, np.uint32), ctypes.c_uint32),
        _ptr(np.ascontiguousarray(starts_tbl, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(sizes_tbl, np.uint32), ctypes.c_uint32),
        int(modulo), n_nodes - 1, _ptr(counts, ctypes.c_uint32))
    return counts


def has_kmers(kmers, table_kmers, starts_tbl, sizes_tbl,
              modulo) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    kmers = np.ascontiguousarray(kmers, dtype=np.uint64)
    out = np.zeros(len(kmers), dtype=np.uint8)
    lib.gki_has_kmers(
        _ptr(kmers, ctypes.c_uint64), len(kmers),
        _ptr(np.ascontiguousarray(table_kmers, np.uint64), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(starts_tbl, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(sizes_tbl, np.uint32), ctypes.c_uint32),
        int(modulo), _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def fasta_encode(text: bytes, max_reads: int | None = None):
    """All sequence lines of a FASTA/FASTQ buffer, 2-bit encoded:
    (flat int8 array, starts, lens)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(text)
    max_reads = max_reads or (n // 2 + 1)
    out = np.empty(n, dtype=np.int8)
    starts = np.empty(max_reads, dtype=np.int64)
    lens = np.empty(max_reads, dtype=np.int64)
    n_reads = lib.gki_fasta_encode(
        text, n, _ptr(out, ctypes.c_int8), n,
        _ptr(starts, ctypes.c_int64), _ptr(lens, ctypes.c_int64), max_reads)
    if n_reads < 0:
        return None
    total = int(starts[n_reads - 1] + lens[n_reads - 1]) if n_reads else 0
    return out[:total], starts[:n_reads], lens[:n_reads]
