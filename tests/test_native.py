"""Native (C++) runtime layer == numpy/device reference implementations.

Mirrors the role of the reference's Cython layer
(cython_kmer_index.pyx test() micro-harness, :112-118): the native
bucket lookup must agree with both the scalar python ``get`` and the
device kernel.
"""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    Graph, DenseKmerFinder, CollisionFreeKmerIndex, native)
from graph_kmer_index_tpu.hashing import sliding_window_hashes
from graph_kmer_index_tpu.models.native_index import NativeKmerIndex

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _toy_index():
    graph = Graph.from_dicts(
        {1: "ACTGACTGTCTAGGACTGAC", 2: "A", 3: "G", 4: "CCCTACTGTTTAGTCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    return graph, flat, CollisionFreeKmerIndex.from_flat_kmers(flat,
                                                               modulo=211)


def test_native_sliding_hashes_matches_numpy():
    seq = np.random.randint(0, 4, 10000).astype(np.int8)
    for k in (3, 16, 31):
        got = native.sliding_hashes(seq, k)
        ref = sliding_window_hashes(seq.astype(np.uint64), k)
        assert np.array_equal(got, ref), k


def test_native_encode_ascii():
    out = native.encode_ascii(b"ACGTacgtNnMm")
    assert out.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 0, 0]


def test_native_lookup_matches_device_and_scalar():
    graph, flat, index = _toy_index()
    nk = NativeKmerIndex(index)
    queries = np.concatenate([
        np.asarray(flat._hashes, dtype=np.uint64),
        np.array([123456789, 42], dtype=np.uint64)])

    got = nk.get(queries, hit_cap=10000, freq_cap=20)
    want = index.get_batched(queries, max_hits=10)
    assert got.shape == want.shape
    assert np.array_equal(got, want)

    counts_native = nk.map_kmers(queries, graph.n_nodes())
    counts_device = index.map_kmers(queries, graph.n_nodes())
    assert np.array_equal(counts_native, counts_device.astype(np.uint32))
    assert np.array_equal(index.map_kmers(queries, graph.n_nodes(),
                                          backend="native"),
                          counts_device.astype(np.uint32))

    has_native = nk.has_kmers(queries)
    has_device = index.has_kmers(queries)
    assert np.array_equal(has_native, np.asarray(has_device, dtype=bool))
    assert not has_native[-1] and not has_native[-2]


def test_native_fasta_encode_matches_readkmers():
    fa = b">read1\nACGTACGTAA\n>read2\nTTTTGGGGCCCC\n"
    flat, starts, lens = native.fasta_encode(fa)
    assert lens.tolist() == [10, 12]
    assert flat[:4].tolist() == [0, 1, 2, 3]
    assert flat[starts[1]:starts[1] + 4].tolist() == [3, 3, 3, 3]


def test_native_fasta_encode_crlf_and_blank_lines():
    """CRLF endings, blank/whitespace-only lines, and FASTQ quality
    state must match the python fallback exactly: strip both ends, skip
    empty lines WITHOUT consuming the post-'+' quality state."""
    if not native.available():
        return
    # CRLF FASTA with a blank line and an indented sequence line
    fa = b">r1\r\nACGT\r\n\r\n>r2\r\n  TTAA\r\n"
    flat, starts, lens = native.fasta_encode(fa)
    assert lens.tolist() == [4, 4]
    assert flat[:4].tolist() == [0, 1, 2, 3]
    assert flat[starts[1]:starts[1] + 4].tolist() == [3, 3, 0, 0]
    # FASTQ: a CR-only line between '+' and the quality line must not
    # consume the skip state (quality 'ACGT'-looking line still dropped)
    fq = b"@r1\nGGGG\n+\n\r\nACGT\n@r2\nCCCC\n+\nFFFF\n"
    flat, starts, lens = native.fasta_encode(fq)
    assert lens.tolist() == [4, 4]
    assert flat[:4].tolist() == [2, 2, 2, 2]
    assert flat[starts[1]:starts[1] + 4].tolist() == [1, 1, 1, 1]


def test_native_rejects_bad_modulo_and_k():
    if not native.available():
        return
    import pytest
    tk = np.array([5], np.uint64)
    st = np.array([0], np.int64)
    sz = np.array([1], np.uint32)
    with pytest.raises(ValueError):
        native.has_kmers(np.array([5], np.uint64), tk, st, sz, 0)
    with pytest.raises(ValueError):
        native.sliding_hashes(np.zeros(8, np.int8), 0)
    with pytest.raises(ValueError):
        native.sliding_hashes(np.zeros(40, np.int8), 32)


def test_native_map_kmers_int64_counts():
    """Both native count backends return int64 (the bucket-chase path
    used to return uint32, diverging overflow behavior from packed)."""
    if not native.available():
        return
    # modulo 2: kmers 5 and 9 both land in bucket 1 (rows [0, 2))
    tk = np.array([5, 9], np.uint64)
    tn = np.array([1, 2], np.uint32)
    st = np.array([0, 0], np.int64)
    sz = np.array([0, 2], np.uint32)
    counts = native.map_kmers(np.array([5, 5, 9], np.uint64), tk, tn,
                              st, sz, 2, 3)
    assert counts.dtype == np.int64
    assert counts.tolist() == [0, 2, 1]


def test_packed_rent_or_buy_heuristic():
    """Auto mode chases small query volumes, builds the packed records
    once cumulative queries reach ~4x the table rows, and both paths
    return identical counts/masks."""
    graph, flat, index = _toy_index()
    q = np.asarray(flat._hashes, dtype=np.uint64)
    n = len(index._kmers)

    nk = NativeKmerIndex(index)
    small = q[: max(1, min(len(q), n // 2))]
    c1 = nk.map_kmers(small, graph.n_nodes() + 1)
    assert getattr(nk, "_packed_np", None) is None, \
        "packed records built below the query-volume threshold"
    # push cumulative volume past 4x rows -> packed build kicks in
    for _ in range(12):
        c2 = nk.map_kmers(q, graph.n_nodes() + 1)
    assert nk._packed_np, "packed records never built in auto mode"

    forced = NativeKmerIndex(index)
    forced.prefer_packed = False
    assert np.array_equal(forced.map_kmers(small, graph.n_nodes() + 1), c1)
    assert np.array_equal(forced.map_kmers(q, graph.n_nodes() + 1), c2)
    assert getattr(forced, "_packed_np", None) is None
    assert np.array_equal(forced.has_kmers(q), nk.has_kmers(q))


def test_native_int32_starts_dispatch():
    """int32 bucket tables take the *32 C entry points without widening;
    results match the int64 path bit-for-bit."""
    graph, flat, index = _toy_index()
    q = np.concatenate([np.asarray(flat._hashes, dtype=np.uint64),
                        np.array([987654321, 7], dtype=np.uint64)])
    nk = NativeKmerIndex(index)
    s32 = np.ascontiguousarray(nk.starts_tbl, np.int32)
    s64 = np.ascontiguousarray(nk.starts_tbl, np.int64)
    n_nodes = graph.n_nodes() + 1
    assert np.array_equal(
        native.map_kmers(q, nk.table_kmers, nk.table_nodes, s32,
                         nk.sizes_tbl, nk.modulo, n_nodes),
        native.map_kmers(q, nk.table_kmers, nk.table_nodes, s64,
                         nk.sizes_tbl, nk.modulo, n_nodes))
    assert np.array_equal(
        native.has_kmers(q, nk.table_kmers, s32, nk.sizes_tbl, nk.modulo),
        native.has_kmers(q, nk.table_kmers, s64, nk.sizes_tbl, nk.modulo))
    a = native.bucket_lookup(q, nk.table_kmers, nk.table_nodes,
                             nk.table_ref_offsets, nk.table_frequencies,
                             nk.table_allele_frequencies, s32, nk.sizes_tbl,
                             nk.modulo)
    b = native.bucket_lookup(q, nk.table_kmers, nk.table_nodes,
                             nk.table_ref_offsets, nk.table_frequencies,
                             nk.table_allele_frequencies, s64, nk.sizes_tbl,
                             nk.modulo)
    assert np.array_equal(a, b)


def test_frequencies_bucket_ordered_differential():
    """Native bucket-ordered frequencies == numpy lexsort path == device
    path, on bucket-sorted rows with heavy kmer duplication, bucket
    collisions (tiny modulo), duplicate (kmer, ro) pairs, and >2^32 ref
    offsets; non-bucket-ordered input is refused (None)."""
    from graph_kmer_index_tpu.models.kmer_index import (
        _frequencies_by_distinct_ref_offsets)
    from graph_kmer_index_tpu.ops.build import frequencies_device

    rng = np.random.default_rng(0)
    for trial, (n, modulo, kmer_space, wide) in enumerate([
            (5000, 97, 50, False),         # heavy collisions + duplicates
            (20000, 1009, 300, False),
            (8000, 211, 40, True),         # ref offsets beyond 2^32
            (1, 7, 3, False),
            (0, 13, 3, False)]):
        kmers = rng.integers(0, kmer_space, n, dtype=np.uint64)
        ro = rng.integers(0, 20, n, dtype=np.uint64)
        if wide:
            ro = ro + ((np.uint64(1) << np.uint64(32))
                       * rng.integers(0, 3, n, dtype=np.uint64))
        order = np.argsort(kmers % np.uint64(modulo), kind="stable")
        kmers, ro = kmers[order], ro[order]

        want = _frequencies_by_distinct_ref_offsets(kmers, ro)
        got = native.frequencies_bucket_ordered(kmers, ro, modulo)
        assert got is not None, trial
        assert got.dtype == np.uint16
        assert np.array_equal(got, want), trial
        dev = np.asarray(frequencies_device(kmers, ro))
        assert np.array_equal(dev, want), trial

    # not bucket-ordered -> refused, never silently wrong
    kmers = np.array([5, 3, 5], dtype=np.uint64)  # buckets 5,3,5 mod 7
    ro = np.zeros(3, np.uint64)
    assert native.frequencies_bucket_ordered(kmers, ro, 7) is None


def test_frequencies_small_n_many_threads():
    """n < n_threads left threads with hi==0 dereferencing kmers[-1]
    (ASAN-confirmed OOB read). Every tiny n must work with more threads
    than rows and match the numpy path."""
    from graph_kmer_index_tpu.models.kmer_index import (
        _frequencies_by_distinct_ref_offsets)
    rng = np.random.default_rng(3)
    for n in range(1, 8):
        kmers = rng.integers(0, 50, n, dtype=np.uint64)
        ro = rng.integers(0, 5, n, dtype=np.uint64)
        order = np.argsort(kmers % np.uint64(13), kind="stable")
        kmers, ro = kmers[order], ro[order]
        got = native.frequencies_bucket_ordered(kmers, ro, 13, n_threads=8)
        want = _frequencies_by_distinct_ref_offsets(kmers, ro)
        assert got is not None and np.array_equal(got, want), n
