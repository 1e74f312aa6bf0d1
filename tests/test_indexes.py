"""Index structure tests — ports of reference
tests/test_collision_free_kmer_index.py, test_indexes2.py,
test_reverse_kmer_index.py, test_count_min_sketch_kmer_counter.py, plus
coverage for ReferenceKmerIndex (commented out upstream),
KmerFrequencyIndex, KmerCounter, MinimalKmerIndex and FlatKmers
transforms."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    FlatKmers, FlatKmers2, CollisionFreeKmerIndex, KmerIndex2,
    MinimalKmerIndex, ReverseKmerIndex, ReferenceKmerIndex, KmerCounter,
    CountMinSketchKmerCounter, KmerFrequencyIndex, CounterKmerIndex)


@pytest.fixture
def index():
    flat = FlatKmers(
        np.array([1, 1, 2, 2, 4, 5, 3], dtype=np.uint64),
        np.array([5, 6, 7, 8, 10, 11, 100]),
        np.array([1, 1, 2, 3, 10, 11, 100]))
    return CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=4)


def test_simple(index, tmp_path):
    assert list(index.get(1)[0]) == [5, 6]
    assert list(index.get(1)[1]) == [1, 1]

    f = str(tmp_path / "tmp.index")
    index.to_file(f)
    index = CollisionFreeKmerIndex.from_file(f)
    assert list(index.get(5)[0]) == [11]
    nodes, offsets, read_offsets, freqs = \
        index.get_nodes_and_ref_offsets_from_multiple_kmers(np.array([1, 5]))
    assert list(nodes) == [5, 6, 11]
    assert list(read_offsets) == [0, 0, 1]


def test_frequencies(index):
    # kmer 1: ref offsets (1, 1) -> 1 distinct; kmer 2: (2, 3) -> 2
    assert index.get(1, max_hits=10)[2][0] == 1
    assert index.get(2, max_hits=10)[2][0] == 2


def test_has_kmers_parallel(index):
    index.convert_to_int32()
    kmers = np.array([1, 2, 3, 10, 10, 12, 100, 101, 102, 5],
                     dtype=np.uint64)
    result = index.has_kmers_parallel(kmers, n_threads=3)
    assert np.all(result == [True, True, True, False, False, False, False,
                             False, False, True]), result


def test_minimal_index(tmp_path):
    flat = FlatKmers(np.array([1, 2, 7], dtype=np.uint64),
                     np.array([10, 20, 30]),
                     np.array([0, 0, 0]))
    m = MinimalKmerIndex.from_flat_kmers(flat, modulo=5)
    f = str(tmp_path / "minimal")
    m.to_file(f)
    m = MinimalKmerIndex.from_file(f)
    # kmer 7 -> bucket 2, same as kmer 2: collision resolved by kmer match
    assert m.max_node_id() == 30


def test_kmer_index2():
    flat_kmers = FlatKmers2(
        np.array([1, 1, 1, 2, 3, 10, 11, 2]),
        np.array([1, 1, 2, 2, 3, 1, 10, 5]),
        np.array([0, 0, 1, 2, 3, 4, 5, 6]),
        np.array([1, 2, 3, 4, 5, 6, 7, 8]),
        np.array([0.4, 0.1, 0.3, 0.4, 0.1, 0.1, 0.1, 0.1]))
    index = KmerIndex2.from_flat_kmers(flat_kmers)
    assert index.get_kmer_frequency(1) == 2
    assert np.all(index.get_start_nodes(1) == [1, 1, 2])
    assert np.all(index.get_nodes(3) == [5])


def test_reverse_kmer_index(tmp_path):
    flat = FlatKmers(np.array([10, 3, 11, 4]), np.array([5, 3, 5, 8]))
    reverse = ReverseKmerIndex.from_flat_kmers(flat)
    assert 11 in reverse.get_node_kmers(5)
    assert 10 in reverse.get_node_kmers(5)
    assert 3 in reverse.get_node_kmers(3)
    assert 4 in reverse.get_node_kmers(8)
    f = str(tmp_path / "tmp.reverse")
    reverse.to_file(f)
    new_reverse = ReverseKmerIndex.from_file(f + ".npz")
    assert 3 in new_reverse.get_node_kmers(3)


def test_count_min_sketch():
    counter = CountMinSketchKmerCounter.create_empty([3, 9, 13])
    counter.count_kmers(np.array([123, 5]))
    assert counter.get_count(123) == 1
    assert counter.get_count(5) == 1
    counter.count_kmers(np.array([5, 5, 5]))
    assert counter.get_count(5) == 4


def test_kmer_counter():
    flat = FlatKmers(np.array([5, 5, 7, 9, 9, 9], dtype=np.uint64),
                     np.arange(6))
    counter = KmerCounter.from_flat_kmers(flat, modulo=101)
    assert counter.get_frequency(5) == 2
    assert counter.get_frequency(9) == 3
    assert counter.get_frequency(1234) == 0
    # score = -max frequency of the set (reference kmer_counter.py:76-83)
    assert counter.score_kmers(np.array([5, 9], dtype=np.uint64)) == -3
    assert counter.score_kmers(np.array([], dtype=np.uint64)) == 1


def test_kmer_frequency_index(tmp_path):
    idx = KmerFrequencyIndex.from_kmers(
        np.array([4, 4, 4, 9, 1], dtype=np.uint64))
    assert idx.get(4) == 3
    assert idx.get(9) == 1
    assert idx.get(777) == 0
    f = str(tmp_path / "freq")
    idx.to_file(f)
    idx = KmerFrequencyIndex.from_file(f)
    assert idx.get(4) == 3


def test_reference_kmer_index():
    # Bit-identical reference quirk: the FIRST row is never registered
    # (ediff1d(to_begin=0) marks no "new position" at row 0, reference
    # reference_kmer_index.py:91-95), so lookups start at the second
    # distinct ref position.
    flat = FlatKmers(np.array([11, 12, 13, 14], dtype=np.uint64),
                     np.array([1, 1, 1, 1]),
                     np.array([1, 2, 3, 6]))
    idx = ReferenceKmerIndex.from_flat_kmers(flat)
    assert list(idx.ref_position_to_index) == [1, 1, 1, 2, 3, 3, 3]
    between = idx.get_between(1, 4)
    assert list(between) == [12, 13]
    assert 14 not in between


def test_counter_kmer_index(index):
    c = CounterKmerIndex.from_kmer_index(index)
    c.count_kmers(np.array([1, 1, 5], dtype=np.uint64))
    counts = c.get_node_counts()
    # kmer 1 hits nodes 5 and 6 twice; kmer 5 hits node 11 once
    assert counts[5] == 2 and counts[6] == 2 and counts[11] == 1


def test_flat_kmers_singleton_removal():
    flat = FlatKmers(np.array([1, 1, 2, 3, 3, 3], dtype=np.uint64),
                     np.array([10, 11, 12, 13, 14, 15]),
                     np.array([0, 1, 2, 3, 4, 5]))
    pruned = flat.get_new_without_singletons()
    # first occurrence of each hash dropped (reference flat_kmers.py:98-125)
    assert list(pruned._hashes) == [1, 3, 3]
    assert list(pruned._nodes) == [11, 14, 15]


def test_flat_kmers_revcomp_roundtrip():
    from graph_kmer_index_tpu import sequence_to_kmer_hash
    h = sequence_to_kmer_hash("ACTGG")
    flat = FlatKmers(np.array([h], dtype=np.uint64), np.array([1]))
    rc = flat.get_reverse_complement_flat_kmers(5)
    assert rc._hashes[0] == sequence_to_kmer_hash("CCAGT")


def test_unique_kmer_index(tmp_path):
    from graph_kmer_index_tpu import (Graph, DenseKmerFinder,
                                      UniqueKmerIndex)
    graph = Graph.from_dicts(
        {1: "ACTGACTGAA", 2: "A", 3: "G", 4: "CCTACGTGCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    reverse = ReverseKmerIndex.from_flat_kmers(flat)
    unique = UniqueKmerIndex.from_flat_kmers_and_snps_graph(
        flat, graph, reverse)
    f = str(tmp_path / "uniq.pkl")
    unique.to_file(f)
    unique2 = UniqueKmerIndex.from_file(f)
    assert unique2._index_dict == unique._index_dict


def test_critical_paths_roundtrip(tmp_path):
    from graph_kmer_index_tpu import CriticalGraphPaths, Graph
    graph = Graph.from_dicts(
        {1: "ACTGACTGAA", 2: "A", 3: "G", 4: "CCTACGTGCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    cgp = CriticalGraphPaths.from_graph(graph, 4)
    f = str(tmp_path / "crit")
    cgp.to_file(f)
    cgp2 = CriticalGraphPaths.from_file(f)
    assert list(cgp) == list(cgp2)


def test_packed_lookup_deep_buckets():
    """Packed-record device lookup == scalar path, with repeated kmers
    forcing internal-bucket depths > 2 (compacted-overflow scan path)."""
    rng = np.random.default_rng(11)
    n = 3000
    flat = FlatKmers(rng.integers(0, 10000, n).astype(np.uint64),
                     rng.integers(1, 200, n).astype(np.uint32),
                     rng.integers(0, 1000, n).astype(np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=7)
    queries = np.concatenate([
        np.asarray(flat._hashes[:500], np.uint64),
        rng.integers(0, 20000, 500).astype(np.uint64)])
    counts = index.map_kmers(queries, 200)
    # scalar cross-check
    expected = np.zeros(200, dtype=np.int64)
    for q in queries:
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += 1
    assert np.array_equal(np.asarray(counts), expected)
    has = index.has_kmers(queries)
    expected_has = np.array([index.get(int(q), 10**9)[0] is not None
                             for q in queries])
    assert np.array_equal(np.asarray(has), expected_has)


def test_packed_lookup_dup2_buckets():
    """Size-2 SAME-kmer ("dup2") internal buckets: the k1 record lanes
    stay EMPTY (lane hits mutually exclusive) and matches resolve via
    the scan stage — which must run even when the table has NO bucket
    deeper than 2 (a max-bucket-size gate alone would skip it and drop
    every dup2 hit from the counts)."""
    from graph_kmer_index_tpu.ops.lookup import internal_modulo
    rng = np.random.default_rng(9)
    uniq = 4 * np.arange(40, dtype=np.uint64) + 1
    kmers = np.repeat(uniq, 2)  # each kmer exactly twice
    n = len(kmers)
    # all values below the internal modulo -> distinct kmers occupy
    # distinct buckets: EVERY bucket is a dup2 bucket, none is deeper
    assert int(uniq.max()) < internal_modulo(n)
    nodes = (np.arange(n, dtype=np.uint32) % 37) + 1
    flat = FlatKmers(kmers, nodes, np.arange(n, dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    dev = index._device()
    packed = dev._packed()
    assert packed is not None and packed[4] == 2  # no deep buckets...
    assert dev._deep_frac > 0                     # ...but dup2 rows
    queries = np.concatenate([
        np.repeat(uniq, 3),                                   # hits
        rng.integers(600, 10000, 80).astype(np.uint64)])      # misses
    counts = index.map_kmers(queries, 40)
    expected = np.zeros(40, dtype=np.int64)
    for q in queries:
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += 1
    assert np.array_equal(np.asarray(counts, dtype=np.int64), expected)
    has = index.has_kmers(queries)
    expected_has = np.array([index.get(int(q), 10**9)[0] is not None
                             for q in queries])
    assert np.array_equal(np.asarray(has), expected_has)


def test_ref_bucket_ranges_matches_searchsorted():
    """The merged-sort range computation == numpy searchsorted l/r over
    the sorted bucket column, incl. empty buckets, bucket 0, modulo-1,
    and duplicate queries."""
    from graph_kmer_index_tpu.ops.lookup import _ref_bucket_ranges
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    modulo = 97
    tb = np.sort(rng.integers(0, modulo, 5000)).astype(np.int32)
    qb = np.concatenate([rng.integers(0, modulo, 900),
                         [0, 0, modulo - 1, 42, 42]]).astype(np.int32)
    start, size = _ref_bucket_ranges(jnp.asarray(qb), jnp.asarray(tb))
    left = np.searchsorted(tb, qb, side="left")
    right = np.searchsorted(tb, qb, side="right")
    got_start = np.asarray(start)
    got_size = np.asarray(size)
    assert np.array_equal(got_size, right - left)
    # start is only meaningful for non-empty buckets
    nz = got_size > 0
    assert np.array_equal(got_start[nz], left[nz])


def test_get_batched_ranges_path_matches_table_path():
    """get_batched with per-query ranges from the merged-sort
    searchsorted (production-modulo regime, no bucket tables) must equal
    the bucket-table gather path bit for bit."""
    from graph_kmer_index_tpu.ops.lookup import DeviceKmerIndex
    rng = np.random.default_rng(31)
    n = 3000
    flat = FlatKmers(rng.integers(0, 50000, n).astype(np.uint64),
                     rng.integers(1, 300, n).astype(np.uint32),
                     rng.integers(0, 2000, n).astype(np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    queries = np.concatenate([
        np.asarray(flat._hashes[:400], np.uint64),
        rng.integers(0, 100000, 200).astype(np.uint64)])
    via_tables = index.get_batched(queries)
    old = DeviceKmerIndex.BUCKET_TABLE_BYTE_BUDGET
    try:
        DeviceKmerIndex.BUCKET_TABLE_BYTE_BUDGET = 0
        dev2 = DeviceKmerIndex.from_host_index(index)
        assert not dev2._bucket_tables_cheap()
        via_ranges = dev2.get_batched(queries)
    finally:
        DeviceKmerIndex.BUCKET_TABLE_BYTE_BUDGET = old
    assert np.array_equal(np.asarray(via_tables), np.asarray(via_ranges))


def test_map_kmers_sorted_vs_scatter_paths():
    """_node_counts_packed picks sort-aggregation when n_nodes is small
    relative to the batch and direct scatter otherwise (a static, traced
    choice). Both must produce identical counts. n_nodes=200 < 1.5*1024
    triggers the sorted path; n_nodes=5000 > 1.5*1024 the scatter path."""
    rng = np.random.default_rng(23)
    n = 4000
    flat = FlatKmers(rng.integers(0, 30000, n).astype(np.uint64),
                     rng.integers(1, 180, n).astype(np.uint32),
                     rng.integers(0, 1000, n).astype(np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=13)
    queries = np.concatenate([
        np.asarray(flat._hashes[::3], np.uint64),
        rng.integers(0, 60000, 700).astype(np.uint64)])
    small = np.asarray(index.map_kmers(queries, 200))
    large = np.asarray(index.map_kmers(queries, 5000))
    assert np.array_equal(small, large[:200])
    assert large[200:].sum() == 0
    expected = np.zeros(200, dtype=np.int64)
    for q in queries:
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += 1
    assert np.array_equal(small, expected)


def test_index_bundle(tmp_path):
    from graph_kmer_index_tpu import IndexBundle
    flat = FlatKmers(np.array([5, 9], dtype=np.uint64), np.array([1, 2]))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    bundle = IndexBundle({"KmerIndex": idx, "TrickyVariants": [1, 2, 3]})
    f = str(tmp_path / "bundle.pkl")
    bundle.to_file(f)
    b2 = IndexBundle.from_file(f)
    assert "KmerIndex" in b2
    assert list(b2["KmerIndex"].get(5)[0]) == [1]
    b3 = IndexBundle.from_file(f, skip=["TrickyVariants"])
    assert "TrickyVariants" not in b3


def test_get_frequencies_vectorized_matches_scalar(index):
    kmers = np.array([1, 2, 3, 4, 5, 999], dtype=np.uint64)
    vec = index.get_frequencies(kmers)
    scalar = np.array([index.get_frequency(int(h)) for h in kmers])
    assert np.array_equal(vec, scalar)
    # FlatKmers scoring helpers agree with the python loops
    flat = FlatKmers(kmers, np.arange(6))
    assert flat.maximum_kmer_frequency(index) == max(
        0, *[index.get_frequency(int(h)) for h in kmers])


def test_reference_kmer_index_from_linear_reference(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\nACGTACGTACGTACGTACGT\n")
    idx = ReferenceKmerIndex.from_linear_reference(str(fa), "chr1", 4)
    from graph_kmer_index_tpu import sequence_to_kmer_hash
    between = idx.get_between(1, 4)
    assert sequence_to_kmer_hash("CGTA") in between
    f = str(tmp_path / "refidx")
    idx.to_file(f)
    idx2 = ReferenceKmerIndex.from_file(f)
    assert np.array_equal(np.asarray(idx2.kmers), np.asarray(idx.kmers))


def test_map_kmers_chunked_matches_unchunked(index):
    """Batch chunking must not change counts."""
    from graph_kmer_index_tpu.ops.lookup import DeviceKmerIndex
    dev = index._device()
    old_chunk = DeviceKmerIndex.QUERY_CHUNK
    rng = np.random.default_rng(5)
    queries = np.concatenate([
        np.array([1, 2, 3, 4, 5] * 200, dtype=np.uint64),
        rng.integers(0, 1000, 500).astype(np.uint64)])
    try:
        unchunked = index.map_kmers(queries, 200)
        DeviceKmerIndex.QUERY_CHUNK = 256  # force chunking
        chunked = index.map_kmers(queries, 200)
    finally:
        DeviceKmerIndex.QUERY_CHUNK = old_chunk
    assert np.array_equal(np.asarray(unchunked),
                          np.asarray(chunked).astype(unchunked.dtype))
    try:
        DeviceKmerIndex.QUERY_CHUNK = 256
        has_c = index.has_kmers(queries)
    finally:
        DeviceKmerIndex.QUERY_CHUNK = old_chunk
    assert np.array_equal(np.asarray(index.has_kmers(queries)),
                          np.asarray(has_c))


def test_batched_multiple_kmers_matches_scalar(index):
    """The device-batched get_nodes_and_ref_offsets_from_multiple_kmers
    must agree exactly with the per-kmer python ``get`` loop, including
    the drop-query-when-first-hit-frequency-exceeds-max_hits rule."""
    rng = np.random.default_rng(1)
    queries = np.concatenate([
        np.array([1, 1, 2, 3, 4, 5], dtype=np.uint64),
        rng.integers(0, 50, 60).astype(np.uint64)])
    for max_hits in (10, 1):
        want = index._get_from_multiple_kmers_scalar(queries, max_hits)
        got = index.get_nodes_and_ref_offsets_from_multiple_kmers(
            queries, max_hits=max_hits)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    got_nodes = index.get_nodes_from_multiple_kmers(queries)
    np.testing.assert_array_equal(
        got_nodes, index._get_from_multiple_kmers_scalar(queries, 10)[0])


def test_set_frequencies_using_other_index_vectorized(index):
    other = CollisionFreeKmerIndex.from_flat_kmers(
        FlatKmers(np.array([1, 1, 2, 5], dtype=np.uint64),
                  np.array([1, 2, 3, 4]),
                  np.array([7, 8, 9, 10])), modulo=4)
    idx2 = index.copy()
    idx2.set_frequencies_using_other_index(other)
    # expected: scalar loop semantics
    expected = np.maximum(1, np.array(
        [other.get_frequency(int(km)) for km in idx2._kmers]))
    np.testing.assert_array_equal(np.asarray(idx2._frequencies,
                                             dtype=np.int64), expected)


def test_mutation_invalidates_query_caches(index):
    dev = index._device()
    assert index._device_index is dev
    index.set_frequencies_using_other_index(index)
    assert index._device_index is None  # stale HBM view dropped
    # fresh view sees the new frequencies
    dev2 = index._device()
    np.testing.assert_array_equal(
        np.asarray(dev2.table_frequencies),
        np.asarray(index._frequencies).astype(np.int32))


def test_packed_lookup_overflow_host_path():
    """A batch where >1/32 of queries land in deep buckets exceeds the
    compaction capacity; those queries resolve through the deduplicated
    host path and counts stay exact."""
    rng = np.random.default_rng(5)
    # 60 distinct kmers, each stored on 5 nodes -> every bucket deep
    kmers = np.repeat(np.arange(100, 160, dtype=np.uint64), 5)
    nodes = rng.integers(1, 50, len(kmers)).astype(np.uint32)
    flat = FlatKmers(kmers, nodes,
                     np.arange(len(kmers), dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    queries = rng.choice(np.arange(100, 160, dtype=np.uint64), 50000)
    dev = index._device()
    packed = dev._packed()
    assert packed is not None and packed[4] > 2  # deep buckets exist
    counts = index.map_kmers(queries, 50)
    expected = np.zeros(50, dtype=np.int64)
    import collections
    qc = collections.Counter(queries.tolist())
    for q, cnt in qc.items():
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += cnt
    assert np.array_equal(np.asarray(counts, dtype=np.int64), expected)
    has = index.has_kmers(queries)
    assert bool(np.all(has))


def test_index_bundle_npz_format(tmp_path):
    """Bundles are one self-describing npz (shared_memory_wrapper-style
    decomposition, reference index_bundle.py:15-19): hierarchical
    Name/prop keys + manifest; a KmerIndex round-trips queryable and
    VariantToNodes reconstructs to its class."""
    from graph_kmer_index_tpu import IndexBundle
    from graph_kmer_index_tpu.graph import VariantToNodes
    flat = FlatKmers(np.array([5, 9], dtype=np.uint64), np.array([1, 2]))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    v2n = VariantToNodes(np.array([2, 4]), np.array([3, 5]))
    bundle = IndexBundle({"KmerIndex": idx, "VariantToNodes": v2n,
                          "TrickyVariants": np.array([0, 1, 0])})
    out = bundle.to_file(str(tmp_path / "bundle"))
    assert out.endswith(".npz")
    # the file is a plain npz with hierarchical keys — inspectable
    # without this package
    raw = np.load(out)
    assert "KmerIndex/_kmers" in raw.files and "__manifest__" in raw.files
    b2 = IndexBundle.from_file(str(tmp_path / "bundle"))
    assert list(b2["KmerIndex"].get(5)[0]) == [1]
    assert isinstance(b2["VariantToNodes"], VariantToNodes)
    assert list(b2["VariantToNodes"].ref_nodes) == [2, 4]
    np.testing.assert_array_equal(b2["TrickyVariants"], [0, 1, 0])


def test_index_bundle_foreign_npz(tmp_path):
    """A foreign hierarchically-keyed npz (no manifest) still loads: known
    classes reconstructed by property match, unknown groups exposed as
    namespaces."""
    from graph_kmer_index_tpu import IndexBundle
    np.savez(str(tmp_path / "foreign.npz"),
             **{"VariantToNodes/ref_nodes": np.array([1, 2]),
                "VariantToNodes/var_nodes": np.array([3, 4]),
                "Mystery/data": np.array([7.0])})
    b = IndexBundle.from_file(str(tmp_path / "foreign.npz"))
    assert list(b["VariantToNodes"].ref_nodes) == [1, 2]
    assert b["Mystery"].data[0] == 7.0


def test_packed_lookup_ultra_deep_buckets():
    """Buckets deeper than SCAN_CAP (repeat kmers like poly-A) must
    bypass the on-device scan entirely and still produce exact counts
    and membership."""
    from graph_kmer_index_tpu.ops.lookup import SCAN_CAP
    rng = np.random.default_rng(9)
    depth = SCAN_CAP + 50
    kmers = np.concatenate([
        np.full(depth, 7, dtype=np.uint64),          # one ultra kmer
        np.arange(100, 1100, dtype=np.uint64)])      # normal rows
    nodes = np.concatenate([
        rng.integers(1, 40, depth),
        rng.integers(1, 40, 1000)]).astype(np.uint32)
    flat = FlatKmers(kmers, nodes, np.arange(len(kmers), dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=4099)
    queries = np.array([7, 7, 150, 99999, 7], dtype=np.uint64)
    counts = index.map_kmers(queries, 40)
    expected = np.zeros(40, dtype=np.int64)
    for q in queries:
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += 1
    assert np.array_equal(np.asarray(counts, dtype=np.int64), expected)
    has = index.has_kmers(queries)
    assert list(has) == [True, True, True, False, True]

    # same verdicts through the device-resident read paths (the ultra
    # kmers must be fetched compactly, not via a full chunk transfer)
    import jax.numpy as jnp
    from graph_kmer_index_tpu.read_kmers import DeviceReadKmers
    pad = np.array([123456789, 42], dtype=np.uint64)  # compacted tail
    seg = jnp.asarray(np.concatenate([queries, pad]))
    rk = DeviceReadKmers([(seg, len(queries))], k=31)
    dev = index._device()
    counts_rk = dev.map_read_kmers(rk, 40)
    assert np.array_equal(np.asarray(counts_rk, dtype=np.int64), expected)
    has_rk = dev.has_read_kmers(rk)
    assert list(has_rk) == [True, True, True, False, True]


def test_packed_lookup_deep_overflow_retry():
    """A batch whose deep-bucket (size>2) query share blows past the
    default overflow capacity (~3%) must retry the device scan at a
    bigger cap — NOT fall to the per-unique-kmer host path — and stay
    exact. Construct: many 3-row buckets, every query hitting one."""
    rng = np.random.default_rng(3)
    n_deep = 2000  # unique kmers, 3 rows each -> all buckets deep
    deep_kmers = np.repeat(
        rng.choice(1 << 40, n_deep, replace=False).astype(np.uint64), 3)
    nodes = rng.integers(1, 50, len(deep_kmers)).astype(np.uint32)
    flat = FlatKmers(deep_kmers, nodes,
                     np.arange(len(deep_kmers), dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=1000003)
    # every query deep: > the 1/32 default cap by a huge margin
    queries = np.repeat(deep_kmers[::3], 4)  # 8000 queries, all hits
    counts = index.map_kmers(queries, 50)
    expected = np.bincount(nodes.astype(np.int64), minlength=50) * 4
    assert np.array_equal(np.asarray(counts, dtype=np.int64), expected)
    assert bool(index.has_kmers(queries).all())
    miss = index.has_kmers(np.array([3, 5], dtype=np.uint64))
    assert not miss.any()


def test_empty_flat_kmers_builds():
    """Zero-row FlatKmers must build queryable (all-miss) indexes:
    np.ediff1d on an empty array still emits its to_begin element, which
    used to fabricate a bucket start into the empty table."""
    from graph_kmer_index_tpu import (CollisionFreeKmerIndex, FlatKmers,
                                      ReverseKmerIndex)
    ef = FlatKmers(np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                   np.zeros(0, np.uint64), np.zeros(0, np.float32))
    idx = CollisionFreeKmerIndex.from_flat_kmers(ef, modulo=101)
    assert not idx.has_kmers(np.array([5], np.uint64)).any()
    assert idx.map_kmers(np.array([5], np.uint64), 4).sum() == 0
    assert idx.get(5)[0] is None
    assert len(idx.has_kmers(np.zeros(0, np.uint64))) == 0
    rev = ReverseKmerIndex.from_flat_kmers(ef)
    assert len(rev.get_node_kmers(0)) == 0


def test_empty_flat_kmers_other_indexes():
    """KmerIndex2, ReferenceKmerIndex, and the packed table shards must
    also accept zero-row inputs (same ediff1d/concatenate-on-empty
    family of quirks)."""
    from graph_kmer_index_tpu.flat_kmers import FlatKmers, FlatKmers2
    from graph_kmer_index_tpu.models.kmer_index import (
        CollisionFreeKmerIndex, KmerIndex2)
    from graph_kmer_index_tpu.models.reference_index import (
        ReferenceKmerIndex)
    from graph_kmer_index_tpu.parallel.sharded import PackedTableShards

    ef = FlatKmers(np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                   np.zeros(0, np.uint64), np.zeros(0, np.float32))
    ef2 = FlatKmers2(np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                     np.zeros(0, np.uint16), np.zeros(0, np.uint32),
                     np.zeros(0, np.float32))
    KmerIndex2.from_flat_kmers(ef2)
    ri = ReferenceKmerIndex.from_flat_kmers(ef)
    assert len(ri.get_between(0, 5)) == 0
    idx = CollisionFreeKmerIndex.from_flat_kmers(ef, modulo=101)
    sh = PackedTableShards.from_index(idx, 4)
    assert sh.records.shape[0] == 4


def test_all_lookup_backends_agree_on_adversarial_table():
    """One randomized cross-backend blast: a table engineered to hit
    every lookup path at once — dup2 buckets (same kmer twice), deep
    buckets (> 2 rows), ultra-deep buckets (> SCAN_CAP rows, e.g.
    poly-A), bucket-0 kmers, kmer 0, and the max 62-bit kmer — must give
    identical map_kmers/has_kmers through the numpy, device-packed, and
    native C++ backends, and identical get() row sets via get_batched."""
    from graph_kmer_index_tpu import native
    from graph_kmer_index_tpu.flat_kmers import FlatKmers
    from graph_kmer_index_tpu.models.kmer_index import CollisionFreeKmerIndex
    from graph_kmer_index_tpu.ops.lookup import SCAN_CAP

    rng = np.random.default_rng(99)
    n_base = 4000
    kmers = rng.integers(1, 1 << 50, n_base).astype(np.uint64)
    # engineered structure
    dup2 = rng.integers(1, 1 << 50, 30).astype(np.uint64)
    deep = np.repeat(rng.integers(1, 1 << 50, 10).astype(np.uint64), 5)
    ultra = np.repeat(np.uint64(0), SCAN_CAP + 40)        # kmer 0, ultra
    edge = np.array([4**31 - 1, 101, 202], dtype=np.uint64)  # max + b0s
    kmers = np.concatenate([kmers, dup2, dup2, deep, ultra, edge])
    n = len(kmers)
    nodes = rng.integers(1, 300, n).astype(np.uint32)
    flat = FlatKmers(kmers, nodes, rng.integers(0, 10000, n).astype(
        np.uint64), np.ones(n, np.float32))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101,
                                                 skip_frequencies=True)

    q = np.concatenate([
        kmers[rng.integers(0, n, 2000)],                   # hits
        rng.integers(1 << 51, 1 << 60, 1000).astype(np.uint64),  # misses
        np.array([0, 4**31 - 1, 101], dtype=np.uint64)])
    rng.shuffle(q)

    counts_np = idx.map_kmers(q, 301, backend="numpy")
    has_np = idx.has_kmers(q, backend="numpy")
    counts_dev = idx.map_kmers(q, 301, backend="device")
    has_dev = idx.has_kmers(q, backend="device")
    assert np.array_equal(np.asarray(counts_np, np.int64),
                          np.asarray(counts_dev, np.int64))
    assert np.array_equal(np.asarray(has_np, bool),
                          np.asarray(has_dev, bool))
    if native.available():
        counts_nat = idx.map_kmers(q, 301, backend="native")
        has_nat = idx.has_kmers(q, backend="native")
        assert np.array_equal(np.asarray(counts_np, np.int64),
                              np.asarray(counts_nat, np.int64))
        assert np.array_equal(np.asarray(has_np, bool),
                              np.asarray(has_nat, bool))


def test_index_bundle_nested_counter_roundtrip():
    """Object-valued properties (CounterKmerIndex's Counter) survive the
    bundle round-trip via one-level nested decomposition — they used to
    be silently dropped."""
    import tempfile, os
    from graph_kmer_index_tpu.containers import Counter
    from graph_kmer_index_tpu.models.bundle import IndexBundle
    from graph_kmer_index_tpu.models.kmer_index import CounterKmerIndex

    kmers = np.array([3, 7, 9], np.uint64)
    nodes = np.array([1, 2, 3], np.uint32)
    cki = CounterKmerIndex(kmers, nodes,
                           Counter(kmers, values=np.array([5, 6, 7])))
    p = os.path.join(tempfile.mkdtemp(), "b.npz")
    IndexBundle({"KmerIndex": cki}).to_file(p)
    loaded = IndexBundle.from_file(p)["KmerIndex"]
    assert type(loaded).__name__ == "CounterKmerIndex"
    assert list(loaded.counter[np.array([3, 7, 9])]) == [5, 6, 7]


def test_cms_large_kmers_exact_buckets():
    """CMS counting must be exact for kmers >= 2^53: int64 modulos
    promoted uint64 kmers to float64 under NumPy 2, rounding them into
    the wrong bucket on count (but not on query)."""
    from graph_kmer_index_tpu.models.counters import (
        CountMinSketchKmerCounter)
    c = CountMinSketchKmerCounter.create_empty([101, 103])
    big = np.array([2**62 + 3, 2**61 + 7], dtype=np.uint64)
    c.count_kmers(big)
    assert c.get_count(np.uint64(2**62 + 3)) == 1
    assert c.get_count(np.uint64(2**61 + 7)) == 1
    assert list(c.get_counts(big)) == [1, 1]


def test_kmer_index2_frequencies_unsorted_input():
    """KmerIndex2 frequencies pair each row's kmer with ITS OWN
    (start_node, start_offset): the hash-sorted key layout used to be
    zipped against the insertion-ordered value arrays."""
    from graph_kmer_index_tpu.flat_kmers import FlatKmers2
    from graph_kmer_index_tpu.models.kmer_index import KmerIndex2
    flat = FlatKmers2(
        np.array([7, 3, 3], np.uint64),        # NOT sorted by hash
        np.array([1, 1, 1], np.uint32),
        np.array([9, 5, 5], np.uint16),
        np.array([1, 1, 1], np.uint32),
        np.array([1, 1, 1], np.float32))
    idx = KmerIndex2.from_flat_kmers(flat)
    # kmer 3's two rows share the SAME (start_node=1, start_offset=5)
    # pair -> frequency 1 (reference collision_free_kmer_index.py:148-158)
    assert int(np.atleast_1d(idx.get_kmer_frequency(3))[0]) == 1
    assert int(np.atleast_1d(idx.get_kmer_frequency(7))[0]) == 1


def test_native_lookup_after_remove_ref_offsets():
    """get_batched after remove_ref_offsets() must not read out of
    bounds: the placeholder 1-element offsets array is zero-substituted
    in both the native and device lookup tables."""
    from graph_kmer_index_tpu.flat_kmers import FlatKmers
    from graph_kmer_index_tpu.models.kmer_index import CollisionFreeKmerIndex
    kmers = np.arange(1, 40, dtype=np.uint64) * 7
    flat = FlatKmers(kmers, np.arange(1, 40, dtype=np.uint32),
                     np.arange(40, 79, dtype=np.uint64),
                     np.ones(39, np.float32))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
    idx.remove_ref_offsets()
    out = idx.get_batched(kmers[:8])
    assert out.shape[0] == 5
    assert (out[1] == 0).all()  # offsets read as zeros, never garbage


def test_index_bundle_device_built_index_roundtrip():
    """A device-built index (jax-array properties — the DEFAULT at
    production modulo) must serialize into the bundle; jax arrays used
    to be silently dropped by the ndarray-only decomposition."""
    import tempfile, os
    from graph_kmer_index_tpu.flat_kmers import FlatKmers
    from graph_kmer_index_tpu.models.bundle import IndexBundle
    from graph_kmer_index_tpu.models.kmer_index import CollisionFreeKmerIndex
    kmers = np.arange(1, 200, dtype=np.uint64) * 13
    flat = FlatKmers(kmers, np.arange(1, 200, dtype=np.uint32),
                     np.arange(200, 399, dtype=np.uint64),
                     np.ones(199, np.float32))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=997,
                                                 use_device=True)
    p = os.path.join(tempfile.mkdtemp(), "b.npz")
    IndexBundle({"KmerIndex": idx}).to_file(p)
    loaded = IndexBundle.from_file(p)["KmerIndex"]
    assert loaded.has_kmers(kmers[:16]).all()
    assert not loaded.has_kmers(np.array([999999999], np.uint64))[0]


def test_empty_counter_vectorized_frequencies():
    """Regression: vectorized Counter lookup on a zero-key counter must
    return zeros like the scalar accessor, not IndexError (reachable
    from every frequency-scoring path via an empty FlatKmers)."""
    from graph_kmer_index_tpu.models.counters import KmerCounter
    from graph_kmer_index_tpu.flat_kmers import FlatKmers

    empty = FlatKmers(np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                      np.zeros(0, np.uint32))
    kc = KmerCounter.from_flat_kmers(empty, 101)
    qs = np.array([5, 9], dtype=np.uint64)
    assert kc.get_frequencies(qs).tolist() == [0, 0]
    assert kc.get_frequency(5) == 0
    assert empty.maximum_kmer_frequency(kc) == 0
    assert empty.sum_of_kmer_frequencies(kc) == 0


def test_variant_nodes_index():
    """VariantNodesIndex implements the reference's evident intent (the
    reference copy is dead code: empty method body = SyntaxError on
    import, variant_nodes_index.py:13-14): position-range queries,
    from_graph over the variant alleles, and a round-trip that also
    accepts the reference writer's misspelled npz key."""
    import tempfile
    import pathlib
    from graph_kmer_index_tpu import Graph, VariantNodesIndex

    graph = Graph.from_dicts(
        {1: "ACTGACTGAC", 2: "A", 3: "G", 4: "CCTGACTGAT", 5: "", 6: "TT",
         7: "GGG"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7]},
        [1, 2, 4, 5, 7])
    idx = VariantNodesIndex.from_graph(graph)
    # variant alleles = nodes off the linear-ref path: 3 (alt of 1->4)
    # and 6 (alt of the indel dummy 5)
    assert set(idx.variant_nodes.tolist()) == {3, 6}
    pos3 = int(graph.node_to_ref_offset[3])
    pos6 = int(graph.node_to_ref_offset[6])
    got = idx.get_variant_nodes_between_ref_positions(pos3, pos3 + 1)
    assert got.tolist() == [3]
    assert idx.get_variant_nodes_between_ref_positions(
        0, max(pos3, pos6) + 1).tolist() == sorted(
            [3, 6], key=lambda n: int(graph.node_to_ref_offset[n]))
    assert idx.get_variant_nodes_between_ref_positions(10**9, 10**9 + 1) \
        .tolist() == []

    with tempfile.TemporaryDirectory() as d:
        f = str(pathlib.Path(d) / "vni.npz")
        idx.to_file(f)
        back = VariantNodesIndex.from_file(f)
        np.testing.assert_array_equal(back.ref_positions, idx.ref_positions)
        np.testing.assert_array_equal(back.variant_nodes, idx.variant_nodes)
        # the reference's own to_file writes the key "ref_position"
        # (singular) while its from_file reads "ref_positions" — accept
        # the reference-written spelling too
        f2 = str(pathlib.Path(d) / "vni_ref.npz")
        np.savez(f2, ref_position=idx.ref_positions,
                 variant_nodes=idx.variant_nodes)
        back2 = VariantNodesIndex.from_file(f2)
        np.testing.assert_array_equal(back2.variant_nodes,
                                      idx.variant_nodes)
