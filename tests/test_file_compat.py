"""On-disk format compatibility with the reference implementation.

Files written by the reference (np.savez with its key names,
collision_free_kmer_index.py:395-402 / flat_kmers.py:65-68 /
reverse_kmer_index.py / variant_to_nodes) must load here, and vice versa
— a user switching frameworks keeps their index files."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    CollisionFreeKmerIndex, FlatKmers, MinimalKmerIndex, VariantToNodes)


def test_reference_written_kmer_index_loads(tmp_path):
    # simulate a file written by the reference's to_file
    f = str(tmp_path / "refstyle")
    np.savez(f, hashes_to_index=np.array([0, 0, 1, 0], dtype=np.int64),
             n_kmers=np.array([0, 1, 2, 0], dtype=np.uint32),
             nodes=np.array([7, 8, 9], dtype=np.uint32),
             ref_offsets=np.array([1, 2, 3], dtype=np.uint64),
             kmers=np.array([5, 6, 10], dtype=np.uint64),
             modulo=np.int64(4),
             frequencies=np.array([1, 1, 1], dtype=np.uint16),
             allele_frequencies=np.ones(3, dtype=np.single))
    idx = CollisionFreeKmerIndex.from_file(f)
    assert list(idx.get(5)[0]) == [7]
    assert list(idx.get(6)[0]) == [8]  # collision bucket, kmer-resolved
    assert list(idx.get(10)[0]) == [9]


def test_our_kmer_index_has_reference_keys(tmp_path):
    flat = FlatKmers(np.array([1, 2, 5], dtype=np.uint64),
                     np.array([4, 5, 6]), np.array([0, 1, 2]))
    idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=7)
    f = str(tmp_path / "ours")
    idx.to_file(f)
    data = np.load(f + ".npz")
    assert set(data.keys()) == {
        "hashes_to_index", "n_kmers", "nodes", "ref_offsets", "kmers",
        "modulo", "frequencies", "allele_frequencies"}


def test_reference_written_flat_kmers_loads(tmp_path):
    f = str(tmp_path / "flat_ref")
    np.savez(f, hashes=np.array([3, 4], dtype=np.uint64),
             nodes=np.array([1, 2], dtype=np.uint32),
             ref_offsets=np.array([0, 5], dtype=np.uint64),
             allele_frequencies=np.ones(2, dtype=np.single))
    flat = FlatKmers.from_file(f)
    assert list(flat._hashes) == [3, 4]
    # and ours writes the same keys
    f2 = str(tmp_path / "flat_ours")
    flat.to_file(f2)
    assert set(np.load(f2 + ".npz").keys()) == {
        "hashes", "nodes", "ref_offsets", "allele_frequencies"}


def test_reference_written_minimal_index_loads(tmp_path):
    f = str(tmp_path / "minimal_ref")
    np.savez(f, hashes_to_index=np.array([0, 0, 0], dtype=np.int64),
             n_kmers=np.array([1, 0, 0], dtype=np.uint32),
             nodes=np.array([9], dtype=np.uint32),
             kmers=np.array([3], dtype=np.uint64),
             modulo=np.int64(3))
    m = MinimalKmerIndex.from_file(f)
    assert m.max_node_id() == 9


def test_variant_to_nodes_roundtrip(tmp_path):
    f = str(tmp_path / "v2n")
    np.savez(f, ref_nodes=np.array([1, 3]), var_nodes=np.array([2, 4]))
    v = VariantToNodes.from_file(f)
    assert list(v.ref_nodes) == [1, 3]


def test_reference_written_reverse_index_loads(tmp_path):
    # key names from reference reverse_kmer_index.py:53-57
    from graph_kmer_index_tpu import ReverseKmerIndex
    f = str(tmp_path / "rev_ref")
    np.savez(f, nodes_to_index_positions=np.array([0, 0, 2], dtype=np.int64),
             nodes_to_n_hashes=np.array([0, 2, 1], dtype=np.int64),
             hashes=np.array([11, 12, 13], dtype=np.uint64),
             ref_positions=np.array([5, 6, 7], dtype=np.uint32))
    r = ReverseKmerIndex.from_file(f)
    assert sorted(int(k) for k in r.get_node_kmers(1)) == [11, 12]
    assert [int(k) for k in r.get_node_kmers(2)] == [13]
    f2 = str(tmp_path / "rev_ours")
    r.to_file(f2)
    assert set(np.load(f2 + ".npz").keys()) == {
        "nodes_to_index_positions", "nodes_to_n_hashes", "hashes",
        "ref_positions"}


def test_reference_written_reference_index_loads(tmp_path):
    # the three key-set variants of reference reference_kmer_index.py:116-129
    from graph_kmer_index_tpu import ReferenceKmerIndex
    f = str(tmp_path / "refidx")
    np.savez(f, ref_position_to_index=np.array([0, 1, 2, 3], dtype=np.int64),
             kmers=np.array([7, 8, 9], dtype=np.uint64))
    r = ReferenceKmerIndex.from_file(f)
    assert [int(k) for k in r.get_between(0, 2)] == [7, 8]
    f_kmers_only = str(tmp_path / "refidx_k")
    np.savez(f_kmers_only, kmers=np.array([1, 2], dtype=np.uint64))
    assert [int(k) for k in ReferenceKmerIndex.from_file(f_kmers_only).kmers
            ] == [1, 2]
    f_full = str(tmp_path / "refidx_full")
    np.savez(f_full,
             ref_position_to_index=np.array([0, 1, 2, 3], dtype=np.int64),
             kmers=np.array([7, 8, 9], dtype=np.uint64),
             ref_positions=np.array([0, 1, 2], dtype=np.uint32),
             nodes=np.array([4, 5, 6], dtype=np.uint32))
    r = ReferenceKmerIndex.from_file(f_full)
    km, pos, nd = r.get_all_between(1, 3)
    assert [int(x) for x in km] == [8, 9]
    assert [int(x) for x in nd] == [5, 6]
    # our writer emits the same key sets
    f2 = str(tmp_path / "refidx_ours")
    r.to_file(f2)
    assert set(np.load(f2 + ".npz").keys()) == {
        "ref_position_to_index", "kmers", "ref_positions", "nodes"}


def test_reference_written_frequency_index_loads(tmp_path):
    # key names from reference kmer_frequency_index.py:27-37
    from graph_kmer_index_tpu import KmerFrequencyIndex
    f = str(tmp_path / "freq_ref")
    np.savez(f, kmers=np.array([3, 9], dtype=np.uint64),
             frequencies=np.array([2, 5], dtype=np.int64))
    idx = KmerFrequencyIndex.from_file(f)
    assert idx.get(9) == 5
    f2 = str(tmp_path / "freq_ours")
    idx.to_file(f2)
    assert set(np.load(f2 + ".npz").keys()) == {"kmers", "frequencies"}


def test_reference_written_unique_kmer_index_loads(tmp_path):
    # reference unique_kmer_index.py:12-21 pickles the plain dict
    import pickle
    from graph_kmer_index_tpu import UniqueKmerIndex
    f = str(tmp_path / "unique_ref.pkl")
    with open(f, "wb") as fh:
        pickle.dump({5: [1, 2]}, fh)
    u = UniqueKmerIndex.from_file(f)
    assert u.get(5) == [1, 2]
    f2 = str(tmp_path / "unique_ours.pkl")
    u.to_file(f2)
    with open(f2, "rb") as fh:
        assert pickle.load(fh) == {5: [1, 2]}


def test_reference_written_logn_hash_map_loads(tmp_path):
    # reference logn_hash_map.py:5-9 saves the sorted hash array as .npy
    from graph_kmer_index_tpu.containers import LogNHashMap
    f = str(tmp_path / "lognmap")
    np.save(f, np.array([2, 5, 9], dtype=np.int64))
    m = LogNHashMap.from_file(f)
    assert m.hash(5) == 1 and m.unhash(2) == 9


def test_foreign_bundle_npz_fixture_reconstructs_indexes(tmp_path):
    """The tolerant foreign-bundle loader against a hand-constructed npz
    emulating a reference-side bundle: hierarchical ``<DictKey>/<prop>``
    keys, NO ``__manifest__``, property names exactly as the reference's
    ``properties`` sets declare them (collision_free_kmer_index.py:
    164-174, to_file'd via shared_memory_wrapper per index_bundle.py:
    15-19 — the package itself is unobtainable offline, so this fixture
    pins the derivable contract: each bundle dict key maps to that
    index's decomposed property arrays). The loader must hand back REAL
    index objects, not raw arrays."""
    from graph_kmer_index_tpu.models.bundle import IndexBundle

    # a small collision-bearing KmerIndex (modulo 4 forces bucket reuse)
    payload = {
        "KmerIndex/_hashes_to_index": np.array([0, 0, 1, 0],
                                               dtype=np.int64),
        "KmerIndex/_n_kmers": np.array([0, 1, 2, 0], dtype=np.uint32),
        "KmerIndex/_nodes": np.array([7, 8, 9], dtype=np.uint32),
        "KmerIndex/_ref_offsets": np.array([1, 2, 3], dtype=np.uint64),
        "KmerIndex/_kmers": np.array([5, 6, 10], dtype=np.uint64),
        "KmerIndex/_modulo": np.int64(4),
        "KmerIndex/_frequencies": np.array([1, 1, 1], dtype=np.uint16),
        "KmerIndex/_allele_frequencies": np.ones(3, dtype=np.single),
        "VariantToNodes/ref_nodes": np.array([7, 9], dtype=np.uint32),
        "VariantToNodes/var_nodes": np.array([8, 10], dtype=np.uint32),
        # an index type this package does not know must still surface
        "TrickyVariants/tricky_variants": np.array([0, 1, 0],
                                                   dtype=np.uint8),
    }
    f = str(tmp_path / "foreign_bundle.npz")
    np.savez(f, **payload)

    bundle = IndexBundle.from_file(f)
    idx = bundle["KmerIndex"]
    assert isinstance(idx, CollisionFreeKmerIndex), type(idx)
    assert list(idx.get(5)[0]) == [7]
    assert list(idx.get(6)[0]) == [8]   # collision bucket, kmer-resolved
    assert list(idx.get(10)[0]) == [9]
    v2n = bundle["VariantToNodes"]
    assert np.array_equal(v2n.ref_nodes, payload["VariantToNodes/ref_nodes"])
    assert np.array_equal(v2n.var_nodes, payload["VariantToNodes/var_nodes"])
    assert list(v2n) == [(7, 8), (9, 10)]
    tricky = bundle["TrickyVariants"]  # unknown class -> namespace
    assert np.array_equal(tricky.tricky_variants,
                          payload["TrickyVariants/tricky_variants"])


def test_foreign_flat_npz_exposes_arrays(tmp_path):
    """A foreign npz with no hierarchy at all (arrays at top level) must
    load with every array reachable by key."""
    from graph_kmer_index_tpu.models.bundle import IndexBundle

    f = str(tmp_path / "flat_foreign.npz")
    np.savez(f, counts=np.arange(5, dtype=np.int64),
             offsets=np.array([10, 20], dtype=np.uint64))
    bundle = IndexBundle.from_file(f)
    assert np.array_equal(bundle["counts"], np.arange(5))
    assert np.array_equal(bundle["offsets"], [10, 20])
