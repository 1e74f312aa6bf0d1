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
