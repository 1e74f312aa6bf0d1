"""DenseKmerFinder behavioral parity suite.

Each case mirrors a reference test (tests/test_kmer_finder.py) — same
graphs, same expected kmers/nodes/offsets, including the exact global row
order of test_case1.
"""
import sys

import numpy as np
import pytest

from graph_kmer_index_tpu import (
    Graph, DenseKmerFinder, KmerIndex2, sequence_to_kmer_hash,
    kmer_hash_to_sequence)


def h(s):
    return sequence_to_kmer_hash(s)


def test_very_simple():
    graph = Graph.from_dicts(
        {0: "AAA", 1: "C", 2: "T", 3: "AAA"},
        {0: [1, 2], 2: [3], 1: [3]},
        [0, 1, 3])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers(), modulo=15)

    assert np.all(index.get_nodes(h("ATA")) == [0, 2, 3])
    assert np.all(index.get_start_nodes(h("ATA")) == [3, 3, 3])
    assert np.all(index.get_start_offsets(h("ATA")) == [0, 0, 0])
    assert set(index.get_nodes(h("ACA"))) == {0, 1, 3}
    assert set(index.get_nodes(h("AAA"))) == {0, 3}
    assert len(index.get_all_kmers()) == 16


def test_simple():
    graph = Graph.from_dicts(
        {0: "ACTGACTG", 1: "A", 2: "T", 3: "AAAAA", 4: "C", 5: "T",
         6: "TGGGGG"},
        {0: [1, 2], 2: [3], 1: [3], 3: [4, 5], 4: [6], 5: [6]},
        [0, 1, 3, 4, 6])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("ACT"))) == {0, 3, 4, 6}
    assert set(index.get_start_nodes(h("AAC"))) == {4}
    assert set(index.get_start_offsets(h("AAC"))) == {0}


def test_nested_paths():
    # recursion must stop at the nested node so entries are not duplicated;
    # the reference pins exactly 41 rows (tests/test_kmer_finder.py:62)
    graph = Graph.from_dicts(
        {0: "AAA", 1: "C", 2: "T", 3: "AAAA", 4: "C", 5: "G", 6: "AAA",
         7: "TTT"},
        {0: [1, 2, 7], 1: [3], 2: [3], 3: [4, 5], 4: [6], 5: [6], 7: [6]},
        [0, 1, 3, 4, 6])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    flat = finder.get_flat_kmers()
    assert len(flat._hashes) == 41, len(flat._hashes)


def test_long_node():
    graph = Graph.from_dicts(
        {1: "ATC", 2: "AAAAAAAA", 3: "T", 4: "CTA"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert len(index.get_nodes(h("AAA"))) == 6
    assert len(index.get_nodes(h("AAC"))) == 2


def test_empty_dummy_nodes():
    graph = Graph.from_dicts(
        {1: "ACT", 2: "C", 3: "", 4: "ACT"},
        {1: [2, 3], 3: [4], 2: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("CTA"))) == {1, 3, 4}
    assert set(index.get_nodes(h("TCA"))) == {1, 2, 4}


def test_empty_dummy_nodes2():
    graph = Graph.from_dicts(
        {1: "AAAAA", 2: "", 3: "CCCCCC"},
        {1: [2], 2: [3]},
        [1, 3])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("ACC"))) == {1, 2, 3}
    assert set(index.get_nodes(h("CCC"))) == {3}
    assert set(index.get_nodes(h("AAC"))) == {1, 2, 3}
    assert len(index.get_nodes(h("AAA"))) == 3
    assert len(index.get_nodes(h("CCC"))) == 4


def test_empty_dummy_nodes3():
    graph = Graph.from_dicts(
        {1: "AAAAA", 2: "G", 3: "", 4: "CCCCCC"},
        {1: [2], 2: [3], 3: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("AGC"))) == {1, 2, 3, 4}
    assert set(index.get_start_nodes(h("AGC"))) == {4}
    assert set(index.get_start_offsets(h("AGC"))) == {0}
    assert set(index.get_start_offsets(h("AAA"))) == {2, 3, 4}
    assert set(index.get_nodes(h("CCC"))) == {4}


def test_empty_dummy_nodes4():
    graph = Graph.from_dicts(
        {1: "CC", 2: "", 3: "CCTCTG"},
        {1: [2], 2: [3]},
        [1, 3])
    finder = DenseKmerFinder(graph, k=4)
    finder.find_only_kmers_starting_at_position(1, 0)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("CCCC"))) == {1, 2, 3}


def test_graph_with_multiple_critical_points():
    graph = Graph.from_dicts(
        {1: "CCCCC", 2: "G", 3: "", 4: "ACT", 5: "", 6: "GC", 7: "A",
         8: "T", 9: "G", 10: "GGG"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7], 7: [8, 9],
         8: [10], 9: [10]},
        [1, 2, 4, 7, 8, 10])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("TAT"))) == {4, 5, 7, 8}
    assert set(index.get_start_offsets(h("TAT"))) == {0}
    assert set(index.get_start_nodes(h("TAT"))) == {8}
    assert set(index.get_nodes(h("ACT"))) == {4}
    assert set(index.get_nodes(h("GGG"))) == {9, 10}
    assert set(index.get_nodes(h("CAC"))) == {1, 3, 4}


def test_two_long_nodes1():
    graph = Graph.from_dicts(
        {1: "CCCCCCCCCC", 2: "AAAA"},
        {1: [2]},
        [1, 2])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_start_offsets(h("CCC"))) == {2, 3, 4, 5, 6, 7, 8, 9}
    assert set(index.get_start_offsets(h("AAA"))) == {2, 3}


def test_two_long_nodes2():
    graph = Graph.from_dicts(
        {1: "CATGCATGCCTG", 2: "CCAAG"},
        {1: [2]},
        [1, 2])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_start_offsets(h("CTGCC"))) == {1}
    assert set(index.get_start_nodes(h("CTGCC"))) == {2}
    assert set(index.get_nodes(h("CTGCC"))) == {1, 2}
    assert len(index.get_start_nodes(h("CTGCC"))) == 2
    assert list(index.get_start_offsets(h("GCCTG"))) == [11]
    assert list(index.get_start_offsets(h("CCAAG"))) == [4]
    assert set(index.get_start_offsets(h("CATGC"))) == {4, 8}


def test_neighbouring_dummy_nodes():
    graph = Graph.from_dicts(
        {1: "ACT", 2: "", 3: "GGG", 4: "", 5: "A", 6: "CCC"},
        {1: [2, 3], 2: [4, 5], 3: [4, 5], 4: [6], 5: [6]},
        [1, 5, 6])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("TCC"))) == {1, 2, 4, 6}
    assert set(index.get_nodes(h("TAC"))) == {1, 2, 5, 6}
    assert set(index.get_nodes(h("GCC"))) == {3, 4, 6}


def _nodes_or_empty(index, kmer):
    try:
        return set(np.asarray(index.get_nodes(kmer)).tolist())
    except Exception:
        return set()


def test_max_variant_nodes():
    graph = Graph.from_dicts(
        {1: "ACT", 2: "", 3: "GGG", 4: "", 5: "A", 6: "CCC"},
        {1: [2, 3], 2: [4, 5], 3: [4, 5], 4: [6], 5: [6]},
        [1, 5, 6])

    finder = DenseKmerFinder(graph, k=3, max_variant_nodes=0)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("CTA"))) == {1, 2, 5}
    assert set(index.get_nodes(h("TAC"))) == {1, 2, 5, 6}
    assert _nodes_or_empty(index, h("GGG")) == set()
    assert _nodes_or_empty(index, h("TCC")) == set()

    finder = DenseKmerFinder(graph, k=3, max_variant_nodes=1)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_nodes(h("TGG"))) == {1, 3}
    assert set(index.get_nodes(h("TCC"))) == {1, 2, 4, 6}
    assert _nodes_or_empty(index, h("GCC")) == set()
    assert _nodes_or_empty(index, h("GGC")) == set()
    assert set(index.get_nodes(h("GAC"))) == {3, 5, 6}


def test_snp_and_long_node():
    graph = Graph.from_dicts(
        {1: "ACTACTACTACT", 2: "G", 3: "C", 4: "GCAGCA"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_start_offsets(h("CTG"))) == {0}
    assert set(index.get_start_offsets(h("TAC"))) == {4, 7, 10}


def test_large_k():
    graph = Graph.from_dicts(
        {1: "G" * 100, 2: "C", 3: "T", 4: "G" * 10},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=31)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    offs = index.get_start_offsets(h("G" * 31))
    assert len(offs) > 0


def test_find_kmers_from_position():
    graph = Graph.from_dicts(
        {1: "ACTACT", 2: "G", 3: "C", 4: "GCAGCA"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    finder = DenseKmerFinder(graph, k=3, only_store_nodes={2, 3})
    finder.find_only_kmers_starting_at_position(1, 4)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert np.all(index.get_nodes(h("CTG")) == [2])
    assert np.all(index.get_nodes(h("CTC")) == [3])

    finder = DenseKmerFinder(graph, k=5, only_store_nodes={2, 3})
    finder.find_only_kmers_starting_at_position(1, 5)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert np.all(index.get_nodes(h("TGGCA")) == [2])
    assert np.all(index.get_nodes(h("TCGCA")) == [3])


def test_special_case():
    graph = Graph.from_dicts(
        {1: "taacccctaacccctaaccctaaccctaac",
         2: "", 3: "G", 4: "ccctaaccctaaccctaacccctaacccta"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 4])
    finder = DenseKmerFinder(graph, k=31, only_store_nodes={2, 3})
    finder.find_only_kmers_starting_at_position(1, 22)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    hash_ = h("accctaacccctaaccctaaccctaacccct")
    assert np.all(index.get_start_offsets(hash_) == [22])
    assert np.all(index.get_start_nodes(hash_) == [4])


def test_indel():
    graph = Graph.from_dicts(
        {1: "ACTGA", 2: "", 3: "C", 4: "GGGGGGGGG"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 4])
    finder = DenseKmerFinder(graph, k=9, only_store_nodes={2, 3})
    finder.find_only_kmers_starting_at_position(1, 2)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert np.all(index.get_nodes(h("TGAGGGGGG")) == [2])
    assert np.all(index.get_nodes(h("TGACGGGGG")) == [3])


def test_snp_and_indel():
    graph = Graph.from_dicts(
        {1: "ACTGAACTG", 2: "A", 3: "C", 4: "GGGG", 5: "", 6: "T",
         7: "CCCCCC"},
        {1: [3, 2], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7]},
        [1, 2, 4, 6, 7])
    finder = DenseKmerFinder(graph, k=13, only_store_nodes={5, 6},
                             max_variant_nodes=5)
    finder.find_only_kmers_starting_at_position(1, 6)
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert np.all(index.get_nodes(h("CTGAGGGGCCCCC")) == [5])
    assert np.all(index.get_nodes(h("CTGAGGGGTCCCC")) == [6])


def test_some_case():
    graph = Graph.from_dicts(
        {1: "AAAAAACTG", 2: "A", 3: "G", 4: "GC", 5: "T", 6: "C",
         7: "TGAGCCCCC", 8: "A", 9: "T", 10: "AAAAA"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7], 7: [8, 9],
         9: [10], 8: [10]},
        [1, 2, 4, 5, 7, 8, 10])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    index = KmerIndex2.from_flat_kmers(finder.get_flat_kmers())
    assert set(index.get_start_nodes(h("CTGAG"))) == {4, 7}


def test_case1_exact_row_order():
    """Pins the exact global (kmer, node) row sequence — the strongest
    ordering contract (reference tests/test_kmer_finder.py:412-476)."""
    graph = Graph.from_dicts(
        {0: "AGTAGA", 1: "G", 2: "CT", 3: "ACTA", 5: "G", 6: "A",
         7: "TCATA"},
        {0: [1, 2], 1: [3], 2: [3], 3: [5, 6], 5: [7], 6: [7], 7: []},
        [0, 1, 3, 5, 7])
    finder = DenseKmerFinder(graph, k=3)
    finder.find()
    kmers, nodes = finder.get_found_kmers_and_nodes()

    correct = [
        ["AGT", 0], ["GTA", 0], ["TAG", 0], ["AGA", 0],
        ["GAG", 0], ["GAG", 1],
        ["AGA", 0], ["AGA", 1], ["AGA", 3],
        ["GAC", 1], ["GAC", 3],
        ["GAC", 0], ["GAC", 2],
        ["ACT", 0], ["ACT", 2],
        ["CTA", 2], ["CTA", 3],
        ["TAC", 2], ["TAC", 3],
        ["ACT", 3], ["CTA", 3],
        ["TAG", 3], ["TAG", 5],
        ["AGT", 3], ["AGT", 5], ["AGT", 7],
        ["GTC", 5], ["GTC", 7],
        ["TAA", 3], ["TAA", 6],
        ["AAT", 3], ["AAT", 6], ["AAT", 7],
        ["ATC", 6], ["ATC", 7],
        ["TCA", 7], ["CAT", 7], ["ATA", 7],
    ]
    assert len(kmers) == len(correct)
    for i, (kmer, node) in enumerate(zip(kmers, nodes)):
        assert kmer_hash_to_sequence(int(kmer), 3).upper() == correct[i][0], \
            f"row {i}: {kmer_hash_to_sequence(int(kmer), 3).upper()} != {correct[i]}"
        assert node == correct[i][1], f"row {i}"


def test_device_hashing_path_matches_host():
    """Same graph enumerated with device (jax) hashing vs host numpy."""
    graph = Graph.from_dicts(
        {0: "AGTAGA", 1: "G", 2: "CT", 3: "ACTA", 5: "G", 6: "A",
         7: "TCATA"},
        {0: [1, 2], 1: [3], 2: [3], 3: [5, 6], 5: [7], 6: [7], 7: []},
        [0, 1, 3, 5, 7])
    f_host = DenseKmerFinder(graph, k=3, use_device=False)
    f_host.find()
    f_dev = DenseKmerFinder(graph, k=3, use_device=True)
    f_dev.find()
    k1, n1 = f_host.get_found_kmers_and_nodes()
    k2, n2 = f_dev.get_found_kmers_and_nodes()
    assert np.array_equal(k1, k2)
    assert np.array_equal(n1, n2)


def test_small_finalize_path_matches_vector_path():
    """The scalar finalize for tiny searches == the vectorized finalize,
    across modes and graphs."""
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph
    rng = np.random.default_rng(99)
    for trial in range(12):
        seed = int(rng.integers(0, 1 << 30))
        graph, v2n = random_snp_graph(400, 6, seed=seed,
                                      indel_fraction=0.4)
        for kwargs in ({}, {"only_save_one_node_per_kmer": True},
                       {"only_store_nodes": {int(v2n.var_nodes[1])}}):
            outs = []
            for path in ("small", "vector"):
                f = DenseKmerFinder(graph, k=5, max_variant_nodes=3,
                                    **kwargs)
                f.find_only_kmers_starting_at_position(1, 0)
                f._finalized = None
                f._finalize(force_path=path)
                fl = f.get_flat_kmers(v="1")
                outs.append((np.asarray(fl._hashes),
                             np.asarray(fl._nodes),
                             np.asarray(fl._ref_offsets),
                             np.asarray(fl._allele_frequencies),
                             f.kmers_found))
            for a, b in zip(*outs):
                if isinstance(a, list):
                    assert a == b
                else:
                    assert np.array_equal(a, b), (trial, kwargs)


def test_native_finalize_matches_vector_path():
    """The C++ row-expansion finalize == the python vector finalize."""
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph
    from graph_kmer_index_tpu import native
    assert native.available(), "native library must build for this test"
    rng = np.random.default_rng(31337)
    for trial in range(8):
        seed = int(rng.integers(0, 1 << 30))
        graph, v2n = random_snp_graph(3000, 40, seed=seed,
                                      indel_fraction=0.4)
        for kwargs in ({}, {"only_save_one_node_per_kmer": True},
                       {"only_store_nodes": set(
                           int(v) for v in v2n.var_nodes[:10])}):
            outs = []
            for path in ("native", "vector"):
                f = DenseKmerFinder(graph, k=7, max_variant_nodes=4,
                                    **kwargs)
                f.find()
                f._finalized = None
                f._finalize(force_path=path)
                fl = f.get_flat_kmers(v="1")
                outs.append((np.asarray(fl._hashes).astype(np.uint64),
                             np.asarray(fl._nodes),
                             np.asarray(fl._ref_offsets),
                             np.asarray(fl._allele_frequencies),
                             list(f.kmers_found)))
            for a, b in zip(*outs):
                if isinstance(a, list):
                    assert a == b, (trial, seed, kwargs)
                else:
                    assert np.array_equal(a, b), (trial, seed, kwargs)


def _load_reference():
    """The actual reference implementation, run in-process through
    benchmarks/reference_harness.py (obgraph/Bio/npstructures stubbed
    with API-compatible pieces of this package)."""
    import pathlib
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    return load_reference()


import os
import pytest


@pytest.mark.skipif(not os.path.exists("/root/reference"),
                    reason="reference checkout not available")
def test_case2_matches_reference_exactly():
    """Port of reference tests/test_kmer_finder.py:397-405 (a smoke test
    there), strengthened to full-row bit-equality against the actual
    reference implementation, at several k."""
    ref = _load_reference()
    seqs = {0: "AGTAGA", 1: "G", 2: "CT", 3: "A", 4: "CTA", 5: "G",
            6: "A", 7: "TCATA"}
    edges = {0: [1, 2], 1: [3], 2: [3], 3: [4], 4: [5, 6], 5: [7],
             6: [7], 7: []}
    linear = [0, 1, 3, 4, 5, 7]
    for k in (3, 4, 5):
        graph = Graph.from_dicts(seqs, edges, linear)
        ours = DenseKmerFinder(graph, k=k)
        ours.find()
        flat = ours.get_flat_kmers(v="1")
        graph2 = Graph.from_dicts(seqs, edges, linear)
        theirs = ref.DenseKmerFinder(graph2, k=k)
        theirs.find()
        rflat = theirs.get_flat_kmers(v="1")
        np.testing.assert_array_equal(np.asarray(flat._hashes),
                                      np.asarray(rflat._hashes), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(flat._nodes),
                                      np.asarray(rflat._nodes))
        np.testing.assert_array_equal(np.asarray(flat._ref_offsets),
                                      np.asarray(rflat._ref_offsets))


@pytest.mark.skipif(not os.path.exists("/root/reference"),
                    reason="reference checkout not available")
def test_hard_shapes_match_reference_exactly():
    """Full-row bit-equality vs the actual reference on the hard shapes:
    nested bubbles and adjacent dummy nodes, incl. k=31."""
    ref = _load_reference()
    shapes = [
        # nested bubble
        ({1: "ACTGACTGACTGACTGACTG", 2: "A", 3: "GTTG", 4: "C", 5: "T",
          6: "GG", 7: "CCCTACTGTTTAGTCAAAAA"},
         {1: [2, 3], 2: [6], 3: [4, 5], 4: [6], 5: [6], 6: [7]},
         [1, 2, 6, 7]),
        # adjacent dummies
        ({1: "ACTGACTGACTGACTGACTG", 2: "", 3: "A", 4: "TTTT", 5: "",
          6: "G", 7: "CCCTACTGTTTAGTCAAAAA"},
         {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7]},
         [1, 3, 4, 6, 7]),
    ]
    for seqs, edges, linear in shapes:
        for k in (5, 31):
            ours = DenseKmerFinder(Graph.from_dicts(seqs, edges, linear), k=k)
            ours.find()
            flat = ours.get_flat_kmers(v="1")
            theirs = ref.DenseKmerFinder(
                Graph.from_dicts(seqs, edges, linear), k=k)
            theirs.find()
            rflat = theirs.get_flat_kmers(v="1")
            np.testing.assert_array_equal(np.asarray(flat._hashes),
                                          np.asarray(rflat._hashes))
            np.testing.assert_array_equal(np.asarray(flat._nodes),
                                          np.asarray(rflat._nodes))
            np.testing.assert_array_equal(np.asarray(flat._ref_offsets),
                                          np.asarray(rflat._ref_offsets))


def test_kmers_found_assignment_semantics():
    """Reference plain-attribute semantics: an assigned value is returned
    as-is until the next find(); reads are cached (same list object);
    the modulo==0 native get path raises instead of SIGFPE-ing."""
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph
    graph, _ = random_snp_graph(2000, 20, seed=1)
    f = DenseKmerFinder(graph, k=7)
    f.find()
    first = f.kmers_found
    assert first and f.kmers_found is first  # cached, not rebuilt per read
    f.kmers_found = []
    assert f.kmers_found == []               # explicit value wins
    f.find()
    assert f.kmers_found                     # next find() resets it
