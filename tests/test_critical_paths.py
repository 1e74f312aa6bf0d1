"""Critical path positions (mirrors reference tests/test_critical_graph_paths.py)."""
import numpy as np

from graph_kmer_index_tpu import Graph, CriticalGraphPaths, DenseKmerFinder


def test_basic():
    graph = Graph.from_dicts(
        {0: "AAA", 1: "C", 2: "T", 3: "AAA"},
        {0: [1, 2], 2: [3], 1: [3]},
        [0, 1, 3])
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [0, 3])
    assert np.all(c.offsets == [2, 2])
    c = CriticalGraphPaths.from_graph(graph, 4)
    assert len(c.nodes) == 0


def test_long_nodes():
    graph = Graph.from_dicts(
        {0: "AAACCCTTTT", 1: "CTTT", 2: "TAAGGGG", 3: "AAA"},
        {0: [1, 2], 2: [3], 1: [3]},
        [0, 1, 3])
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [0, 3])
    assert np.all(c.offsets == [2, 2])


def test_two_bubbles():
    graph = Graph.from_dicts(
        {0: "ACTGACTG", 1: "A", 2: "T", 3: "AAAAA", 4: "C", 5: "T", 6: "TGGGGG"},
        {0: [1, 2], 2: [3], 1: [3], 3: [4, 5], 4: [6], 5: [6]},
        [0, 1, 3, 4, 6])
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [0, 3, 6])
    assert np.all(c.offsets == [2, 2, 2])


def test_short_nodes_and_dummy():
    graph = Graph.from_dicts(
        {0: "A", 1: "CTTT", 2: "TAAGGGG", 3: "AA", 4: ""},
        {0: [1], 1: [2, 4], 2: [3], 4: [3]},
        [0, 1, 2, 3])
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [1])
    assert np.all(c.offsets == [1])


def test_variant_dummy_node():
    graph = Graph.from_dicts(
        {0: "ACTGACTG", 1: "A", 2: "T", 3: "AAAAA", 4: "C", 5: "T",
         6: "TGGGGG", 100: ""},
        {0: [1, 2, 100], 2: [3], 1: [3], 3: [4, 5], 4: [6], 5: [6], 100: [6]},
        [0, 1, 3, 4, 6])
    graph.make_linear_ref_node_and_ref_dummy_node_index()
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [0, 6])
    assert np.all(c.offsets == [2, 2])


def test_linear_with_ref_dummy():
    graph = Graph.from_dicts(
        {1: "AAAAA", 2: "", 3: "CCCCCC"},
        {1: [2], 2: [3]},
        [1, 3])
    graph.make_linear_ref_node_and_ref_dummy_node_index()
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert np.all(c.nodes == [1])
    assert np.all(c.offsets == [2])


def test_is_critical_and_roundtrip(tmp_path):
    graph = Graph.from_dicts(
        {0: "AAA", 1: "C", 2: "T", 3: "AAA"},
        {0: [1, 2], 2: [3], 1: [3]},
        [0, 1, 3])
    c = CriticalGraphPaths.from_graph(graph, 3)
    assert c.is_critical(0, 2)
    assert not c.is_critical(0, 1)
    assert not c.is_critical(1, 0)
    assert not c.is_critical(99, 0)
    f = str(tmp_path / "cgp")
    c.to_file(f)
    c2 = CriticalGraphPaths.from_file(f)
    assert np.all(c2.nodes == c.nodes) and np.all(c2.offsets == c.offsets)


def test_bp_exactly_k_no_bogus_offset():
    """bp_since_last_join == k must not emit an offset of -1 (the
    reference wraps it to 65535 in uint16, critical_graph_paths.py:78);
    the true cut point was already emitted on the previous node."""
    graph = Graph.from_dicts(
        {1: "AA", 2: "A", 3: "C", 4: "AAAA", 5: "GGG"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5]},
        [1, 2, 4, 5])
    cgp = CriticalGraphPaths.from_graph(graph, 4)
    assert list(cgp) == [(4, 3)]
    # and the finder runs cleanly over it
    f = DenseKmerFinder(graph, k=4)
    f.find()
    assert len(f.get_flat_kmers(v="1")._hashes) > 0
