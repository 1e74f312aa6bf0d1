"""Differential tests: native C++ span walker == Python walker, bit
exact, on random SNP and indel graphs."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import DenseKmerFinder, native
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _flat_tuple(graph, k, use_native, **kwargs):
    finder = DenseKmerFinder(graph, k=k, **kwargs)
    finder.find(use_native=use_native)
    flat = finder.get_flat_kmers(v="1")
    return (np.asarray(flat._hashes), np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets),
            np.asarray(flat._allele_frequencies))


@pytest.mark.parametrize("seed,indel_fraction,k", [
    (0, 0.0, 7), (1, 0.0, 31), (2, 0.3, 7), (3, 0.5, 15), (4, 1.0, 5),
])
def test_native_walker_matches_python(seed, indel_fraction, k):
    graph, _ = random_snp_graph(4000, 60, seed=seed,
                                indel_fraction=indel_fraction)
    py = _flat_tuple(graph, k, use_native=False)
    cc = _flat_tuple(graph, k, use_native=True)
    for a, b, name in zip(py, cc, ("hashes", "nodes", "ref_offsets", "af")):
        assert np.array_equal(a, b), name


def test_native_walker_max_variant_nodes():
    graph, _ = random_snp_graph(2000, 40, seed=9)
    py = _flat_tuple(graph, 9, use_native=False, max_variant_nodes=1)
    cc = _flat_tuple(graph, 9, use_native=True, max_variant_nodes=1)
    for a, b in zip(py, cc):
        assert np.array_equal(a, b)


def test_native_walker_chunked_sharding():
    """start/stop_at_critical_path_number sharding equality."""
    graph, _ = random_snp_graph(2000, 30, seed=5)
    py = _flat_tuple(graph, 7, use_native=False,
                     start_at_critical_path_number=3,
                     stop_at_critical_path_number=9)
    cc = _flat_tuple(graph, 7, use_native=True,
                     start_at_critical_path_number=3,
                     stop_at_critical_path_number=9)
    for a, b in zip(py, cc):
        assert np.array_equal(a, b)


def test_native_walker_only_save_one_and_store_filters():
    graph, _ = random_snp_graph(1500, 20, seed=6)
    some_nodes = set(range(1, graph.n_nodes(), 3))
    py = _flat_tuple(graph, 7, use_native=False,
                     only_save_one_node_per_kmer=True,
                     only_store_nodes=some_nodes)
    cc = _flat_tuple(graph, 7, use_native=True,
                     only_save_one_node_per_kmer=True,
                     only_store_nodes=some_nodes)
    for a, b in zip(py, cc):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("seed,k", [(0, 5), (1, 7)])
def test_native_early_stop_matches_python(seed, k):
    """find_only_kmers_starting_at_position: native == python."""
    graph, v2n = random_snp_graph(2000, 40, seed=seed, indel_fraction=0.3)
    for ref_node in v2n.ref_nodes[:10]:
        node = max(1, int(ref_node) - 2)
        offset = 0
        outs = []
        for use_native in (False, True):
            finder = DenseKmerFinder(graph, k=k, max_variant_nodes=4,
                                     only_store_nodes={int(ref_node)})
            finder.find_only_kmers_starting_at_position(
                node, offset, use_native=use_native)
            flat = finder.get_flat_kmers(v="1")
            outs.append((np.asarray(flat._hashes), np.asarray(flat._nodes),
                         np.asarray(flat._ref_offsets)))
        for a, b in zip(*outs):
            assert np.array_equal(a, b)
        # kmers_found debug structure equality too
        f_py = DenseKmerFinder(graph, k=k)
        f_py.find_only_kmers_starting_at_position(node, offset,
                                                  use_native=False)
        f_cc = DenseKmerFinder(graph, k=k)
        f_cc.find_only_kmers_starting_at_position(node, offset,
                                                  use_native=True)
        assert f_py.kmers_found == f_cc.kmers_found


def test_native_walker_fuzz():
    """Broad randomized differential sweep: many seeds, k values, variant
    caps, indel fractions."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([3, 5, 9, 15, 21, 31]))
        mvn = int(rng.choice([1, 2, 4, 8]))
        indel = float(rng.choice([0.0, 0.2, 0.7]))
        graph, _ = random_snp_graph(1500, 25, seed=seed,
                                    indel_fraction=indel)
        py = _flat_tuple(graph, k, use_native=False, max_variant_nodes=mvn)
        cc = _flat_tuple(graph, k, use_native=True, max_variant_nodes=mvn)
        for a, b, name in zip(py, cc, ("hashes", "nodes", "offsets", "af")):
            assert np.array_equal(a, b), (trial, seed, k, mvn, indel, name)


def test_native_only_follow_nodes():
    """only_follow_nodes restriction: native == python (the
    find_kmers_over_variant_node mode, unique_variant_kmers.py:87-95)."""
    graph, v2n = random_snp_graph(2000, 30, seed=8)
    for i in range(5):
        target = int(v2n.var_nodes[i])
        start = max(1, target - 3)
        outs = []
        for use_native in (False, True):
            finder = DenseKmerFinder(graph, k=7, max_variant_nodes=4,
                                     only_store_nodes={target},
                                     only_follow_nodes={target})
            finder.find_only_kmers_starting_at_position(
                start, 0, use_native=use_native)
            flat = finder.get_flat_kmers(v="1")
            outs.append((np.asarray(flat._hashes), np.asarray(flat._nodes),
                         np.asarray(flat._ref_offsets)))
        for a, b in zip(*outs):
            assert np.array_equal(a, b), (i, target)


@pytest.mark.parametrize("start,stop", [
    (None, 0),      # stop at the very first critical path
    (None, 1),
    (0, None),      # explicit 0 == None for the slicing, but adds (first,0)
    (10**9, None),  # start beyond the path count -> empty worklist
    (None, 10**9),  # stop beyond the path count -> no stop node
])
def test_worklist_boundary_configs(start, stop):
    """Vectorized worklist construction == python tuple construction at
    the slicing edge cases (start/stop at 0, beyond the path count)."""
    graph, _ = random_snp_graph(3000, 50, seed=11, indel_fraction=0.2)
    kwargs = {}
    if start is not None:
        kwargs["start_at_critical_path_number"] = start
    if stop is not None:
        kwargs["stop_at_critical_path_number"] = stop
    py = _flat_tuple(graph, 9, use_native=False, **kwargs)
    cc = _flat_tuple(graph, 9, use_native=True, **kwargs)
    for a, b, name in zip(py, cc, ("hashes", "nodes", "ref_offsets", "af")):
        assert np.array_equal(a, b), name


def test_chunked_union_covers_full_find():
    """Disjoint (start, stop) chunks reproduce the unchunked find's rows
    exactly (concatenated in chunk order) — pins the vectorized slice
    arithmetic against off-by-one drift."""
    from graph_kmer_index_tpu.critical_paths import CriticalGraphPaths
    graph, _ = random_snp_graph(5000, 80, seed=12, indel_fraction=0.3)
    cp = CriticalGraphPaths.from_graph(graph, 9)
    full = _flat_tuple(graph, 9, use_native=True, critical_graph_paths=cp)
    parts = []
    for s in range(0, len(cp) + 3, 7):  # ragged chunking past the end
        parts.append(_flat_tuple(
            graph, 9, use_native=True, critical_graph_paths=cp,
            start_at_critical_path_number=s,
            stop_at_critical_path_number=min(len(cp) + 3, s + 7)))
    for i, name in enumerate(("hashes", "nodes", "ref_offsets", "af")):
        got = np.concatenate([p[i] for p in parts])
        assert np.array_equal(got, full[i]), name


def test_negative_start_number_means_full_worklist():
    """The reference's tuple slicing only fired for start > 0; a negative
    value silently meant 'full worklist'. The vectorized construction
    must preserve that (it crashed with a broadcast error once)."""
    graph, _ = random_snp_graph(2000, 30, seed=13)
    full = _flat_tuple(graph, 9, use_native=True)
    neg = _flat_tuple(graph, 9, use_native=True,
                      start_at_critical_path_number=-1)
    for a, b, name in zip(full, neg, ("hashes", "nodes", "ref_offsets", "af")):
        assert np.array_equal(a, b), name
