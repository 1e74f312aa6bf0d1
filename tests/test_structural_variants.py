"""Structural-variant kmer sampling (mirrors reference
tests/test_structural_variants.py, including its DummyGraph/DummyKmerIndex
mock pattern)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    KmerIndex, VariantToNodes, letter_sequence_to_numeric,
    sequence_to_kmer_hash, sample_kmers_from_structural_variants)


class DummyGraph:
    def __init__(self, node_sequences):
        self.node_sequences = node_sequences

    def get_numeric_node_sequence(self, node):
        return letter_sequence_to_numeric(self.node_sequences[node])

    def get_node_size(self, node):
        return len(self.node_sequences[node])


class DummyKmerIndex:
    def get_frequency(self, kmer):
        return 1

    def get_frequencies(self, kmers):
        return np.ones(len(kmers), dtype=np.int64)


def test_sample_kmers_from_structural_variants():
    graph = DummyGraph({
        1: "AAAAAAAAAAA",
        2: "ACTG",
        3: "GGGGAAAACCCCAAAA",
        4: "AGGGG",
    })
    variant_to_nodes = VariantToNodes(np.array([1, 3]), np.array([2, 4]))
    kmers = sample_kmers_from_structural_variants(
        graph, variant_to_nodes, DummyKmerIndex(), k=5)
    index = KmerIndex.from_flat_kmers(kmers, modulo=4099)
    assert np.all(index.get_nodes(sequence_to_kmer_hash("AAAAA")) == [1])
    assert np.all(index.get_nodes(sequence_to_kmer_hash("GGGGA")) == [3])
    assert np.all(index.get_nodes(sequence_to_kmer_hash("AAACC")) == [3])


def test_reference_differential_structural_variants():
    """Our sampler vs the reference's own algorithm (run in-process with
    our window-hash kernel backing its bionumpy call): identical rows on
    randomized long-node variants and frequency tables."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()
    import importlib
    ref_sv = importlib.import_module("graph_kmer_index.structural_variants")

    rng = np.random.default_rng(5)

    class FreqIndex:
        def __init__(self, table):
            self.table = table

        def get_frequency(self, kmer):
            return self.table.get(int(kmer), 0)

        def get_frequencies(self, kmers):
            return np.array([self.table.get(int(h), 0) for h in kmers])

    for trial in range(5):
        seqs = {}
        n_nodes = int(rng.integers(4, 10)) * 2
        for node in range(1, n_nodes + 1):
            ln = int(rng.integers(3, 60))
            seqs[node] = "".join(rng.choice(list("ACGT"), size=ln))
        graph = DummyGraph(seqs)
        v2n = VariantToNodes(np.arange(1, n_nodes + 1, 2),
                             np.arange(2, n_nodes + 1, 2))
        k = int(rng.choice([4, 7]))
        # random frequency table over the kmers that occur
        from graph_kmer_index_tpu.hashing import sliding_window_hashes
        from graph_kmer_index_tpu import letter_sequence_to_numeric
        table = {}
        for s in seqs.values():
            if len(s) >= k:
                for h in sliding_window_hashes(
                        letter_sequence_to_numeric(s).astype(np.uint64), k):
                    table[int(h)] = int(rng.integers(0, 4))
        fi = FreqIndex(table)
        ours = sample_kmers_from_structural_variants(graph, v2n, fi, k,
                                                     max_frequency=2)
        theirs = ref_sv.sample_kmers_from_structural_variants(
            graph, v2n, fi, k, max_frequency=2)
        for attr in ("_hashes", "_nodes", "_ref_offsets"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ours, attr)).astype(np.int64),
                np.asarray(getattr(theirs, attr)).astype(np.int64),
                err_msg=f"trial {trial} {attr}")
