"""SnpKmerFinder tests — port of reference tests/test_snp_kmer_finder.py."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    Graph, SnpKmerFinder, KmerIndex, sequence_to_kmer_hash)


def test_simple_snp_graph():
    graph = Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "G", 4: "AAAT"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    kmer_finder = SnpKmerFinder(graph, k=3)
    kmer_finder.find_kmers()
    assert kmer_finder.has_kmer("ACT", {1})
    assert kmer_finder.has_kmer("GAA", {1, 2, 4})
    assert kmer_finder.has_kmer("GGA", {1, 3, 4})
    assert kmer_finder.has_kmer("AAT", {4})


def test_indel_graph():
    graph = Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "", 4: "TAAT"},
        {1: [2, 3], 2: [4], 3: [4]},
        [1, 2, 4])
    kmer_finder = SnpKmerFinder(graph, k=3)
    flat_kmers = kmer_finder.find_kmers()
    index = KmerIndex.from_flat_kmers(flat_kmers, modulo=1021)
    hits = index.get(sequence_to_kmer_hash("GTA"))
    assert sorted(hits[0].tolist()) == [1, 3, 4]
    hits = index.get(sequence_to_kmer_hash("GAT"))
    assert sorted(hits[0].tolist()) == [1, 2, 4]


def test_long_nodes_k31():
    graph = Graph.from_dicts(
        {1: "gggggaggcttgtggttagcagagagtgggtggaagacagaggtttgag",
         2: "ga",
         3: "gagagagacccaggggagaaaaccagctgcagaggcaggaggggtccag"
            "ggcagcccgaggccagagatgggcgtcttccttacagccacctgtggtccc",
         100: ""},
        {1: [2, 100], 2: [3], 100: [3]},
        [1, 2, 3])
    kmer_finder = SnpKmerFinder(graph, k=31)
    flat = kmer_finder.find_kmers()
    assert len(flat._hashes) > 0
