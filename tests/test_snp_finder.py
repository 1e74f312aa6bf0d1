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


def _graph():
    return Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "G", 4: "AAATCCGG"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])


def test_whitelist_filters_kmers():
    from graph_kmer_index_tpu import sequence_to_kmer_hash as h
    wl = {h("ACT"), h("GAA")}
    finder = SnpKmerFinder(_graph(), k=3, whitelist=wl)
    flat = finder.find_kmers()
    got = set(int(x) for x in flat._hashes)
    # only whitelisted kmers (or their revcomps) survive
    from graph_kmer_index_tpu.hashing import (
        kmer_hash_to_reverse_complement_hash)
    for g in got:
        assert g in wl or kmer_hash_to_reverse_complement_hash(g, 3) in wl


def test_skip_kmers_with_nodes():
    finder = SnpKmerFinder(_graph(), k=3, skip_kmers_with_nodes={3})
    flat = finder.find_kmers()
    assert 3 not in set(int(n) for n in flat._nodes)


def test_max_frequency_caps_repeats():
    finder = SnpKmerFinder(_graph(), k=3, max_frequency=1)
    flat = finder.find_kmers()
    # no hash may be added twice (frequency check uses >=)
    hashes = [int(x) for x in flat._hashes]
    from collections import Counter as C
    # frequency counts occurrences, not rows: count unique
    # (hash, ref_offset) pairs per hash
    pairs = set(zip(hashes, [int(r) for r in flat._ref_offsets]))
    per_hash = C(h for h, r in pairs)
    assert max(per_hash.values()) <= 1


def test_only_save_one_node_per_kmer_and_include_revcomp():
    from graph_kmer_index_tpu.hashing import (
        kmer_hash_to_reverse_complement_hash)
    finder = SnpKmerFinder(_graph(), k=3, include_reverse_complements=True,
                           only_save_one_node_per_kmer=True)
    flat = finder.find_kmers()
    hashes = [int(x) for x in flat._hashes]
    # rows come in (hash, revcomp) pairs
    assert len(hashes) % 2 == 0
    for i in range(0, len(hashes), 2):
        assert hashes[i + 1] == kmer_hash_to_reverse_complement_hash(
            hashes[i], 3)


def test_only_add_variant_kmers():
    finder = SnpKmerFinder(_graph(), k=3, only_add_variant_kmers=True)
    flat = finder.find_kmers()
    # every surviving occurrence must touch a variant path
    assert len(flat._hashes) > 0
    for kf in finder.kmers_found:
        assert any(n in (2, 3) for n in kf[1]), kf


def test_pruning_skips_nearby_novel_ref_kmers():
    """pruning drops NOVEL linear-ref kmers within 124 bp of the last
    added position; previously-added kmers always pass (reference
    snp_kmer_finder.py:145-149 checks ``hash not in unique_kmers_added``)."""
    import numpy as _np
    rng = _np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=400))
    graph = Graph.from_dicts({1: seq}, {}, [1])
    plain = SnpKmerFinder(graph, k=6).find_kmers()
    pruned = SnpKmerFinder(graph, k=6, pruning=True).find_kmers()
    # ~one kmer per 124 bp survives instead of one per position
    assert len(pruned._hashes) < len(plain._hashes) / 10
