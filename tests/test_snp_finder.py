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


def test_sweep_matches_branch_walk_random_graphs():
    """The vectorized fast path must be bit-identical (rows AND order) to
    forcing every position through the branch walk."""
    rng = np.random.default_rng(7)
    for trial in range(30):
        # build a simple alternating ref/SNP-or-indel graph
        seqs, edges, linear = {}, {}, []
        nid = 1
        tail = None
        for seg in range(int(rng.integers(2, 10))):
            seqs[nid] = "".join(rng.choice(list("acgt"),
                                           size=int(rng.integers(1, 12))))
            linear.append(nid)
            if tail is not None:
                for t in tail:
                    edges.setdefault(t, []).append(nid)
            seg_node = nid
            nid += 1
            if rng.random() < 0.75 and seg < 8:
                ref_arm, var_arm = nid, nid + 1
                seqs[ref_arm] = str(rng.choice(list("acgt")))
                seqs[var_arm] = ("" if rng.random() < 0.3
                                 else str(rng.choice(list("acgt"))))
                edges[seg_node] = [ref_arm, var_arm]
                linear.append(ref_arm)
                tail = [ref_arm, var_arm]
                nid += 2
            else:
                tail = [seg_node]
        graph = Graph.from_dicts(seqs, edges, linear)
        for k, spacing in ((4, None), (6, 2), (3, 1)):
            kwargs = dict(k=k, spacing=spacing)
            if trial % 3 == 0:
                kwargs["include_reverse_complements"] = True
            if trial % 5 == 0:
                kwargs["max_frequency"] = 2
            if trial % 7 == 0:
                kwargs["pruning"] = True
            fast = SnpKmerFinder(graph, **kwargs)
            flat_fast = fast.find_kmers()
            slow = SnpKmerFinder(graph, **kwargs)
            flat_slow = slow.find_kmers(_force_branch_walk=True)
            np.testing.assert_array_equal(flat_fast._hashes,
                                          flat_slow._hashes)
            np.testing.assert_array_equal(flat_fast._nodes, flat_slow._nodes)
            np.testing.assert_array_equal(flat_fast._ref_offsets,
                                          flat_slow._ref_offsets)
            np.testing.assert_array_equal(flat_fast._allele_frequencies,
                                          flat_slow._allele_frequencies)
            assert fast.kmers_found == slow.kmers_found


def test_short_ref_with_revcomp_and_whitelist():
    """Linear reference shorter than k with rc/whitelist flags: the
    sweep's rev_hashes computation used to index an empty window-hash
    array (IndexError); all windows are branch-walked instead."""
    from graph_kmer_index_tpu import Graph, SnpKmerFinder
    g = Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "ATTTTTTTTTTTTTTTT", 4: "AT"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])  # ref len 7 < k
    # spacing < ref length puts positions in the sweep while the
    # window-hash array is EMPTY (ref shorter than k)
    flat = SnpKmerFinder(g, k=15, spacing=2).find_kmers()
    flat_rc = SnpKmerFinder(g, k=15, spacing=2,
                            include_reverse_complements=True).find_kmers()
    flat_wl = SnpKmerFinder(g, k=15, spacing=2, whitelist={0}).find_kmers()
    # the long variant arm yields kmers via the branch walk; the rc and
    # whitelist paths must not crash and must filter consistently
    assert len(flat._hashes) > 0
    assert len(flat_rc._hashes) == 2 * len(flat._hashes)
    assert len(flat_wl._hashes) <= len(flat._hashes)


def test_dense_finder_rejects_only_store_variant_nodes():
    from graph_kmer_index_tpu import DenseKmerFinder, Graph
    import pytest
    g = Graph.from_dicts({1: "ACTGAC"}, {}, [1])
    with pytest.raises(NotImplementedError):
        DenseKmerFinder(g, k=3, only_store_variant_nodes=True)


def test_sweep_flag_combinations_match_branch_walk():
    """Randomized non-default flag combinations: the vectorized sweep
    (batched fork-free emission) must be bit-identical to the forced
    branch walk — the stateful filters (frequency cap, per-position cap)
    and the flag gates must agree between the two paths."""
    from graph_kmer_index_tpu import Graph, SnpKmerFinder

    rng = np.random.default_rng(31)
    for trial in range(6):
        seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
        nodes, edges, ref = {}, {}, []
        nid = 1
        cursor = 0
        for pos in sorted(rng.choice(np.arange(20, 280), 5, replace=False)):
            seg = nid; nodes[nid] = seq[cursor:pos]; nid += 1
            a = nid; nodes[nid] = seq[pos]; nid += 1
            b = nid; nodes[nid] = "ACGT"[("ACGT".index(seq[pos]) + 1) % 4]
            nid += 1
            edges[seg] = [a, b]
            edges[a] = edges[b] = []
            ref += [seg, a]
            cursor = pos + 1
        tail = nid; nodes[nid] = seq[cursor:]
        ref.append(tail)
        # wire edges by walking the (segment, ref-allele) pairs: each
        # segment forks to its two allele nodes, both rejoin at the
        # next segment
        edges = {}
        for i in range(0, len(ref) - 2, 2):
            seg, a, nxt = ref[i], ref[i + 1], ref[i + 2]
            b = a + 1
            edges[seg] = [a, b]
            edges[a] = [nxt]
            edges[b] = [nxt]
        g = Graph.from_dicts(nodes, edges, ref)

        kwargs = dict(k=9, spacing=int(rng.integers(1, 4)))
        if trial % 2:
            kwargs["max_frequency"] = int(rng.integers(2, 5))
        if trial % 3 == 0:
            kwargs["include_reverse_complements"] = True
        if trial in (2, 5):
            kwargs["max_kmers_same_position"] = int(rng.integers(1, 3))
        a_ = SnpKmerFinder(g, **kwargs).find_kmers()
        b_ = SnpKmerFinder(g, **kwargs).find_kmers(_force_branch_walk=True)
        for attr in ("_hashes", "_nodes", "_ref_offsets",
                     "_allele_frequencies"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a_, attr)),
                np.asarray(getattr(b_, attr)),
                err_msg=f"trial {trial} {attr} kwargs={kwargs}")
