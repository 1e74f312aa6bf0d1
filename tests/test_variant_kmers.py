"""UniqueVariantKmersFinder end-to-end (mirrors reference
tests/test_variant_kmers.py:15-75): 10-node graph + 3 VCF variants; the
kmer CTGAG shared by both alleles of variant 1 must be excluded, and both
nodes of each variant must receive kmers."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    Graph, PositionId, VariantToNodes, VcfVariant, VcfVariants,
    DenseKmerFinder, KmerIndex, ReverseKmerIndex, UniqueVariantKmersFinder,
    sequence_to_kmer_hash)


@pytest.fixture
def k():
    return 5


@pytest.fixture
def graph():
    return Graph.from_dicts(
        {1: "AAAAAACTG", 2: "A", 3: "G", 4: "GC", 5: "T", 6: "C",
         7: "TGAGCCCCC", 8: "", 9: "TC", 10: "AAAAA"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7],
         7: [8, 9], 9: [10], 8: [10]},
        [1, 2, 4, 5, 7, 10])


@pytest.fixture
def variant_to_nodes():
    return VariantToNodes(np.array([2, 5, 8]), np.array([3, 6, 9]))


@pytest.fixture
def variants():
    return VcfVariants([
        VcfVariant(1, 10, "A", "G", vcf_line_number=0, type="SNP"),
        VcfVariant(1, 13, "T", "C", vcf_line_number=1, type="SNP"),
        VcfVariant(1, 22, "C", "CTC", vcf_line_number=2, type="INDEL"),
    ])


@pytest.fixture
def kmer_index_with_frequencies(graph, k):
    kmer_finder = DenseKmerFinder(graph, k)
    kmer_finder.find()
    flat_kmers = kmer_finder.get_flat_kmers(v="1")
    index = KmerIndex.from_flat_kmers(flat_kmers, modulo=4099)
    assert index.get_frequency(sequence_to_kmer_hash("CTGAG"), k=k) == 2
    return index


@pytest.fixture
def kmer_finder(graph, variant_to_nodes, variants, k,
                kmer_index_with_frequencies):
    return UniqueVariantKmersFinder(
        graph, variant_to_nodes, variants, k=k,
        kmer_index_with_frequencies=kmer_index_with_frequencies,
        use_dense_kmer_finder=True,
        position_id_index=PositionId.from_graph(graph))


def test_kmers_from_position(kmer_finder):
    kmers_found = kmer_finder.find_unique_kmers()
    index = KmerIndex.from_flat_kmers(kmers_found, modulo=4099)
    nodes = index.get_nodes(sequence_to_kmer_hash("CTGAG"))
    assert nodes is None, "CTGAG should not be in index"
    reverse_index = ReverseKmerIndex.from_flat_kmers(kmers_found)
    assert len(reverse_index.get_node_kmers(2)) > 0
    assert len(reverse_index.get_node_kmers(3)) > 0


def test_simple_mode(graph, variant_to_nodes, variants, k,
                     kmer_index_with_frequencies):
    finder = UniqueVariantKmersFinder(
        graph, variant_to_nodes, variants, k=k,
        kmer_index_with_frequencies=kmer_index_with_frequencies,
        use_dense_kmer_finder=True,
        position_id_index=PositionId.from_graph(graph),
        use_simple=True)
    flat = finder.find_unique_kmers()
    # every variant node must receive kmers in simple mode
    for node in (2, 3, 5, 6):
        assert node in set(np.asarray(flat._nodes).tolist())


def _random_vcf_case(rng, n_bases=700, clustered=False):
    from graph_kmer_index_tpu.variants import VcfVariant, VcfVariants
    ref = "".join(rng.choice(list("ACGT"), size=n_bases))
    variants = []
    pos = 40
    n = 0
    while pos < n_bases - 60:
        refb = ref[pos - 1]
        r = rng.random()
        if r < 0.55:
            alt = str(rng.choice([b for b in "ACGT" if b != refb]))
            v = VcfVariant("1", pos, refb, alt, vcf_line_number=n)
        elif r < 0.78:
            ins = "".join(rng.choice(list("ACGT"),
                                     size=int(rng.integers(1, 4))))
            v = VcfVariant("1", pos, refb, refb + ins, vcf_line_number=n)
        else:
            dl = int(rng.integers(1, 4))
            v = VcfVariant("1", pos, ref[pos - 1:pos + dl], refb,
                           vcf_line_number=n)
        variants.append(v)
        n += 1
        step = int(rng.integers(4, 25)) if clustered \
            else int(rng.integers(18, 70))
        pos += step
    return ref, VcfVariants(variants)


def test_batched_signatures_match_per_variant_path():
    """find_unique_kmers_batched must be bit-identical to the per-variant
    find_unique_kmers (SnpKmerFinder mode) on random VCFs — isolated
    bubbles take the vectorized path, clusters/edges the fallback."""
    from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf
    from graph_kmer_index_tpu import SnpKmerFinder
    rng = np.random.default_rng(11)
    kk = 15
    n_vectorized = 0
    for trial in range(8):
        ref, variants = _random_vcf_case(rng, clustered=trial % 2 == 1)
        graph, v2n = build_graph_from_vcf({"1": ref}, variants)
        base_flat = SnpKmerFinder(graph, k=kk).find_kmers()
        freq_index = KmerIndex.from_flat_kmers(base_flat, modulo=4099)

        def make(finder_cls=UniqueVariantKmersFinder):
            return finder_cls(graph, v2n, variants, k=kk,
                              kmer_index_with_frequencies=freq_index)

        a = make()
        flat_a = a.find_unique_kmers()
        b = make()
        flat_b = b.find_unique_kmers_batched()
        n_eligible = int(np.count_nonzero(
            b._batched_geometry(list(variants))["eligible"]))
        n_vectorized += n_eligible
        # routing counters account for every variant and match geometry
        assert b.n_batched_variants == n_eligible
        assert (b.n_batched_variants + b.n_fallback_variants
                + b.n_zero_node_variants) == len(list(variants))
        for attr in ("_hashes", "_nodes", "_ref_offsets",
                     "_allele_frequencies"):
            np.testing.assert_array_equal(
                np.asarray(getattr(flat_a, attr)),
                np.asarray(getattr(flat_b, attr)), err_msg=attr)
        assert a.n_failed_variants == b.n_failed_variants
        assert a._nodes_found == b._nodes_found
    assert n_vectorized > 20, "vectorized path barely exercised"


def test_multi_chromosome_variant_signatures():
    """Signatures resolve on the right chromosome: the old chromosome
    conversion indexed start nodes 0-based with the raw VCF chromosome
    number, so every chr-2 variant searched chr 1's offsets."""
    from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf
    from graph_kmer_index_tpu import SnpKmerFinder

    rng = np.random.default_rng(23)
    refs = {}
    all_variants = []
    n = 0
    for chrom in ("1", "2"):
        seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
        refs[chrom] = seq
        for pos in (100, 250):
            ref_b = seq[pos - 1]
            alt_b = "ACGT"[("ACGT".index(ref_b) + 1) % 4]
            all_variants.append(VcfVariant(chrom, pos, ref_b, alt_b,
                                           vcf_line_number=n))
            n += 1
    variants = VcfVariants(all_variants)
    graph, v2n = build_graph_from_vcf(refs, variants)
    kk = 15
    base_flat = SnpKmerFinder(graph, k=kk).find_kmers()
    freq_index = KmerIndex.from_flat_kmers(base_flat, modulo=4099)

    finder = UniqueVariantKmersFinder(graph, v2n, variants, k=kk,
                                      kmer_index_with_frequencies=freq_index)
    flat = finder.find_unique_kmers()
    assert finder.n_failed_variants == 0
    # every variant's ref AND alt node received signature kmers,
    # including both chr-2 variants
    got_nodes = set(np.asarray(flat._nodes).tolist())
    for i in range(n):
        assert int(v2n.ref_nodes[i]) in got_nodes, f"variant {i} ref"
        assert int(v2n.var_nodes[i]) in got_nodes, f"variant {i} alt"
    # batched path agrees
    finder_b = UniqueVariantKmersFinder(
        graph, v2n, variants, k=kk, kmer_index_with_frequencies=freq_index)
    flat_b = finder_b.find_unique_kmers_batched()
    np.testing.assert_array_equal(np.asarray(flat._hashes),
                                  np.asarray(flat_b._hashes))
    np.testing.assert_array_equal(np.asarray(flat._nodes),
                                  np.asarray(flat_b._nodes))


def test_batched_fallback_counter_and_warning_on_dense_bubbles():
    """A dense-variant VCF (every variant within k of its neighbors)
    must route mostly through the exact per-variant fallback, stay
    bit-identical to the per-variant path, count the degradation in
    n_fallback_variants, and say so loudly in the summary log
    (SURVEY §5.5 "no silent caps")."""
    import logging
    from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf
    from graph_kmer_index_tpu import SnpKmerFinder

    rng = np.random.default_rng(31)
    kk = 15
    n_v = 120
    seq = list(rng.choice(list("ACGT"), size=40 + n_v * 6))
    variants = []
    pos = 20
    for i in range(n_v):  # spacing 5-7 << k: nothing is isolated
        refb = seq[pos - 1]
        alt = str(rng.choice([b for b in "ACGT" if b != refb]))
        variants.append(VcfVariant("1", pos, refb, alt, vcf_line_number=i))
        pos += int(rng.integers(5, 8))
    variants = VcfVariants(variants)
    graph, v2n = build_graph_from_vcf({"1": "".join(seq)}, variants)
    base_flat = SnpKmerFinder(graph, k=kk).find_kmers()
    freq_index = KmerIndex.from_flat_kmers(base_flat, modulo=4099)

    def make():
        return UniqueVariantKmersFinder(
            graph, v2n, variants, k=kk,
            kmer_index_with_frequencies=freq_index)

    a = make()
    flat_a = a.find_unique_kmers()
    b = make()
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    handler = Capture()
    logging.getLogger().addHandler(handler)
    try:
        flat_b = b.find_unique_kmers_batched()
    finally:
        logging.getLogger().removeHandler(handler)

    for attr in ("_hashes", "_nodes", "_ref_offsets",
                 "_allele_frequencies"):
        np.testing.assert_array_equal(
            np.asarray(getattr(flat_a, attr)),
            np.asarray(getattr(flat_b, attr)), err_msg=attr)
    routed = b.n_batched_variants + b.n_fallback_variants
    assert routed + b.n_zero_node_variants == n_v
    assert b.n_fallback_variants > routed // 2, (
        b.n_batched_variants, b.n_fallback_variants)
    warned = [r for r in records if r.levelno >= logging.WARNING
              and "degraded" in r.getMessage()]
    assert warned, "expected a degraded-selection warning"
