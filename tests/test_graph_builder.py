"""Graph construction from FASTA + VCF (replaces external obgraph)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    DenseKmerFinder, KmerIndex, VcfVariant, VcfVariants,
    sequence_to_kmer_hash)
from graph_kmer_index_tpu.graph_builder import (
    build_graph_from_vcf, build_graph_from_files)


def test_snp_graph():
    #            0123456789
    ref = {"1": "ACTGAAATGC"}
    variants = VcfVariants([VcfVariant("1", 5, "A", "G", vcf_line_number=0)])
    graph, v2n = build_graph_from_vcf(ref, variants)
    ref_node, var_node = int(v2n.ref_nodes[0]), int(v2n.var_nodes[0])
    assert graph.get_node_sequence(ref_node) == "a"
    assert graph.get_node_sequence(var_node) == "g"
    assert graph.linear_ref_length() == 10

    finder = DenseKmerFinder(graph, k=4)
    finder.find()
    idx = KmerIndex.from_flat_kmers(finder.get_flat_kmers(v="0"),
                                    modulo=1021)
    # ref path kmer across the SNP (G A A A at positions 3-6)
    assert idx.get(sequence_to_kmer_hash("GAAA"))[0] is not None
    # alt path kmer (G g A A with the alt allele at position 4)
    assert idx.get(sequence_to_kmer_hash("GGAA"))[0] is not None
    assert var_node in idx.get(sequence_to_kmer_hash("GGAA"))[0]


def test_insertion_and_deletion():
    ref = {"1": "ACTGAAATGC"}
    variants = VcfVariants([
        VcfVariant("1", 4, "G", "GTT", vcf_line_number=0),   # insertion
        VcfVariant("1", 7, "AT", "A", vcf_line_number=1),    # deletion
    ])
    graph, v2n = build_graph_from_vcf(ref, variants)
    ins_ref, ins_alt = int(v2n.ref_nodes[0]), int(v2n.var_nodes[0])
    del_ref, del_alt = int(v2n.ref_nodes[1]), int(v2n.var_nodes[1])
    assert graph.get_node_size(ins_ref) == 0          # empty ref dummy
    assert graph.get_node_sequence(ins_alt) == "tt"
    assert graph.get_node_sequence(del_ref) == "t"    # deleted base
    assert graph.get_node_size(del_alt) == 0
    assert graph.linear_ref_length() == 10


def test_ref_mismatch_skipped(caplog):
    ref = {"1": "ACTG"}
    variants = VcfVariants([VcfVariant("1", 2, "G", "T", vcf_line_number=0)])
    graph, v2n = build_graph_from_vcf(ref, variants)
    assert v2n.ref_nodes[0] == 0 and v2n.var_nodes[0] == 0
    assert graph.linear_ref_length() == 4


def test_from_files(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">1\nACTGAAATGC\n>2\nTTTTCCCC\n")
    vcf = tmp_path / "v.vcf"
    vcf.write_text("##x\n#CHROM\tPOS\tID\tREF\tALT\n"
                   "1\t5\t.\tA\tG\n2\t3\t.\tT\tA\n")
    graph, v2n = build_graph_from_files(str(fa), str(vcf))
    assert len(graph.chromosome_start_nodes_array) == 2
    assert len(v2n) == 2
    assert graph.linear_ref_length() == 18


def test_multiallelic_vcf_records_split(tmp_path):
    """ALT 'G,T' must become two bi-allelic variants; symbolic ALTs are
    skipped with a warning (ADVICE r1 — previously the literal ',' was
    2-bit encoded into an allele node)."""
    from graph_kmer_index_tpu.variants import VcfVariants
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t3\t.\tA\tG,T\t.\t.\t.\n"
        "1\t7\t.\tC\t<DEL>\t.\t.\t.\n"
        "1\t9\t.\tT\tA\t.\t.\t.\n")
    variants = VcfVariants.from_vcf(str(vcf))
    assert [(v.position, v.ref_sequence, v.variant_sequence, v.type)
            for v in variants] == [
        (3, "A", "G", "SNP"), (3, "A", "T", "SNP"), (9, "T", "A", "SNP")]
    assert [v.vcf_line_number for v in variants] == [0, 1, 2]


def test_multiallelic_sites_share_one_bubble():
    """Randomized property check of the multi-allelic encoding: all
    alleles of one site share a segment + ref node (one bubble, the
    obgraph merge topology), every allele node carries its ALT bases,
    and the linear reference reconstructs exactly."""
    import numpy as np
    from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf
    from graph_kmer_index_tpu.variants import VcfVariant, VcfVariants

    rng = np.random.default_rng(99)
    for trial in range(20):
        n = 400
        seq = "".join(rng.choice(list("ACGT"), n))
        variants, line = [], 0
        pos = 10
        while pos < n - 10:
            ref = seq[pos - 1]
            n_alts = int(rng.integers(1, 4))  # up to tri-allelic +1
            alts = list(rng.permutation([b for b in "ACGT" if b != ref]))
            for alt in alts[:n_alts]:
                variants.append(VcfVariant("1", pos, ref, str(alt),
                                           vcf_line_number=line))
                line += 1
            pos += int(rng.integers(8, 40))
        vs = VcfVariants(variants)
        graph, v2n = build_graph_from_vcf({"1": seq}, vs)

        # reconstruction
        _, _, refseq = graph.linear_ref_sequence()
        got = "".join("ACGT"[b] for b in np.asarray(refseq, np.int64))
        assert got == seq, trial

        by_pos = {}
        for i, v in enumerate(vs):
            by_pos.setdefault(v.position, []).append(i)
        for pos_, idxs in by_pos.items():
            ref_nodes = {int(v2n.ref_nodes[i]) for i in idxs}
            assert len(ref_nodes) == 1, (trial, pos_)  # shared ref node
            alt_nodes = [int(v2n.var_nodes[i]) for i in idxs]
            assert len(set(alt_nodes)) == len(alt_nodes)
            for i in idxs:
                assert graph.get_node_sequence(
                    int(v2n.var_nodes[i])).upper() == \
                    vs[i].variant_sequence, (trial, pos_)
                assert graph.get_node_sequence(
                    int(v2n.ref_nodes[i])).upper() == vs[i].ref_sequence
            # all alleles hang off the same segment node
            preds = {int(graph.get_reverse_edges(a)[0])
                     for a in alt_nodes} | {
                int(graph.get_reverse_edges(next(iter(ref_nodes)))[0])}
            assert len(preds) == 1, (trial, pos_)


def test_non_minimal_indels():
    """Non-minimal indel records (multi-base shared anchor) must spell
    the correct alt haplotype: the unconsumed anchor bases used to be
    duplicated (insertion) or dropped (deletion)."""
    #            0123456
    ref = {"1": "ACCATTT"}
    # REF 'CA' ALT 'CATG' at pos 3: insert 'TG' after the 2-base anchor
    variants = VcfVariants([VcfVariant("1", 3, "CA", "CATG",
                                       vcf_line_number=0)])
    graph, v2n = build_graph_from_vcf(ref, variants)
    ref_node, var_node = int(v2n.ref_nodes[0]), int(v2n.var_nodes[0])
    assert graph.get_node_size(ref_node) == 0
    assert graph.get_node_sequence(var_node) == "tg"
    # alt haplotype = ACCA + TG + TTT
    finder = DenseKmerFinder(graph, k=6)
    finder.find()
    idx = KmerIndex.from_flat_kmers(finder.get_flat_kmers(v="0"),
                                    modulo=1021)
    assert idx.get(sequence_to_kmer_hash("CATGTT"))[0] is not None
    # the buggy haplotype (duplicated anchor base 'A') must NOT exist
    assert idx.get(sequence_to_kmer_hash("ATGATT"))[0] is None

    # REF 'CATT' ALT 'CA' at pos 3: delete 'TT' after the 2-base anchor
    variants = VcfVariants([VcfVariant("1", 3, "CATT", "CA",
                                       vcf_line_number=0)])
    graph, v2n = build_graph_from_vcf(ref, variants)
    ref_node, var_node = int(v2n.ref_nodes[0]), int(v2n.var_nodes[0])
    assert graph.get_node_sequence(ref_node) == "tt"
    assert graph.get_node_size(var_node) == 0
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    idx = KmerIndex.from_flat_kmers(finder.get_flat_kmers(v="0"),
                                    modulo=1021)
    # alt haplotype = ACCA + '' + T
    assert idx.get(sequence_to_kmer_hash("ACCAT"))[0] is not None


def test_from_dicts_accepts_bytes_and_numeric_sequences():
    """letter_sequence_to_numeric accepts str/bytes/char/numeric per
    node (hashing.py:47-62); from_dicts must keep accepting all of them
    (the slab-encode fast path only covers str)."""
    from graph_kmer_index_tpu.graph import Graph
    want = Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "C", 4: "GGTA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    got = Graph.from_dicts(
        {1: b"ACTG", 2: np.array([0], np.int8), 3: "C",
         4: np.array([2, 2, 3, 0], np.uint8)},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    np.testing.assert_array_equal(got.sequence, want.sequence)
    np.testing.assert_array_equal(got.node_to_ref_offset,
                                  want.node_to_ref_offset)


def test_multi_chromosome_offset_conversion():
    """Chromosome '1' is the FIRST chromosome (VCF numbering), resolved
    by stored name; the old code indexed the start-node array 0-based
    with the raw chromosome number (every multi-chromosome variant
    searched the wrong chromosome)."""
    ref = {"chr1": "ACTGAAATGC", "chr2": "TTTTCCCCGG"}
    variants = VcfVariants([
        VcfVariant("chr1", 5, "A", "G", vcf_line_number=0),
        VcfVariant("chr2", 5, "C", "A", vcf_line_number=1),
    ])
    graph, v2n = build_graph_from_vcf(ref, variants)
    # chromosome 2 offset 0 lands past chromosome 1's 10 bases
    off2 = graph.convert_chromosome_ref_offset_to_graph_ref_offset(0, "chr2")
    assert off2 >= 10
    assert graph.convert_chromosome_ref_offset_to_graph_ref_offset(
        0, "chr1") == 0
    # name resolution tolerates a missing/extra chr prefix and falls
    # back to numeric 1-based
    assert graph.convert_chromosome_ref_offset_to_graph_ref_offset(
        0, "2") == off2
    assert graph.convert_chromosome_ref_offset_to_graph_ref_offset(
        0, 2) == off2
    # the variant machinery resolves each variant on its own chromosome:
    # node at chr2:4 (0-based) is on the chr2 segment
    node = graph.get_node_at_chromosome_and_chromosome_offset("chr2", 1)
    assert graph.get_node_sequence(node).startswith("tttt")

    # round-trips through npz keep the names
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "g.npz")
    graph.to_file(p)
    from graph_kmer_index_tpu import Graph
    g2 = Graph.from_file(p)
    assert g2.chromosome_names == ["chr1", "chr2"]
    assert g2.convert_chromosome_ref_offset_to_graph_ref_offset(
        0, "chr2") == off2
