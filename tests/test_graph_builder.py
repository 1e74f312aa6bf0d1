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
