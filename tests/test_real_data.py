"""Realistically messy VCF+FASTA fixture driven end-to-end at the argv
level (VERDICT r3 item 7).

The committed fixture (`tests/data/messy_ref.fa`, `tests/data/messy.vcf`)
carries the mess real pipelines hit and nobody hand-crafts into unit
fixtures: 60-column wrapped FASTA with description text after the record
name, a soft-masked lowercase stretch, an assembly-gap N-run, a
'chr'-prefixed second chromosome, full 11-column VCF rows
(QUAL/FILTER/INFO/FORMAT + two samples), a multi-allelic SNP, an
insertion, a deletion, a NON-minimal indel record (shared anchor bases
beyond the first), a symbolic ALT (reader-skipped), a REF-mismatch
record (builder-skipped) and an overlapping pair (second builder-skipped).

Reference analog: the `make_graph -> index -> make_from_flat ->
make_unique_variant_kmers -> map_reads` journey of
/root/reference/graph_kmer_index/command_line_interface.py:238-689 on a
real pangenome VCF (Readme.md:4).
"""
import logging
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    FlatKmers, Graph, KmerIndex, VariantToNodes, kmer_hashes_to_bases,
    sequence_to_kmer_hash)
from graph_kmer_index_tpu.cli import run_argument_parser
from graph_kmer_index_tpu.utils.fasta import read_fasta_sequences
from graph_kmer_index_tpu.variants import VcfVariants

DATA = pathlib.Path(__file__).parent / "data"
FASTA = str(DATA / "messy_ref.fa")
VCF = str(DATA / "messy.vcf")
K = 15


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Run the full CLI journey once; tests assert on its artifacts."""
    tmp = tmp_path_factory.mktemp("real")
    p = {n: str(tmp / f"{n}") for n in
         ("g.npz", "v2n.npz", "flat.npz", "k.npz", "sig.npz",
          "sig_kivs.npz", "counts.npy", "reads.fa")}
    run_argument_parser(["make_graph", "-R", FASTA, "-v", VCF,
                         "-o", p["g.npz"], "-V", p["v2n.npz"]])
    run_argument_parser(["index", "-g", p["g.npz"], "-k", str(K),
                         "-o", p["flat.npz"]])
    run_argument_parser(["make_from_flat", "-f", p["flat.npz"],
                         "-o", p["k.npz"], "-m", "1048583"])
    run_argument_parser(["make_unique_variant_kmers", "-g", p["g.npz"],
                         "-V", p["v2n.npz"], "-k", str(K),
                         "-i", p["k.npz"], "-v", VCF,
                         "-o", p["sig.npz"]])
    run_argument_parser(["make_unique_variant_kmers_kivs", "-g", p["g.npz"],
                         "-V", p["v2n.npz"], "-k", str(K),
                         "-i", p["k.npz"], "-v", VCF,
                         "-o", p["sig_kivs.npz"]])
    return p


def test_reader_splits_and_skips():
    """17 data lines -> 17 emitted variants: the multi-allelic row splits
    in two (+1), the symbolic <DEL> is skipped (-1)."""
    variants = VcfVariants.from_vcf(VCF)
    assert len(variants) == 17
    assert sum(1 for v in variants if str(v.chromosome) == "chr21") == 3
    at900 = [v for v in variants if v.position == 900]
    assert len(at900) == 2  # the split multi-allelic pair
    assert len({v.variant_sequence for v in at900}) == 2
    assert all(v.variant_sequence != v.ref_sequence for v in at900)
    assert not any("<" in v.variant_sequence for v in variants)


def test_graph_reconstructs_reference(pipeline):
    """Concatenated linear-ref bases == the FASTA, uppercased, N->A
    (the documented unknown-base encoding, hashing.py module docstring)."""
    g = Graph.from_file(pipeline["g.npz"])
    _, _, refseq = g.linear_ref_sequence()
    letters = "ACGT"
    got = "".join(letters[b] for b in np.asarray(refseq, dtype=np.int64))
    want = "".join(
        seq.upper().replace("N", "A")
        for seq in read_fasta_sequences(FASTA).values())
    assert got == want
    assert len(g.chromosome_start_nodes) == 2


def test_variant_to_nodes_rows(pipeline):
    """Good variants get node pairs; builder-skipped rows stay zero."""
    v2n = VariantToNodes.from_file(pipeline["v2n.npz"])
    variants = VcfVariants.from_vcf(VCF)
    assert len(v2n.ref_nodes) == len(variants) == 17
    skipped = [i for i, v in enumerate(variants)
               if (str(v.chromosome), v.position) in
               [("1", 2700), ("1", 2712)]]  # REF mismatch / overlap
    assert len(skipped) == 2
    for i in range(len(variants)):
        if i in skipped:
            assert v2n.ref_nodes[i] == 0 and v2n.var_nodes[i] == 0
        else:
            assert v2n.ref_nodes[i] > 0 and v2n.var_nodes[i] > 0
    # the split multi-allelic pair shares one ref-allele node (one
    # bubble, obgraph merge topology) with distinct alt nodes
    at900 = [i for i, v in enumerate(variants) if v.position == 900]
    assert v2n.ref_nodes[at900[0]] == v2n.ref_nodes[at900[1]]
    assert v2n.var_nodes[at900[0]] != v2n.var_nodes[at900[1]]
    g = Graph.from_file(pipeline["g.npz"])
    for i, v in enumerate(variants):
        if i in skipped:
            continue
        if v.type == "SNP":
            assert g.get_node_sequence(
                int(v2n.var_nodes[i])).upper() == v.variant_sequence
            assert g.get_node_sequence(
                int(v2n.ref_nodes[i])).upper() == v.ref_sequence


def test_nonminimal_indel_consumes_anchor(pipeline):
    """REF 'XY' ALT 'XYTG' at 1:2200 must become an empty ref node and a
    2-bp 'TG' alt node (both anchor bases consumed into the segment)."""
    v2n = VariantToNodes.from_file(pipeline["v2n.npz"])
    variants = VcfVariants.from_vcf(VCF)
    g = Graph.from_file(pipeline["g.npz"])
    (i,) = [i for i, v in enumerate(variants)
            if v.position == 2200 and str(v.chromosome) == "1"]
    assert g.get_node_size(int(v2n.ref_nodes[i])) == 0
    assert g.get_node_sequence(int(v2n.var_nodes[i])).upper() == "TG"


def test_signatures_cover_good_variants(pipeline):
    """Every non-skipped variant gets signature kmers, on both the
    per-variant and the batched (kivs) argv paths, with identical
    (kmer, node) content."""
    variants = VcfVariants.from_vcf(VCF)
    v2n = VariantToNodes.from_file(pipeline["v2n.npz"])
    good_nodes = set()
    for i in range(len(variants)):
        if v2n.ref_nodes[i] > 0:
            good_nodes.add(int(v2n.ref_nodes[i]))
            good_nodes.add(int(v2n.var_nodes[i]))
    for out in ("sig.npz", "sig_kivs.npz"):
        sig = FlatKmers.from_file(pipeline[out])
        assert good_nodes <= set(np.asarray(sig._nodes).tolist())
    a = FlatKmers.from_file(pipeline["sig.npz"])
    b = FlatKmers.from_file(pipeline["sig_kivs.npz"])
    key = lambda f: np.lexsort((np.asarray(f._nodes),
                                np.asarray(f._hashes)))
    np.testing.assert_array_equal(np.asarray(a._hashes)[key(a)],
                                  np.asarray(b._hashes)[key(b)])
    np.testing.assert_array_equal(np.asarray(a._nodes)[key(a)],
                                  np.asarray(b._nodes)[key(b)])


def test_map_reads_hits_variant_alleles(pipeline, tmp_path):
    """Reads carrying the chr21:1000 alt allele put counts on the alt
    node; pure-reference reads put counts on ref-path nodes only."""
    variants = VcfVariants.from_vcf(VCF)
    v2n = VariantToNodes.from_file(pipeline["v2n.npz"])
    g = Graph.from_file(pipeline["g.npz"])
    (i,) = [i for i, v in enumerate(variants)
            if v.position == 1000 and str(v.chromosome) == "chr21"]
    v = variants[i]
    seqs = read_fasta_sequences(FASTA)
    c2 = seqs["chr21"].upper()
    window = c2[v.position - 31:v.position - 1] + v.variant_sequence + \
        c2[v.position:v.position + 30]
    ref_window = c2[v.position - 31:v.position + 30]
    reads = tmp_path / "reads.fa"
    reads.write_text(f">alt\n{window}\n>ref\n{ref_window}\n")
    counts = str(tmp_path / "c.npy")
    run_argument_parser(["map_reads", "-i", pipeline["k.npz"],
                         "-r", str(reads), "-k", str(K), "-o", counts])
    c = np.load(counts)
    alt_node = int(v2n.var_nodes[i])
    ref_node = int(v2n.ref_nodes[i])
    assert c[alt_node] > 0
    assert c[ref_node] > 0
    assert c.sum() > c[alt_node] + c[ref_node]  # flanks hit segment nodes


def test_index_contains_masked_region_kmers(pipeline):
    """Kmers spanning the soft-masked (lowercase) stretch are indexed in
    canonical 2-bit form — lowercase input must not perturb hashing."""
    seqs = read_fasta_sequences(FASTA)
    c1 = seqs["1"]
    idx = KmerIndex.from_file(pipeline["k.npz"])
    # a window strictly inside [1200, 1400) and away from variants at
    # 1250 (give +5..+35)
    window = c1[1300:1300 + K]
    assert window.islower()
    h = sequence_to_kmer_hash(window.upper())
    assert bool(idx.has_kmers(np.array([h], np.uint64))[0])
    back = kmer_hashes_to_bases(np.array([h], np.uint64), K)
    letters = "ACGT"
    assert "".join(letters[b] for b in back[0]) == window.upper()
