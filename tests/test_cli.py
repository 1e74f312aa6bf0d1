"""End-to-end CLI coverage: every subcommand through run_argument_parser
(reference command_line_interface.py parity)."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    Graph, VariantToNodes, FlatKmers, KmerIndex, sequence_to_kmer_hash)
from graph_kmer_index_tpu.cli import run_argument_parser


@pytest.fixture
def fixtures(tmp_path):
    graph = Graph.from_dicts(
        {1: "AAAAAACTG", 2: "A", 3: "G", 4: "GC", 5: "T", 6: "C",
         7: "TGAGCCCCC", 8: "", 9: "TC", 10: "AAAAA"},
        {1: [2, 3], 2: [4], 3: [4], 4: [5, 6], 5: [7], 6: [7],
         7: [8, 9], 9: [10], 8: [10]},
        [1, 2, 4, 5, 7, 10])
    g = str(tmp_path / "graph.npz")
    graph.to_file(g)
    v2n = str(tmp_path / "v2n.npz")
    VariantToNodes(np.array([2, 5, 8]), np.array([3, 6, 9])).to_file(v2n)
    vcf = str(tmp_path / "variants.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\n"
                "1\t10\t.\tA\tG\n1\t13\t.\tT\tC\n1\t22\t.\tC\tCTC\n")
    return tmp_path, g, v2n, vcf


def test_full_cli_pipeline(fixtures):
    tmp, g, v2n, vcf = fixtures
    flat = str(tmp / "flat.npz")
    kindex = str(tmp / "kindex.npz")

    run_argument_parser(["index", "-g", g, "-k", "5", "-o", flat])
    run_argument_parser(["make_from_flat", "-f", flat, "-o", kindex,
                         "-m", "4099"])
    run_argument_parser(["make_reverse", "-f", flat,
                         "-o", str(tmp / "rev.npz")])
    run_argument_parser(["find_critical_paths", "-g", g, "-k", "5",
                         "-o", str(tmp / "crit.pkl")])
    run_argument_parser(["make_unique_variant_kmers", "-g", g, "-V", v2n,
                         "-k", "5", "-i", kindex, "-v", vcf, "-D", "true",
                         "-o", str(tmp / "sig.npz")])
    run_argument_parser(["sample_kmers_from_structural_variants", "-g", g,
                         "-V", v2n, "-k", "5",
                         "-o", str(tmp / "sv.npz")])
    run_argument_parser(["merge_flat_kmers",
                         "-f", f"{flat},{tmp / 'sig.npz'}",
                         "-o", str(tmp / "merged.npz")])
    run_argument_parser(["add_reverse_complements", "-f", flat, "-k", "5",
                         "-o", str(tmp / "flatrc.npz")])
    run_argument_parser(["count_kmers", "-f", flat,
                         "-o", str(tmp / "counter.pkl")])
    run_argument_parser(["create_counter_index", "-i", kindex,
                         "-o", str(tmp / "cidx.pkl"), "-m", "4099"])
    run_argument_parser(["prune_flat_kmers", "-f", flat,
                         "-o", str(tmp / "pruned.npz")])
    run_argument_parser(["make", "-g", g, "-k", "5", "-s", "1",
                         "-o", str(tmp / "make_flat.npz")])
    run_argument_parser(["make_reference_kmer_index", "-f", flat,
                         "-o", str(tmp / "refidx.npz")])
    run_argument_parser(["make_unique_index", "-f", flat, "-g", g,
                         "-r", str(tmp / "rev.npz"),
                         "-o", str(tmp / "uniq.pkl")])
    run_argument_parser(["set_frequencies_using_other_index", "-i", kindex,
                         "-f", kindex])
    run_argument_parser(["make_kmer_frequency_index",
                         "-r", str(tmp / "refidx.npz"),
                         "-o", str(tmp / "freq.npz")])
    # set_allele_frequencies is a reference NO-OP
    # (collision_free_kmer_index.py:234-235): the subcommand must run the
    # load/save round-trip and leave the index bit-identical
    before = KmerIndex.from_file(kindex)
    af = str(tmp / "af.npy")
    np.save(af, np.zeros(8, np.float32))
    run_argument_parser(["set_allele_frequencies", "-i", kindex, "-f", af])
    after = KmerIndex.from_file(kindex)
    np.testing.assert_array_equal(np.asarray(before._kmers),
                                  np.asarray(after._kmers))
    np.testing.assert_array_equal(np.asarray(before._allele_frequencies),
                                  np.asarray(after._allele_frequencies))

    # semantic spot checks on the pipeline outputs
    sig = FlatKmers.from_file(str(tmp / "sig.npz"))
    assert sequence_to_kmer_hash("CTGAG") not in set(
        np.asarray(sig._hashes).tolist())
    idx = KmerIndex.from_file(kindex)
    assert idx.get_frequency(sequence_to_kmer_hash("CTGAG"), k=5) == 2
    flat_arr = FlatKmers.from_file(flat)
    rc = FlatKmers.from_file(str(tmp / "flatrc.npz"))
    assert len(rc._hashes) == 2 * len(flat_arr._hashes)


def test_cli_make_from_reference_fasta(fixtures):
    tmp, g, v2n, vcf = fixtures
    fa = str(tmp / "ref.fa")
    with open(fa, "w") as f:
        f.write(">chr1\nACGTACGTACGTACGTACGT\n")
    out = str(tmp / "linear_flat.npz")
    run_argument_parser(["make", "-R", fa, "-n", "chr1", "-k", "5",
                         "-s", "1", "-o", out])
    flat = FlatKmers.from_file(out)
    assert len(flat._hashes) > 0
    assert flat._hashes[0] == sequence_to_kmer_hash("ACGTA")


def test_cli_no_args_exits():
    with pytest.raises(SystemExit):
        run_argument_parser([])


def test_cli_index_with_whitelist(fixtures):
    tmp, g, v2n, vcf = fixtures
    flat = str(tmp / "flat.npz")
    kindex = str(tmp / "kindex.npz")
    run_argument_parser(["index", "-g", g, "-k", "5", "-o", flat])
    run_argument_parser(["make_from_flat", "-f", flat, "-o", kindex,
                         "-m", "4099"])
    out = str(tmp / "flat_wl.npz")
    run_argument_parser(["index", "-g", g, "-k", "5", "-w", kindex,
                         "-o", out])
    wl_idx = KmerIndex.from_file(kindex)
    got = FlatKmers.from_file(out)
    # every emitted kmer must be in the whitelist index
    assert len(got._hashes) > 0
    assert all(bool(h) for h in wl_idx.has_kmers(
        np.asarray(got._hashes, np.uint64), backend="native"))


def test_cli_make_index_out_of_core(tmp_path, fixtures):
    """make_index_out_of_core == index + make_from_flat, and its shard
    checkpoint serves through map_reads --table-shards."""
    _, g, v2n, _ = fixtures
    flat = str(tmp_path / "flat.npz")
    kindex = str(tmp_path / "kindex.npz")
    run_argument_parser(["index", "-g", g, "-k", "5", "-o", flat])
    run_argument_parser(["make_from_flat", "-f", flat, "-o", kindex,
                         "-m", "4099"])
    wd = str(tmp_path / "ooc")
    run_argument_parser(["make_index_out_of_core", "-g", g, "-k", "5",
                         "-d", wd, "-m", "4099", "-n", "4", "-O", "1"])
    from graph_kmer_index_tpu.parallel.oocbuild import \
        index_from_shard_checkpoint
    mono = KmerIndex.from_file(kindex)
    ooc = index_from_shard_checkpoint(str(pathlib.Path(wd) / "index"))
    np.testing.assert_array_equal(np.asarray(ooc._kmers, np.uint64),
                                  np.asarray(mono._kmers, np.uint64))
    np.testing.assert_array_equal(np.asarray(ooc._nodes),
                                  np.asarray(mono._nodes))

    reads = str(tmp_path / "reads.fa")
    with open(reads, "w") as f:
        f.write(">r1\nACTGACTGTCTAGGACTGAC\n")
    counts = str(tmp_path / "counts.npy")
    run_argument_parser(["map_reads", "-i", kindex, "-r", reads,
                         "-k", "5", "-o", counts])
    counts_sh = str(tmp_path / "counts_ooc.npy")
    run_argument_parser(["map_reads", "-T", str(pathlib.Path(wd) / "index"),
                         "-r", reads, "-k", "5",
                         "-n", str(len(np.load(counts))), "-o", counts_sh])
    np.testing.assert_array_equal(np.load(counts_sh), np.load(counts))

    # reshard (4 -> 2 shards) serves the same counts
    rsh = str(tmp_path / "resharded")
    run_argument_parser(["reshard_checkpoint",
                         "-i", str(pathlib.Path(wd) / "index"),
                         "-o", rsh, "-n", "2"])
    counts_rs = str(tmp_path / "counts_resharded.npy")
    run_argument_parser(["map_reads", "-T", rsh, "-r", reads, "-k", "5",
                         "-n", str(len(np.load(counts))), "-o", counts_rs])
    np.testing.assert_array_equal(np.load(counts_rs), np.load(counts))

    # packed conversion serves the same counts
    pwd_ = str(tmp_path / "pk")
    run_argument_parser(["convert_shards_to_packed",
                         "-i", str(pathlib.Path(wd) / "index"),
                         "-d", pwd_, "-t", "2"])
    counts_pk = str(tmp_path / "counts_packed.npy")
    run_argument_parser(["map_reads", "-T", str(pathlib.Path(pwd_) / "packed"),
                         "-r", reads, "-k", "5",
                         "-n", str(len(np.load(counts))), "-o", counts_pk])
    np.testing.assert_array_equal(np.load(counts_pk), np.load(counts))


def test_cli_full_user_journey(tmp_path):
    """FASTA+VCF -> make_graph -> index -> make_from_flat -> map_reads:
    the complete switch-from-reference workflow through the CLI."""
    fa = str(tmp_path / "ref.fa")
    with open(fa, "w") as f:
        f.write(">1\nACTGAAATGCCCTGAGATTACAGGCATGAGCCACC\n")
    vcf = str(tmp_path / "v.vcf")
    with open(vcf, "w") as f:
        f.write("##\n#CHROM\tPOS\tID\tREF\tALT\n1\t10\t.\tC\tT\n")
    g = str(tmp_path / "g.npz")
    v2n = str(tmp_path / "v2n.npz")
    run_argument_parser(["make_graph", "-R", fa, "-v", vcf, "-o", g,
                         "-V", v2n])
    flat = str(tmp_path / "flat.npz")
    run_argument_parser(["index", "-g", g, "-k", "7", "-o", flat])
    kindex = str(tmp_path / "k.npz")
    run_argument_parser(["make_from_flat", "-f", flat, "-o", kindex,
                         "-m", "4099"])
    reads = str(tmp_path / "reads.fa")
    with open(reads, "w") as f:
        f.write(">r1\nACTGAAATGTCCTGAG\n>r2\nGGGGGGGG\n")
    counts = str(tmp_path / "counts.npy")
    run_argument_parser(["map_reads", "-i", kindex, "-r", reads,
                         "-k", "7", "-o", counts])
    c = np.load(counts)
    assert c.sum() > 0  # ref-derived read kmers hit the index

    # sharded serving: shard_index -> map_reads --table-shards must
    # reproduce the whole-index counts exactly (2 table x 4 data shards
    # on the 8-device mesh)
    prefix = str(tmp_path / "shards")
    run_argument_parser(["shard_index", "-i", kindex, "-n", "2",
                         "-o", prefix])
    counts_sh = str(tmp_path / "counts_sharded.npy")
    run_argument_parser(["map_reads", "-T", prefix, "-r", reads,
                         "-k", "7", "-n", str(len(c)),
                         "-o", counts_sh])
    np.testing.assert_array_equal(np.load(counts_sh), c)

    # without -n the manifest's max_node hint sizes the counts array
    counts_nn = str(tmp_path / "counts_noN.npy")
    run_argument_parser(["map_reads", "-T", prefix, "-r", reads,
                         "-k", "7", "-o", counts_nn])
    c_nn = np.load(counts_nn)
    assert c_nn.sum() == c.sum()
    np.testing.assert_array_equal(c_nn, c[:len(c_nn)])

    # CSR layout (the fallback for SCAN_CAP-deep tables): same counts
    prefix_csr = str(tmp_path / "shards_csr")
    run_argument_parser(["shard_index", "-i", kindex, "-n", "4",
                         "-l", "csr", "-o", prefix_csr])
    counts_csr = str(tmp_path / "counts_csr.npy")
    run_argument_parser(["map_reads", "-T", prefix_csr, "-r", reads,
                         "-k", "7", "-n", str(len(c)),
                         "-o", counts_csr])
    np.testing.assert_array_equal(np.load(counts_csr), c)
