"""Read streaming tests: per-read window hashing and the batched
FASTA-file front end (native + python fallback paths agree)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import ReadKmers, sequence_to_kmer_hash
from graph_kmer_index_tpu.hashing import power_array


def test_get_kmers_from_read_dynamic():
    kmers = ReadKmers.get_kmers_from_read_dynamic("ACTGA", power_array(3))
    assert list(kmers) == [sequence_to_kmer_hash(s)
                           for s in ("ACT", "CTG", "TGA")]


def test_hash_fasta_file(tmp_path):
    fa = tmp_path / "reads.fa"
    fa.write_text(">r1\nACTGACTG\n>r2\nTTTTT\n>empty\n>r3\nACT\n")
    k = 3
    kmers = ReadKmers.hash_fasta_file(str(fa), k, use_device=False)
    expected = []
    for read in ("ACTGACTG", "TTTTT", "ACT"):
        expected += [sequence_to_kmer_hash(read[i:i + k])
                     for i in range(len(read) - k + 1)]
    assert list(kmers) == expected


def test_hash_fasta_file_revcomp(tmp_path):
    fa = tmp_path / "reads.fa"
    fa.write_text(">r\nACTG\n")
    kmers = ReadKmers.hash_fasta_file(str(fa), 4, use_device=False,
                                      include_reverse_complements=True)
    assert list(kmers) == [sequence_to_kmer_hash("ACTG"),
                           sequence_to_kmer_hash("CAGT")]


def test_from_fasta_file_generator(tmp_path):
    """Reference-parity generator API: per-read chained kmers + revcomp."""
    fa = tmp_path / "r.fa"
    fa.write_text(">a\nACTGA\n>b\nTTT\n")
    rk = ReadKmers.from_fasta_file(str(fa), k=3)
    chunks = [list(c) for c in rk]
    # 2 forward generators then 2 revcomp generators, chained per read
    flat = [int(h) for c in chunks for h in c]
    fwd_a = [sequence_to_kmer_hash(s) for s in ("ACT", "CTG", "TGA")]
    assert flat[:3] == fwd_a


def test_bionumpy_hash_alias():
    from graph_kmer_index_tpu import bionumpy_hash, letter_sequence_to_numeric
    seq = letter_sequence_to_numeric("ACTGA")
    got = bionumpy_hash(seq, 3)
    assert [int(h) for h in got] == [sequence_to_kmer_hash(s)
                                     for s in ("ACT", "CTG", "TGA")]


def test_profiling_timings():
    from graph_kmer_index_tpu.utils.profiling import Timings
    t = Timings()
    with t.span("a"):
        pass
    assert "a" in t.report()


def test_hash_fastq_quality_lines_not_encoded(tmp_path):
    """FASTQ quality lines (which rarely start with a marker character)
    must not be 2-bit encoded as reads — one record, one read (ADVICE r1).
    Covers both the native gki_fasta_encode path and the python fallback."""
    fq = tmp_path / "reads.fq"
    # quality line deliberately starts with a non-marker char and contains
    # ACGT-looking letters that would hash "successfully" if mis-parsed
    fq.write_text("@r1\nACTGACTG\n+\nFFGGACGT\n@r2\nTTTTT\n+r2\nIIIII\n")
    k = 3
    expected = []
    for read in ("ACTGACTG", "TTTTT"):
        expected += [sequence_to_kmer_hash(read[i:i + k])
                     for i in range(len(read) - k + 1)]
    for use_native in (True, False):
        if use_native:
            from graph_kmer_index_tpu import native
            if not native.available():
                continue
            kmers = ReadKmers.hash_fasta_file(str(fq), k, use_device=False)
        else:
            import unittest.mock as mock
            with mock.patch("graph_kmer_index_tpu.native.fasta_encode",
                            return_value=None):
                kmers = ReadKmers.hash_fasta_file(str(fq), k,
                                                  use_device=False)
        assert list(kmers) == expected


def test_hash_fasta_file_streamed_blocks_equal_whole_file(tmp_path):
    """Streaming in whole-record blocks (block_bytes) must reproduce the
    whole-file parse bit-exactly — adversarial mix: FASTQ quality lines
    starting with '>'/'@'/'+', blank lines, CRLF, multi-line FASTA, a
    record far larger than the block size, and revcomps (whose order is
    all-forward-then-all-revcomp across the WHOLE file, not per block)."""
    import numpy as np
    fx = tmp_path / "mix.fq"
    big = "ACGTTGCA" * 500
    fx.write_bytes(
        b"@r1\nACTGACTG\n+\n@CGTACGT\n"          # quality starts with '@'
        b"@r2\nTTTTTAAA\n+r2\n>IIIIIII\n"        # quality starts with '>'
        b"@r3\nGGGGCCCC\n+\n+FFFFFFF\n"          # quality starts with '+'
        b"\n@r4\r\nACACACAC\r\n+\r\nFFFFFFFF\r\n"  # blank line + CRLF
        + f">big\n{big}\n".encode()               # record >> block size
        + b">multi\nACGT\nTGCA\nGGCC\n")          # multi-line FASTA
    k = 5
    for rc in (False, True):
        whole = ReadKmers.hash_fasta_file(str(fx), k, use_device=False,
                                          include_reverse_complements=rc)
        for bb in (1, 64, 300):
            streamed = ReadKmers.hash_fasta_file(
                str(fx), k, use_device=False,
                include_reverse_complements=rc, block_bytes=bb)
            np.testing.assert_array_equal(streamed, whole), (rc, bb)
    # device-resident path: same kmers in the same order
    whole = ReadKmers.hash_fasta_file(str(fx), k, use_device=False,
                                      include_reverse_complements=True)
    dev = ReadKmers.hash_fasta_file(str(fx), k, keep_on_device=True,
                                    include_reverse_complements=True,
                                    block_bytes=64)
    np.testing.assert_array_equal(dev.to_numpy(), whole)


def test_reference_differential_read_kmers():
    """ReadKmers.from_fasta_file vs the in-process reference: same kmer
    streams (single-k: reads then revcomps; multi-k: zipped triples)."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    import pathlib, sys, tempfile
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()

    rng = np.random.default_rng(13)
    fa = os.path.join(tempfile.mkdtemp(), "r.fa")
    with open(fa, "w") as f:
        for i in range(6):
            ln = int(rng.integers(20, 60))
            f.write(f">r{i}\n" +
                    "".join(rng.choice(list("ACGT"), size=ln)) + "\n")

    def drain(rk):
        return [np.asarray(x).tolist() for x in rk]

    ours = drain(ReadKmers.from_fasta_file(fa, k=7))
    theirs = drain(ref.ReadKmers.from_fasta_file(fa, k=7))
    assert ours == theirs

    def drain_multi(rk):
        return [[[int(v) for v in p] for p in triple] for triple in rk]

    ours_m = drain_multi(ReadKmers.from_fasta_file(fa, k=15, small_k=7))
    theirs_m = drain_multi(ref.ReadKmers.from_fasta_file(fa, k=15,
                                                         small_k=7))
    assert ours_m == theirs_m
