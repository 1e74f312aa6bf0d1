"""Encoding/hash contract (mirrors reference tests/test_kmer_hashing.py)."""
import numpy as np

from graph_kmer_index_tpu import (
    sequence_to_kmer_hash, letter_sequence_to_numeric, kmer_hash_to_sequence,
    kmer_hash_to_reverse_complement_hash,
    kmer_hashes_to_reverse_complement_hash,
)
from graph_kmer_index_tpu.hashing import (
    power_array, reverse_power_array, kmer_hashes_to_bases,
    numeric_to_letter_sequence, sliding_window_hashes,
)
from graph_kmer_index_tpu.read_kmers import reverse_complement_string


def test_simple():
    # first base is least significant digit (reference test_kmer_hashing.py:10-11)
    assert sequence_to_kmer_hash("ACTG") == 0 * 1 + 1 * 4 + 3 * 16 + 2 * 64


def test_overflow_issues():
    seqs = ["CAtgAACAtttggtAATCTACAtgAACAttt",
            "ACAtgAACAtttggtAATCTACAtgAACAtt",
            "CAtgAACAtttggtAATCTACAtgAACAtta"]
    for s in seqs:
        assert sequence_to_kmer_hash(s) == np.sum(
            reverse_power_array(31) * letter_sequence_to_numeric(s))
    assert sequence_to_kmer_hash("T" * 31) == 4611686018427387903


def test_hash_and_reverse():
    for seq in ["atg", "Acacatacgactacg",
                "CAtgAACAtttggtAATCTACAtgAACAttt", "G"]:
        h = sequence_to_kmer_hash(seq)
        assert kmer_hash_to_sequence(h, len(seq)).lower() == seq.lower()


def test_rev_comp_hash():
    for seq in ["AcATaCAG", "AGACATTA",
                "GGGGAAAACCCCTTTTAAAACCCCTTTTGGG",
                "GGGGGGGGGGGGGGGGGGGGGGGGGGGGGGG", "ACT"]:
        k = len(seq)
        h = sequence_to_kmer_hash(seq)
        rc = kmer_hash_to_reverse_complement_hash(h, k)
        assert kmer_hash_to_reverse_complement_hash(rc, k) == h
        assert kmer_hash_to_sequence(rc, k).lower() == \
            reverse_complement_string(seq).lower()


def test_rev_comp_hashes_batch():
    seqs = ["ACACTTACG", "acgactaca", "AATTGGGGG", "ACACACACT"]
    k = len(seqs[0])
    hashes = np.array([sequence_to_kmer_hash(s) for s in seqs], dtype=np.uint64)
    rc = kmer_hashes_to_reverse_complement_hash(hashes, k)
    assert np.all(kmer_hashes_to_reverse_complement_hash(rc, k) == hashes)


def test_kmer_hashes_to_bases():
    seqs = ["ACTG", "TGGC"]
    hashes = np.array([sequence_to_kmer_hash(s) for s in seqs], dtype=np.uint64)
    bases = kmer_hashes_to_bases(hashes, 4)
    back = ["".join(numeric_to_letter_sequence(b)).upper() for b in bases]
    assert back == seqs


def test_sliding_window_hashes_matches_scalar():
    seq = "ACGTGCGTACGGTTACGGCATTACGGACTG"
    num = letter_sequence_to_numeric(seq)
    for k in (1, 3, 5, 16, 17, 31):
        if k > len(seq):
            continue
        expected = np.array([sequence_to_kmer_hash(seq[i:i + k])
                             for i in range(len(seq) - k + 1)], dtype=np.uint64)
        got = sliding_window_hashes(num, k)
        assert np.array_equal(got, expected)


def test_device_sliding_hashes_match_host():
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import (
        sliding_hashes, sliding_hashes_pallas, combine_u32_pair)
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, size=1000).astype(np.int8)
    for k in (4, 16, 31):
        host = sliding_window_hashes(seq.astype(np.uint64), k)
        dev = np.asarray(sliding_hashes(jnp.asarray(seq.astype(np.int32)), k))
        assert np.array_equal(dev[: len(host)].astype(np.uint64), host)
        lo, hi = sliding_hashes_pallas(jnp.asarray(seq.astype(np.int32)), k,
                                       interpret=True)
        packed = np.asarray(combine_u32_pair(lo, hi)).astype(np.uint64)
        assert np.array_equal(packed[: len(host)], host)


def test_encode_ascii_device():
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import encode_ascii
    raw = np.frombuffer(b"ACGTacgtNnxM", dtype=np.uint8)
    got = np.asarray(encode_ascii(jnp.asarray(raw)))
    assert got.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 0, 0]


def test_update_hash_rolling_matches_window_hashes():
    """The scalar rolling rule (reference kmer_finder.py:15-34) rebuilt
    incrementally must equal the vectorized window hashes, incl. k=31
    (python-int arithmetic: 4^31 overflows float64-safe range)."""
    from graph_kmer_index_tpu.hashing import (update_hash,
                                              sliding_window_hashes)
    rng = np.random.default_rng(3)
    seq = rng.integers(0, 4, 80).astype(np.uint64)
    for k in (4, 31):
        expected = sliding_window_hashes(seq, k)
        h = 0
        for i in range(k):  # build-up phase: only_add = position
            h = update_hash(seq[i], h, 0, k, only_add=i)
        assert h == int(expected[0])
        for w in range(1, len(seq) - k + 1):  # rolling phase
            h = update_hash(seq[w + k - 1], h, seq[w - 1], k)
            assert h == int(expected[w]), (k, w)
