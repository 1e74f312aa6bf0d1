"""Device (sort/segment) index build == host (argsort/ediff1d) build."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import CollisionFreeKmerIndex, FlatKmers


def _random_flat(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    # heavy collisions: draw kmers from a small space
    hashes = rng.integers(0, 2000, n).astype(np.uint64)
    nodes = rng.integers(1, 500, n).astype(np.uint32)
    ref_offsets = rng.integers(0, 3000, n).astype(np.uint64)
    af = rng.random(n).astype(np.single)
    return FlatKmers(hashes, nodes, ref_offsets, af)


def test_device_build_matches_host_build():
    flat = _random_flat()
    host = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=997,
                                                  use_device=False)
    dev = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=997,
                                                 use_device=True)
    assert np.array_equal(host._kmers, dev._kmers)
    assert np.array_equal(host._nodes, dev._nodes)
    assert np.array_equal(host._ref_offsets, dev._ref_offsets)
    assert np.array_equal(np.asarray(host._hashes_to_index),
                          np.asarray(dev._hashes_to_index))
    assert np.array_equal(np.asarray(host._n_kmers),
                          np.asarray(dev._n_kmers))
    assert np.array_equal(host._frequencies, dev._frequencies)
    assert np.array_equal(host._allele_frequencies, dev._allele_frequencies)


def test_device_build_queries_match():
    flat = _random_flat(seed=3)
    host = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=211,
                                                  use_device=False)
    dev = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=211,
                                                 use_device=True)
    for kmer in np.unique(flat._hashes)[:50]:
        h = host.get(int(kmer), max_hits=10**9)
        d = dev.get(int(kmer), max_hits=10**9)
        assert np.array_equal(h[0], d[0])
        assert np.array_equal(h[1], d[1])


def test_device_build_empty():
    flat = FlatKmers(np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                     np.zeros(0, np.uint64), np.zeros(0, np.single))
    dev = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101,
                                                 use_device=True)
    assert dev.get(5)[0] is None


def test_skip_singletons_host_and_device():
    """skip_singletons drops each hash's first occurrence then adds 1 to
    all frequencies (reference from_flat_kmers semantics)."""
    flat = _random_flat(2000, seed=9)
    host = CollisionFreeKmerIndex.from_flat_kmers(
        flat, modulo=499, skip_singletons=True, use_device=False)
    dev = CollisionFreeKmerIndex.from_flat_kmers(
        flat, modulo=499, skip_singletons=True, use_device=True)
    assert np.array_equal(np.asarray(host._kmers), np.asarray(dev._kmers))
    assert np.array_equal(np.asarray(host._frequencies),
                          np.asarray(dev._frequencies))
    # rows whose hash appeared once are gone entirely
    u, c = np.unique(np.asarray(flat._hashes), return_counts=True)
    gone = set(u[c == 1].tolist())
    assert not (set(np.asarray(host._kmers).tolist()) & gone)


def test_frequencies_wide_ref_offsets():
    """Offsets past 2^32 must stay distinct in the frequency count: the
    narrow 3-lane u32 sort key would alias offsets congruent mod 2^32
    (ops/build.py _frequencies_full_device wide_offsets)."""
    from graph_kmer_index_tpu.ops.build import frequencies_device

    base = np.uint64(7)
    offs = np.array([5, 5 + (1 << 32), 5, 9], dtype=np.uint64)
    kmers = np.array([base, base, base, np.uint64(11)], dtype=np.uint64)
    freqs = frequencies_device(kmers, offs)
    # kmer 7: offsets {5, 5+2^32} -> 2 distinct; kmer 11: 1
    assert freqs.tolist() == [2, 2, 2, 1]
    # narrow path unaffected
    freqs_small = frequencies_device(
        np.array([3, 3, 4], dtype=np.uint64),
        np.array([1, 2, 1], dtype=np.uint64))
    assert freqs_small.tolist() == [2, 2, 1]
