"""Device-resident find->build pipeline equality tests.

find_kmers_parallel_device must produce FlatKmers bit-identical to
find_kmers_parallel (same rows, same order) while keeping the expanded
row arrays on device, and the resulting device index build must match
the host build. Mirrors the reference's parallel-equals-serial strategy
(/root/reference/tests/test_shared_memory.py:22-27) extended to the
host<->device boundary.
"""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import Graph, CollisionFreeKmerIndex
from graph_kmer_index_tpu.parallel.host_pool import (
    find_kmers_parallel, find_kmers_parallel_device)
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph


def _assert_flat_equal(a, b):
    assert np.array_equal(np.asarray(a._hashes), np.asarray(b._hashes))
    assert np.array_equal(np.asarray(a._nodes), np.asarray(b._nodes))
    assert np.array_equal(np.asarray(a._ref_offsets),
                          np.asarray(b._ref_offsets))
    assert np.allclose(np.asarray(a._allele_frequencies),
                       np.asarray(b._allele_frequencies))


def test_device_pipeline_matches_host_toy():
    graph = Graph.from_dicts(
        {1: "ACTGACTGTCTAGGACTGAC", 2: "A", 3: "G", 4: "CCCTACTGTTTAGTCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    host = find_kmers_parallel(graph, 5, n_workers=1)
    dev = find_kmers_parallel_device(graph, 5, n_workers=1)
    _assert_flat_equal(dev, host)


def test_device_pipeline_matches_host_random():
    for seed in range(8):
        graph, _ = random_snp_graph(400, 10, seed=seed, indel_fraction=0.3)
        for k in (4, 7):
            host = find_kmers_parallel(graph, k, n_workers=2)
            dev = find_kmers_parallel_device(graph, k, n_workers=2)
            _assert_flat_equal(dev, host)


def test_device_pipeline_streamed_groups_match_host():
    """Tiny stream thresholds force MANY ladder-padded group expansions
    (the find-overlapped finalize); assembled rows must stay bit-equal
    to the host path — order, values, and the padded tails sliced off."""
    for seed in (3, 12):
        graph, _ = random_snp_graph(1500, 25, seed=seed, indel_fraction=0.3)
        host = find_kmers_parallel(graph, 7, n_workers=2)
        dev = find_kmers_parallel_device(graph, 7, n_workers=2,
                                         stream_rows_target=200,
                                         stream_tape_target=400)
        _assert_flat_equal(dev, host)


def test_device_pipeline_streamed_matches_unstreamed_device():
    """Streamed (multi-group) and single-expansion device paths agree,
    including under only_save_one + only_store_nodes filters."""
    graph, _ = random_snp_graph(900, 15, seed=5)
    kwargs = dict(only_save_one_node_per_kmer=True,
                  only_store_nodes={1, 2, 3, 4, 5, 6, 7, 8, 9, 10})
    one = find_kmers_parallel_device(graph, 6, n_workers=2, **kwargs)
    streamed = find_kmers_parallel_device(graph, 6, n_workers=2,
                                          stream_rows_target=100,
                                          stream_tape_target=300, **kwargs)
    _assert_flat_equal(streamed, one)


def test_device_pipeline_only_save_one_and_store_nodes():
    graph, _ = random_snp_graph(300, 8, seed=3)
    kwargs = dict(only_save_one_node_per_kmer=True)
    host = find_kmers_parallel(graph, 5, n_workers=1, **kwargs)
    dev = find_kmers_parallel_device(graph, 5, n_workers=1, **kwargs)
    _assert_flat_equal(dev, host)

    nodes = set(range(1, graph.n_nodes(), 2))
    kwargs = dict(only_store_nodes=nodes)
    host = find_kmers_parallel(graph, 5, n_workers=1, **kwargs)
    dev = find_kmers_parallel_device(graph, 5, n_workers=1, **kwargs)
    _assert_flat_equal(dev, host)


def test_device_pipeline_index_build_matches():
    graph, _ = random_snp_graph(500, 12, seed=11, indel_fraction=0.2)
    host_flat = find_kmers_parallel(graph, 6, n_workers=2)
    dev_flat = find_kmers_parallel_device(graph, 6, n_workers=2)
    host_idx = CollisionFreeKmerIndex.from_flat_kmers(host_flat, modulo=211)
    dev_idx = CollisionFreeKmerIndex.from_flat_kmers(dev_flat, modulo=211)
    for q in np.unique(np.asarray(host_flat._hashes))[:50]:
        assert np.array_equal(np.sort(host_idx.get_nodes(int(q))),
                              np.sort(dev_idx.get_nodes(int(q))))
        assert host_idx.get_frequency(int(q)) == dev_idx.get_frequency(int(q))


def test_device_pipeline_whitelist_falls_back():
    graph, _ = random_snp_graph(250, 6, seed=5)
    base = find_kmers_parallel(graph, 5, n_workers=1)
    wl = set(int(h) for h in np.asarray(base._hashes)[::3])
    host = find_kmers_parallel(graph, 5, n_workers=1, whitelist=wl)
    dev = find_kmers_parallel_device(graph, 5, n_workers=1, whitelist=wl)
    _assert_flat_equal(dev, host)


# -- device-resident read->counts pipeline -----------------------------------

def _write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n{r}\n")


def _toy_index_for_reads(k):
    graph = Graph.from_dicts(
        {1: "ACTGACTGTCTAGGACTGACCATGACTACAGTT", 2: "A", 3: "G",
         4: "CCCTACTGTTTAGTCAGGATTCAGGACT"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    from graph_kmer_index_tpu import DenseKmerFinder
    finder = DenseKmerFinder(graph, k=k)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    return graph, CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=211)


def test_device_read_pipeline_counts_match_host(tmp_path):
    from graph_kmer_index_tpu import ReadKmers
    k = 7
    graph, index = _toy_index_for_reads(k)
    rng = np.random.default_rng(0)
    reads = ["ACTGACTGTCTAGG", "CCCTACTGTTTAGTCAG", "ACT",  # one < k
             "".join(rng.choice(list("ACGT"), size=40))]
    fa = tmp_path / "reads.fa"
    _write_fasta(fa, reads)
    for rc in (False, True):
        host_kmers = ReadKmers.hash_fasta_file(
            str(fa), k, include_reverse_complements=rc)
        dev_kmers = ReadKmers.hash_fasta_file(
            str(fa), k, include_reverse_complements=rc,
            keep_on_device=True)
        assert np.array_equal(dev_kmers.to_numpy(), host_kmers)
        n_nodes = graph.n_nodes()
        host_counts = index.map_kmers(host_kmers, n_nodes)
        dev_counts = index.map_kmers(dev_kmers, n_nodes)
        assert np.array_equal(np.asarray(host_counts, dtype=np.int64),
                              np.asarray(dev_counts, dtype=np.int64)), rc
        host_has = index.has_kmers(host_kmers)
        dev_has = index.has_kmers(dev_kmers)
        assert np.array_equal(np.asarray(host_has), np.asarray(dev_has))


def test_device_read_pipeline_fastq_and_empty(tmp_path):
    from graph_kmer_index_tpu import ReadKmers
    k = 5
    graph, index = _toy_index_for_reads(k)
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as f:
        f.write("@r1\nACTGACTGTC\n+\nIIIIIIIIII\n"
                "@r2\nCCCTACTGT\n+\n!!!!!!!!!\n")
    host = ReadKmers.hash_fasta_file(str(fq), k)
    dev = ReadKmers.hash_fasta_file(str(fq), k, keep_on_device=True)
    assert np.array_equal(dev.to_numpy(), host)
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    dev0 = ReadKmers.hash_fasta_file(str(empty), k, keep_on_device=True)
    assert len(dev0) == 0
    counts = index.map_kmers(dev0, graph.n_nodes())
    assert counts.sum() == 0


def test_device_read_pipeline_chunked(tmp_path, monkeypatch):
    """Chunk-loop edges: segments longer than QUERY_CHUNK (tail slice
    shorter than the chunk, sub-1024 pad) must match the host path."""
    from graph_kmer_index_tpu import ReadKmers
    from graph_kmer_index_tpu.ops.lookup import DeviceKmerIndex
    monkeypatch.setattr(DeviceKmerIndex, "QUERY_CHUNK", 256)
    k = 6
    graph, index = _toy_index_for_reads(k)
    rng = np.random.default_rng(7)
    reads = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(3, 80))))
             for _ in range(40)]
    fa = tmp_path / "reads.fa"
    _write_fasta(fa, reads)
    host_kmers = ReadKmers.hash_fasta_file(str(fa), k)
    dev_kmers = ReadKmers.hash_fasta_file(str(fa), k, keep_on_device=True)
    assert len(host_kmers) > 256 * 2  # exercises >2 chunks
    n_nodes = graph.n_nodes()
    assert np.array_equal(
        np.asarray(index.map_kmers(host_kmers, n_nodes), dtype=np.int64),
        np.asarray(index.map_kmers(dev_kmers, n_nodes), dtype=np.int64))
    assert np.array_equal(index.has_kmers(host_kmers),
                          index.has_kmers(dev_kmers))


def test_device_read_pipeline_segmented(tmp_path, monkeypatch):
    """Large-file segmentation (SEGMENT_BASES) must preserve the host
    path's kmer order and counts, including with revcomps."""
    from graph_kmer_index_tpu import ReadKmers
    monkeypatch.setattr(ReadKmers, "SEGMENT_BASES", 100)
    k = 6
    graph, index = _toy_index_for_reads(k)
    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(4, 60))))
             for _ in range(30)]
    reads.append("".join(rng.choice(list("ACGT"), size=300)))  # > segment
    fa = tmp_path / "reads.fa"
    _write_fasta(fa, reads)
    for rc in (False, True):
        host = ReadKmers.hash_fasta_file(str(fa), k,
                                         include_reverse_complements=rc)
        dev = ReadKmers.hash_fasta_file(str(fa), k,
                                        include_reverse_complements=rc,
                                        keep_on_device=True)
        assert len(dev.segments) > 2
        assert np.array_equal(dev.to_numpy(), host), rc
        n_nodes = graph.n_nodes()
        assert np.array_equal(
            np.asarray(index.map_kmers(host, n_nodes), dtype=np.int64),
            np.asarray(index.map_kmers(dev, n_nodes), dtype=np.int64))
