"""Resumable pooled find (host_pool checkpoint_dir).

The reference's only resume path is manual start/stop flags + a
by-hand merge (kmer_finder.py:92-93); here an interrupted
find_kmers_parallel run must resume from its completed chunks and
produce bit-identical FlatKmers, and a checkpoint dir written for
different inputs must be refused.
"""
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import Graph
from graph_kmer_index_tpu.parallel import host_pool
from graph_kmer_index_tpu.parallel.host_pool import (
    find_kmers_parallel, find_kmers_parallel_device, _ckpt_chunk_path)


def _graph():
    rng = np.random.default_rng(7)
    bases = "ACGT"
    seqs, edges, linear = {}, {}, []
    node = 1
    for _ in range(12):  # ref segment + SNP bubble, chained
        seqs[node] = "".join(bases[b] for b in rng.integers(0, 4, 17))
        seqs[node + 1] = bases[rng.integers(0, 4)]
        seqs[node + 2] = bases[(rng.integers(0, 4) + 1) % 4]
        edges[node] = [node + 1, node + 2]
        edges[node + 1] = [node + 3]
        edges[node + 2] = [node + 3]
        linear += [node, node + 1]
        node += 3
    seqs[node] = "".join(bases[b] for b in rng.integers(0, 4, 17))
    linear.append(node)
    return Graph.from_dicts(seqs, edges, linear)


def _cols(flat):
    return (np.asarray(flat._hashes), np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets),
            np.asarray(flat._allele_frequencies))


def test_checkpointed_find_equals_plain_and_resumes(tmp_path,
                                                    monkeypatch):
    graph = _graph()
    k = 7
    want = find_kmers_parallel(graph, k, n_workers=1)

    ckpt = str(tmp_path / "find_ckpt")
    got = find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt)
    for a, b in zip(_cols(got), _cols(want)):
        np.testing.assert_array_equal(a, b)
    files = sorted(p.name for p in (tmp_path / "find_ckpt").iterdir())
    assert "meta.json" in files
    chunk_files = [f for f in files if f.startswith("chunk-")]
    assert len(chunk_files) >= 2, chunk_files

    # full resume: every chunk present -> the worker must never run
    def boom(chunk):
        raise AssertionError(f"chunk {chunk} recomputed on full resume")
    monkeypatch.setattr(host_pool, "_run_chunk", boom)
    got2 = find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt)
    for a, b in zip(_cols(got2), _cols(want)):
        np.testing.assert_array_equal(a, b)
    monkeypatch.undo()

    # partial resume: drop one chunk file, corrupt another (torn write
    # survivor) -> exactly those two recompute, rows identical
    victims = chunk_files[:2]
    (tmp_path / "find_ckpt" / victims[0]).unlink()
    (tmp_path / "find_ckpt" / victims[1]).write_bytes(b"not an npz")
    calls = []
    real = host_pool._run_chunk

    def counting(chunk):
        calls.append(chunk)
        return real(chunk)
    monkeypatch.setattr(host_pool, "_run_chunk", counting)
    got3 = find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt)
    assert len(calls) == 2, calls
    for a, b in zip(_cols(got3), _cols(want)):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_refuses_mismatched_inputs(tmp_path):
    graph = _graph()
    ckpt = str(tmp_path / "find_ckpt")
    find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt)

    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, 9, n_workers=1, checkpoint_dir=ckpt)

    other = Graph.from_dicts({1: "ACTGACTGACTG"}, {}, [1])
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(other, 7, n_workers=1, checkpoint_dir=ckpt)

    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt,
                            max_variant_nodes=2)

    # allele frequencies feed the rows-mode output: a graph refresh
    # that ONLY changes AFs must also be refused
    graph_af = _graph()
    graph_af.allele_frequencies = (
        np.asarray(graph_af.allele_frequencies) * 0.5).astype(np.float32)
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph_af, 7, n_workers=1, checkpoint_dir=ckpt)

    # numpy-scalar and set kwargs pin by VALUE, not type name
    ckpt2 = str(tmp_path / "np_ckpt")
    find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt2,
                        max_variant_nodes=np.int64(4))
    find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt2,
                        max_variant_nodes=np.int64(4))  # same: resumes
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt2,
                            max_variant_nodes=np.int64(2))
    ckpt3 = str(tmp_path / "set_ckpt")
    find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt3,
                        only_store_nodes={1, 2})
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt3,
                            only_store_nodes={3, 4})

    # a checkpoint from an older meta format is refused by version
    import json
    meta_path = tmp_path / "np_ckpt" / "meta.json"
    old = json.loads(meta_path.read_text())
    old["version"] = 1
    meta_path.write_text(json.dumps(old))
    with pytest.raises(ValueError, match="format 1"):
        find_kmers_parallel(graph, 7, n_workers=1, checkpoint_dir=ckpt2,
                            max_variant_nodes=np.int64(4))


def test_checkpoint_pins_whitelist_and_critical_path_content(tmp_path):
    """Non-scalar inputs are pinned by CONTENT: a whitelist with
    different kmers, or a critical-paths object with the same count but
    different cut points, must refuse the dir — not merge stale
    chunks."""
    from graph_kmer_index_tpu import (
        CollisionFreeKmerIndex, CriticalGraphPaths, DenseKmerFinder,
        FlatKmers)
    graph = _graph()
    k = 7

    def whitelist_of(kmers):
        flat = FlatKmers(np.asarray(kmers, np.uint64),
                         np.ones(len(kmers), np.uint32),
                         np.arange(len(kmers), dtype=np.uint64))
        return CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=97)

    ckpt = str(tmp_path / "wl_ckpt")
    find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt,
                        whitelist=whitelist_of([11, 22, 33]))
    # same whitelist content: resumes fine
    find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt,
                        whitelist=whitelist_of([11, 22, 33]))
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt,
                            whitelist=whitelist_of([44, 55, 66]))

    ckpt2 = str(tmp_path / "cp_ckpt")
    cps = CriticalGraphPaths.from_graph(graph, k)
    find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt2,
                        critical_paths=cps)
    bent = CriticalGraphPaths(np.asarray(cps.nodes).copy(),
                              np.asarray(cps.offsets).copy())
    bent.offsets[0] += 1  # same count, different cut point
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt2,
                            critical_paths=bent)


def test_checkpointed_device_find_spans_mode(tmp_path, monkeypatch):
    """The span-tape (device finalize) path checkpoints its compact
    representation; a full resume re-expands to identical rows without
    re-walking anything."""
    graph = _graph()
    k = 7
    want = find_kmers_parallel(graph, k, n_workers=1)
    ckpt = str(tmp_path / "span_ckpt")
    got = find_kmers_parallel_device(graph, k, n_workers=1,
                                     checkpoint_dir=ckpt)
    for a, b in zip(_cols(got), _cols(want)):
        np.testing.assert_array_equal(np.asarray(a), b)

    def boom(chunk):
        raise AssertionError("span chunk recomputed on full resume")
    monkeypatch.setattr(host_pool, "_run_chunk_spans", boom)
    got2 = find_kmers_parallel_device(graph, k, n_workers=1,
                                      checkpoint_dir=ckpt)
    for a, b in zip(_cols(got2), _cols(want)):
        np.testing.assert_array_equal(np.asarray(a), b)

    # rows- and spans-mode checkpoints must not mix
    with pytest.raises(ValueError, match="different inputs"):
        find_kmers_parallel(graph, k, n_workers=1, checkpoint_dir=ckpt)
