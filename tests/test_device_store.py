"""Device-resident object store (replaces the reference's POSIX shm
store; analog of reference tests/test_shared_memory.py round trips)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import Graph
from graph_kmer_index_tpu.parallel.device_store import (
    to_device_memory, from_device_memory, free, free_all)


def test_graph_roundtrip():
    graph = Graph.from_dicts(
        {1: "ACTG", 2: "A", 3: "G", 4: "AAAT"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    to_device_memory(graph, "g1")
    g2 = from_device_memory(Graph, "g1")
    assert np.array_equal(np.asarray(g2.node_sizes),
                          np.asarray(graph.node_sizes))
    assert g2.get_node_sequence(1) == "actg"
    free("g1")


def test_free_all():
    graph = Graph.from_dicts({1: "ACTG"}, {}, [1])
    to_device_memory(graph, "tmp")
    free_all()
    try:
        from_device_memory(Graph, "tmp")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_single_shared_array_roundtrip():
    from graph_kmer_index_tpu.parallel.device_store import (
        SingleSharedArray, to_device_memory, from_device_memory, free)
    a = np.arange(17, dtype=np.int64)
    to_device_memory(SingleSharedArray(a), "t_ssa")
    back = from_device_memory(SingleSharedArray, "t_ssa")
    assert np.array_equal(np.asarray(back.array), a)
    free("t_ssa")


def test_shared_pool_roundtrip():
    from graph_kmer_index_tpu.parallel.host_pool import (
        get_shared_pool, close_shared_pool)
    pool = get_shared_pool(2)
    assert pool is get_shared_pool(2)  # session-global: same object
    try:
        assert sorted(pool.map(abs, [-3, 1, -2])) == [1, 2, 3]
    finally:
        close_shared_pool()
