"""Host-side multiprocess worklist sharding for the finder control plane.

The graph traversal control plane is irreducibly host-side (irregular
DFS); the reference scales it with fork() + POSIX-shm worklist splits
(command_line_interface.py:574-623). Here: fork-shared graph (copy-on-
write, no serialization), critical-path chunks as the work units — the
chunks are independent by construction (a k-window cannot span a
critical point, SURVEY.md §5.7) — and a host concatenate of FlatKmers.
Workers hash with the native C++ rolling kernel; the accelerator stays
free for the index build that follows the merge.
"""
from __future__ import annotations

import logging
import multiprocessing as mp

import numpy as np

from ..critical_paths import CriticalGraphPaths
from ..finder import DenseKmerFinder
from ..flat_kmers import FlatKmers

_WORKER_STATE: dict = {}


def _accelerator_backend_live() -> bool:
    """True if a non-CPU jax backend has already been initialized in this
    process (private-API probe, deliberately non-initializing)."""
    try:
        from jax._src import xla_bridge
        backends = getattr(xla_bridge, "_backends", {})
        return any(name != "cpu" for name in backends)
    except Exception:
        return False


def _init_worker(graph, k, critical_paths, position_id, finder_kwargs):
    _WORKER_STATE.update(graph=graph, k=k, critical_paths=critical_paths,
                         position_id=position_id,
                         finder_kwargs=finder_kwargs)


def _run_chunk(chunk):
    start, stop = chunk
    s = _WORKER_STATE
    finder = DenseKmerFinder(
        s["graph"], s["k"], critical_graph_paths=s["critical_paths"],
        position_id=s["position_id"],
        start_at_critical_path_number=start,
        stop_at_critical_path_number=stop,
        use_device=False,  # workers stay off-device; parent owns the chip
        **s["finder_kwargs"])
    finder.find()
    flat = finder.get_flat_kmers(v="1")
    return (np.asarray(flat._hashes), np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets),
            np.asarray(flat._allele_frequencies))


_MAP_FN = None


def _init_map_worker(fn):
    global _MAP_FN
    _MAP_FN = fn


def _run_map_chunk(chunk):
    return _MAP_FN(chunk)


def map_over_chunks(fn, chunks, n_workers):
    """Generic fork-pool map over independent work chunks (the reference's
    chunked_imap over VCF-variant chunks, command_line_interface.py:352-364).
    Serial when n_workers <= 1 or an accelerator backend is live."""
    if n_workers > 1 and _accelerator_backend_live():
        logging.warning("accelerator backend already initialized; mapping "
                        "chunks serially (fork would be unsafe)")
        n_workers = 1
    if n_workers <= 1:
        return [fn(c) for c in chunks]
    ctx = mp.get_context("fork")
    with ctx.Pool(n_workers, initializer=_init_map_worker,
                  initargs=(fn,)) as pool:
        return pool.map(_run_map_chunk, chunks)


def find_kmers_parallel(graph, k, n_workers, critical_paths=None,
                        position_id=None, chunks_per_worker=20,
                        **finder_kwargs):
    """Full-graph DenseKmerFinder sharded over ``n_workers`` processes.

    Returns FlatKmers identical (same rows, chunk-concatenation order) to
    the reference CLI's multiprocess ``index -t N`` merge
    (command_line_interface.py:601-616).
    """
    if critical_paths is None:
        critical_paths = CriticalGraphPaths.from_graph(graph, k)
    if position_id is None:
        from ..graph import PositionId
        position_id = PositionId.from_graph(graph)

    n_paths = len(critical_paths)
    n_chunks = min(max(1, n_workers * chunks_per_worker), max(1, n_paths))
    per = max(1, n_paths // n_chunks)
    starts = list(range(0, n_paths, per))
    ends = starts[1:] + [n_paths]
    chunks = list(zip(starts, ends))
    logging.info("find_kmers_parallel: %d paths in %d chunks over %d workers",
                 n_paths, len(chunks), n_workers)

    if n_workers > 1 and _accelerator_backend_live():
        # fork() after an accelerator backend initialized can deadlock the
        # child (inherited device state). The safe pattern is pool-before-
        # first-jax-op; fall back to serial otherwise.
        logging.warning("accelerator backend already initialized; running "
                        "worklist serially (fork would be unsafe)")
        n_workers = 1

    if n_workers <= 1:
        _init_worker(graph, k, critical_paths, position_id, finder_kwargs)
        results = [_run_chunk(c) for c in chunks]
    else:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_workers, initializer=_init_worker,
                      initargs=(graph, k, critical_paths, position_id,
                                finder_kwargs)) as pool:
            results = pool.map(_run_chunk, chunks)

    return FlatKmers.from_multiple_flat_kmers(
        [FlatKmers(h, n, r, a) for h, n, r, a in results])
