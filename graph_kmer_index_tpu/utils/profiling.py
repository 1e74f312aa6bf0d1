"""Profiling harness — expands the reference's 22-line wall-clock script
(run_profile.py:16-21) into reusable span timing plus optional
jax.profiler traces for device work.
"""
from __future__ import annotations

import contextlib
import logging
import time


class Timings:
    """Named wall-clock spans with a report, usable as context managers."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + (
                time.perf_counter() - t)

    def report(self) -> str:
        total = sum(self.spans.values())
        lines = [f"{name:40s} {sec:10.3f}s {100 * sec / max(total, 1e-12):5.1f}%"
                 for name, sec in sorted(self.spans.items(),
                                         key=lambda kv: -kv[1])]
        return "\n".join(lines + [f"{'TOTAL':40s} {total:10.3f}s"])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_dense_finder(graph_file: str, k: int = 31,
                         max_variant_nodes: int = 4) -> float:
    """The reference run_profile.py scenario: full-graph DenseKmerFinder."""
    from ..finder import DenseKmerFinder
    from ..graph import Graph

    graph = Graph.from_file(graph_file)
    t = time.perf_counter()
    finder = DenseKmerFinder(graph, k=k, max_variant_nodes=max_variant_nodes)
    finder.find()
    finder.get_flat_kmers(v="1")
    elapsed = time.perf_counter() - t
    logging.info("Took %.2f sec to find kmers", elapsed)
    return elapsed
