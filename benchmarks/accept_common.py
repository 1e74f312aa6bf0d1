"""Shared stages for the scale-acceptance benchmarks
(bench_chromosome.py / bench_two_chromosomes.py) — one copy of the
honest-attribution barrier and the read-mapping stage, so a timing or
backend-selection fix cannot drift between the two recorded tables.
"""
from __future__ import annotations

import numpy as np


def sync_index_arrays(index):
    """Honest stage attribution: the build's frequency computation is
    dispatched asynchronously — without this barrier it executes inside
    whatever stage first touches the array (round-4 postmortem: it
    smeared ~1/3 of the build into the mapping stage). Scalar fetches,
    not block_until_ready: only a scalar fetch truly syncs on the axon
    backend (CLAUDE.md), and each one-element slice-sum depends on its
    full producer buffer."""
    import jax
    import jax.numpy as jnp
    for a in vars(index).values():
        if isinstance(a, jax.Array) and a.ndim and a.shape[0]:
            float(jnp.sum(a[:1].astype(jnp.float32)))


def choose_map_backend(index, jax_backend: str) -> str:
    """On chip: the device kernel. On the CPU fallback the honest host
    path is the native C++ batched lookup — but record 'native' only
    when the library actually loaded (map_kmers silently falls back to
    the jax path otherwise and the record would lie about both the
    backend and, async dispatch, the time)."""
    if jax_backend == "cpu" and index._native() is not None:
        return "native"
    return "device"


def read_mapping_stage(index, graph, refseq, rng, n_reads, k, map_backend):
    """Hash n_reads 150 bp reads drawn from the linear reference and map
    them; returns (seconds, hits, n_query_kmers). The timed section ends
    on a scalar that depends on the full counts buffer."""
    import time

    import jax.numpy as jnp

    from graph_kmer_index_tpu.ops.encode import read_tape_hashes

    starts = rng.integers(0, len(refseq) - 150, n_reads)
    reads = np.stack([refseq[s:s + 150] for s in starts])
    flatr = reads.reshape(-1).astype(np.int8)
    rstarts = (np.arange(n_reads) * 150).astype(np.int32)
    rlens = np.full(n_reads, 150, np.int32)
    t0 = time.perf_counter()
    hashes_d, nv = read_tape_hashes(
        jnp.asarray(flatr), jnp.asarray(rstarts), jnp.asarray(rlens),
        len(flatr), k)
    if map_backend == "native":
        hq = np.asarray(hashes_d)[:int(nv)]
        counts = index.map_kmers(hq, graph.n_nodes(), backend="native")
        hits = float(np.sum(counts))
    else:
        from graph_kmer_index_tpu.read_kmers import DeviceReadKmers
        kmers_q = DeviceReadKmers([(hashes_d, int(nv))], k)
        counts = index.map_kmers(kmers_q, graph.n_nodes())
        hits = float(jnp.sum(counts))  # scalar fetch INSIDE the timing
    t_map = time.perf_counter() - t0
    return t_map, hits, n_reads * (150 - k + 1)
