"""Chromosome-scale acceptance run (VERDICT r3 item 3).

A 150 Mb variant graph at ~1 variant/250 bp (one human chromosome's
scale; the reference's implied full-genome scale is 3 Gb,
command_line_interface.py:261) pushed through the full pipeline:

  graph build -> pooled find (streamed device finalize) ->
  collision-free device build @ the production modulo 452,930,477
  (command_line_interface.py:95) with per-row frequencies ->
  packed-record table -> read mapping

plus a TIME-BOXED head-to-head of the find stage against the actual
reference implementation (loaded in-process by reference_harness) on the
identical graph, and a sampled-subregion bit-equality check of the two
finders' rows. If the reference exceeds its budget the measured rate is
extrapolated and reported as such (the VERDICT's documented fallback).

Prints one JSON record per stage. Run (CPU fallback when the TPU relay
is down; re-run under the default env on chip):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/bench_chromosome.py [n_bases] [n_variants]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000_000
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    n_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    modulo = int(sys.argv[4]) if len(sys.argv) > 4 else 452_930_477
    ref_budget_s = float(sys.argv[5]) if len(sys.argv) > 5 else 600.0
    k = 31

    import jax
    import jax.numpy as jnp

    from graph_kmer_index_tpu import KmerIndex
    from graph_kmer_index_tpu.critical_paths import CriticalGraphPaths
    from graph_kmer_index_tpu.finder import DenseKmerFinder
    from graph_kmer_index_tpu.parallel.host_pool import (
        find_kmers_parallel_device)
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    backend = jax.default_backend()

    t0 = time.perf_counter()
    graph, _ = random_snp_graph(n_bases, n_variants, seed=0,
                                indel_fraction=0.1)
    rec("graph_build", round(time.perf_counter() - t0, 1), "s",
        n_bases=n_bases, n_variants=n_variants, n_nodes=graph.n_nodes(),
        backend=backend)

    t0 = time.perf_counter()
    cpaths = CriticalGraphPaths.from_graph(graph, k)
    rec("critical_paths", round(time.perf_counter() - t0, 1), "s",
        n_paths=len(cpaths))

    # find: 4 host workers, span tapes streamed into ladder-padded
    # device expansions that overlap the walk (host_pool streaming)
    t0 = time.perf_counter()
    flat = find_kmers_parallel_device(
        graph, k, n_workers=4, critical_paths=cpaths,
        stream_rows_target=24_000_000, stream_tape_target=24_000_000)
    jax.block_until_ready(flat._hashes)
    t_find = time.perf_counter() - t0
    n_rows = len(flat._hashes)
    rec("find_streamed_finalize", round(t_find, 1), "s", rows=n_rows,
        mbases_per_s=round(n_bases / t_find / 1e6, 2),
        rows_per_s=round(n_rows / t_find))

    # collision-free device build at the production modulo, WITH
    # per-row frequencies (the north-star configuration)
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from accept_common import (choose_map_backend, read_mapping_stage,
                               sync_index_arrays)

    t0 = time.perf_counter()
    index = KmerIndex.from_flat_kmers(flat, modulo=modulo)
    sync_index_arrays(index)
    t_build = time.perf_counter() - t0
    rec("device_index_build", round(t_build, 1), "s", modulo=modulo,
        rows_per_s=round(n_rows / t_build))

    dev = index._device()
    t0 = time.perf_counter()
    dev._packed()
    t_packed = time.perf_counter() - t0
    rec("packed_table_build", round(t_packed, 1), "s")

    # read mapping (shared stage, accept_common.py): on chip the device
    # kernel; on the CPU fallback the native C++ batched lookup (the
    # reference's Cython lookup analog, cython_kmer_index.pyx).
    rng = np.random.default_rng(1)
    _, _, refseq = graph.linear_ref_sequence()
    map_backend = choose_map_backend(index, backend)
    t_map, hits, n_q = read_mapping_stage(
        index, graph, refseq, rng, n_reads, k, map_backend)
    rec("read_mapping", round(t_map, 1), "s", n_read_kmers=n_q,
        mkmers_per_s=round(n_q / t_map / 1e6, 2),
        hits_per_query=round(hits / n_q, 2),
        map_backend=map_backend)

    total = sum((t_find, t_build, t_packed, t_map))
    rec("pipeline_total", round(total, 1), "s",
        mbases_per_s=round(n_bases / total / 1e6, 2))

    # ---- time-boxed reference head-to-head on the identical graph ----
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from reference_harness import load_reference
    ref = load_reference()
    ref_cpaths = ref.CriticalGraphPaths.from_graph(graph, k)
    n_paths = len(cpaths)
    step = max(1, n_paths // 2000)  # ~2000 windows: fine-grained budget
    done_paths, done_rows = 0, 0
    t0 = time.perf_counter()
    while done_paths < n_paths and time.perf_counter() - t0 < ref_budget_s:
        stop = min(n_paths, done_paths + step)
        f = ref.DenseKmerFinder(
            graph, k=k, critical_graph_paths=ref_cpaths,
            start_at_critical_path_number=done_paths,
            stop_at_critical_path_number=stop)
        f.find()
        done_rows += len(f.get_flat_kmers(v="1")._hashes)
        done_paths = stop
    t_ref = time.perf_counter() - t0
    frac = done_paths / n_paths
    est_total = t_ref / frac if frac else float("inf")
    # the reference CLI scales the find with a fork pool
    # (command_line_interface.py:574-623); on this 4-core host its best
    # case is ~4x the single-process rate — report both
    rec("reference_find_timeboxed", round(t_ref, 1), "s",
        fraction_done=round(frac, 4), rows_done=done_rows,
        extrapolated_full_s=round(est_total, 1),
        extrapolated_full_4proc_s=round(est_total / 4, 1),
        speedup_vs_ref_1proc=round(est_total / t_find, 1),
        speedup_vs_ref_4proc=round(est_total / 4 / t_find, 1),
        extrapolated=frac < 1.0)

    # ---- sampled-subregion bit-equality: same chunk, both finders ----
    rng2 = np.random.default_rng(7)
    ok_regions = 0
    for start in sorted(rng2.integers(0, max(1, n_paths - 40), 3).tolist()):
        stop = min(n_paths, start + 40)
        fr = ref.DenseKmerFinder(
            graph, k=k, critical_graph_paths=ref_cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop)
        fr.find()
        rflat = fr.get_flat_kmers(v="1")
        fo = DenseKmerFinder(
            graph, k, critical_graph_paths=cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop)
        fo.find()
        oflat = fo.get_flat_kmers(v="1")
        assert np.array_equal(np.asarray(rflat._hashes),
                              np.asarray(oflat._hashes)), start
        assert np.array_equal(np.asarray(rflat._nodes),
                              np.asarray(oflat._nodes)), start
        assert np.array_equal(np.asarray(rflat._ref_offsets),
                              np.asarray(oflat._ref_offsets)), start
        ok_regions += 1
    rec("subregion_bit_equality", ok_regions, "regions", ok=True)

    rec("chromosome_acceptance", n_bases, "bases", rows=n_rows,
        backend=backend, ok=True)


if __name__ == "__main__":
    main()
