"""Full-output differential at ~20 Mb (VERDICT r4 item 3).

The scale acceptances (150/200/500 Mb) bit-check sampled 40-path
windows; complete row equality had only ever been run at <=2 Mb
(bench_head_to_head.py). This closes the gap between "sampled" and
"proven" ON THE ACCEPTANCE CODE PATH: a ~20 Mb / ~80 k-variant graph
(same generator, density and finder configuration as
bench_chromosome.py), the REFERENCE DenseKmerFinder run to COMPLETION
(no time-box), and complete row equality asserted over every FlatKmers
column — for the streamed-device-finalize pooled find (the acceptance
path) AND the native single-process find, plus built-index query
equality and the SnpKmerFinder sweep at the same scale.

Writes one JSON record per stage; intended to be captured to
benchmarks/logs_r5_full_differential_20m.jsonl. Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/bench_full_differential.py [n_bases] [n_variants]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000
    k = 31

    from reference_harness import load_reference
    ref = load_reference()

    import jax

    from graph_kmer_index_tpu import DenseKmerFinder, KmerIndex, \
        SnpKmerFinder
    from graph_kmer_index_tpu.critical_paths import CriticalGraphPaths
    from graph_kmer_index_tpu.parallel.host_pool import (
        find_kmers_parallel_device)
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    t0 = time.perf_counter()
    graph, _ = random_snp_graph(n_bases, n_variants, seed=0,
                                indel_fraction=0.1)
    cpaths = CriticalGraphPaths.from_graph(graph, k)
    rec("graph_build", round(time.perf_counter() - t0, 1), "s",
        n_bases=n_bases, n_variants=n_variants, n_nodes=graph.n_nodes(),
        backend=jax.default_backend())

    # -- our finds: the acceptance path (pooled + streamed device
    # finalize) and the native single-process path ------------------------
    t0 = time.perf_counter()
    flat_acc = find_kmers_parallel_device(
        graph, k, n_workers=4, critical_paths=cpaths,
        max_variant_nodes=4)
    jax.block_until_ready(flat_acc._hashes)
    t_acc = time.perf_counter() - t0
    n_rows = len(flat_acc._hashes)
    rec("our_find_acceptance_path", round(t_acc, 1), "s", rows=n_rows,
        rows_per_s=round(n_rows / t_acc))

    t0 = time.perf_counter()
    f = DenseKmerFinder(graph, k=k, max_variant_nodes=4)
    f.find(use_native=True)
    flat_nat = f.get_flat_kmers(v="1")
    t_nat = time.perf_counter() - t0
    rec("our_find_native", round(t_nat, 1), "s", rows=len(flat_nat))

    # -- reference find, to completion (NO time-box) ----------------------
    t0 = time.perf_counter()
    rf = ref.DenseKmerFinder(graph, k=k, max_variant_nodes=4)
    rf.find()
    flat_ref = rf.get_flat_kmers(v="1")
    t_ref = time.perf_counter() - t0
    rec("reference_find_complete", round(t_ref, 1), "s",
        rows=len(flat_ref._hashes),
        speedup_acceptance_path=round(t_ref / t_acc, 1),
        speedup_native=round(t_ref / t_nat, 1))

    # -- complete row equality, every column, both of our paths -----------
    cols_ref = (np.asarray(flat_ref._hashes).astype(np.uint64),
                np.asarray(flat_ref._nodes).astype(np.int64),
                np.asarray(flat_ref._ref_offsets).astype(np.uint64),
                np.asarray(flat_ref._allele_frequencies, np.float32))
    for name, ours in (("acceptance", flat_acc), ("native", flat_nat)):
        cols = (np.asarray(ours._hashes).astype(np.uint64),
                np.asarray(ours._nodes).astype(np.int64),
                np.asarray(ours._ref_offsets).astype(np.uint64),
                np.asarray(ours._allele_frequencies, np.float32))
        eq = [bool(np.array_equal(a, b)) for a, b in zip(cols_ref, cols)]
        rec(f"rows_equal_{name}", all(eq), "bool", rows=len(cols[0]),
            columns=dict(zip(("hashes", "nodes", "ref_offsets",
                              "allele_frequencies"), eq)))
        assert all(eq), f"{name} differs from reference: {eq}"

    # -- built-index equality ---------------------------------------------
    modulo = 40_000_003
    # the reference's ediff1d(to_begin=1) rejects uint64 under numpy 2;
    # its own finder emits int64 hashes — feed it the same
    rflat = ref.FlatKmers(cols_ref[0].astype(np.int64), cols_ref[1],
                          cols_ref[2].astype(np.int64), cols_ref[3])
    t0 = time.perf_counter()
    ref_idx = ref.CollisionFreeKmerIndex.from_flat_kmers(rflat,
                                                         modulo=modulo)
    t_ref_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    our_idx = KmerIndex.from_flat_kmers(flat_acc, modulo=modulo)
    from accept_common import sync_index_arrays
    sync_index_arrays(our_idx)
    t_our_b = time.perf_counter() - t0
    # reference sorts with an UNSTABLE argsort
    # (collision_free_kmer_index.py:435): compare row multisets and
    # per-query node/offset sets over EVERY distinct kmer
    assert np.array_equal(np.sort(np.asarray(ref_idx._kmers)),
                          np.sort(np.asarray(our_idx._kmers,
                                             dtype=np.int64)))
    qs = np.unique(cols_ref[0])
    ours_nodes, ours_offs, _ = \
        our_idx.get_nodes_and_ref_offsets_from_multiple_kmers(
            qs, max_hits=10 ** 9)[:3]
    ref_nodes, ref_offs, _ = \
        ref_idx.get_nodes_and_ref_offsets_from_multiple_kmers(
            qs, max_hits=10 ** 9)[:3]
    pairs_ours = np.stack([np.asarray(ours_nodes, np.int64),
                           np.asarray(ours_offs, np.int64)])
    pairs_ref = np.stack([np.asarray(ref_nodes, np.int64),
                          np.asarray(ref_offs, np.int64)])
    eq_q = bool(np.array_equal(
        pairs_ours[:, np.lexsort(pairs_ours)],
        pairs_ref[:, np.lexsort(pairs_ref)]))
    rec("index_query_equal_all_kmers", eq_q, "bool",
        distinct_kmers=len(qs), ref_build_s=round(t_ref_b, 1),
        our_build_s=round(t_our_b, 1))
    assert eq_q, "built-index query results differ"

    # -- SnpKmerFinder sweep at the same scale ----------------------------
    t0 = time.perf_counter()
    flat_rs = ref.SnpKmerFinder(graph, k=k).find_kmers()
    t_ref_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    flat_os = SnpKmerFinder(graph, k=k).find_kmers()
    t_our_s = time.perf_counter() - t0
    eq_s = [bool(np.array_equal(np.asarray(getattr(flat_rs, a)),
                                np.asarray(getattr(flat_os, a))))
            for a in ("_hashes", "_nodes", "_ref_offsets")]
    rec("snp_rows_equal", all(eq_s), "bool", rows=len(flat_rs._hashes),
        ref_s=round(t_ref_s, 1), ours_s=round(t_our_s, 1),
        speedup=round(t_ref_s / t_our_s, 1))
    assert all(eq_s), f"snp sweep differs: {eq_s}"

    rec("full_differential_20m", True, "bool", rows_equal=True,
        rows=n_rows, n_bases=n_bases, n_variants=n_variants)


if __name__ == "__main__":
    main()
