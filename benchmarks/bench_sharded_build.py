"""Pangenome-scale sharded-build acceptance: >=100 M rows on the 8-device
virtual mesh (VERDICT r3 item 4, ROADMAP item 7 model).

Builds the packed-record table with the build itself sharded
(rows all_to_all'd to bucket-range owners, per-shard local sort +
record scatter — parallel/sharded.py:build_packed_shards_sharded),
asserts bit-equality against the host reference build at full scale,
and serves a mixed query batch from the sharded table, checking
verdicts against numpy ground truth. Prints one JSON record per stage;
the exchange-volume record reports the measured all_to_all payload and
the ROADMAP item-7 model (no original-index payload -> 12 B/row *
capacity_factor).

Replaces (at scale) the reference's whole-index shm fan-out
(collision_free_kmer_index.py:222-232), which cannot shard the build.

Run on the CPU mesh:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_sharded_build.py [n_rows] [n_table]
"""
from __future__ import annotations

import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np


def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_table = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, build_packed_shards_sharded,
        make_member_step_packed)
    from graph_kmer_index_tpu.utils.hugepages import hp_empty

    assert len(jax.devices()) >= 8, "expected the 8-device virtual mesh"

    # synthesize rows: uniform 62-bit hashes (the real distribution —
    # kmer hashes are < 4^31), node ids in a 1M-node space
    t0 = time.perf_counter()
    rng = np.random.default_rng(20260819)
    kmers = hp_empty(n_rows, np.uint64)
    CH = 1 << 24
    for i in range(0, n_rows, CH):
        j = min(n_rows, i + CH)
        kmers[i:j] = rng.integers(0, 1 << 62, j - i, dtype=np.uint64)
    nodes = hp_empty(n_rows, np.uint32)
    nodes[:] = rng.integers(1, 1_000_000, n_rows, dtype=np.uint32)
    rec("synthesize_rows", round(time.perf_counter() - t0, 2), "s",
        n_rows=n_rows)

    # host reference build (the single-process ground truth)
    t0 = time.perf_counter()
    want = PackedTableShards.from_index(
        SimpleNamespace(_kmers=kmers, _nodes=nodes), n_table)
    t_host = time.perf_counter() - t0
    rec("host_packed_build", round(t_host, 2), "s",
        rate_rows_per_s=round(n_rows / t_host),
        modulo2=want.modulo2, max_scan=want.max_scan)

    # sharded build on the virtual mesh
    t0 = time.perf_counter()
    got, counts = build_packed_shards_sharded(kmers, nodes, n_table)
    t_shard = time.perf_counter() - t0
    rec("sharded_packed_build", round(t_shard, 2), "s",
        rate_rows_per_s=round(n_rows / t_shard), n_table=n_table,
        vs_host=round(t_host / t_shard, 2))

    # exchange volume: measured payload vs the ROADMAP item-7 model
    per = -(-n_rows // n_table)
    cap = min(per, int(1.3 * per / n_table) + 1024)
    measured = n_table * n_table * cap * 12  # (u64+u32) per row slot
    model = int(12 * 1.3 * n_rows)
    rec("all_to_all_exchange", measured, "bytes",
        model_bytes=model, ratio=round(measured / model, 3),
        per_shard_rows_int32_headroom=round(per / 2**31, 4))

    # full bit-equality vs the host build
    t0 = time.perf_counter()
    assert got.modulo2 == want.modulo2 and got.m2_local == want.m2_local
    assert got.max_scan == want.max_scan and got.has_dup == want.has_dup
    np.testing.assert_array_equal(got.records, want.records)
    for t in range(n_table):
        m = int(counts[t])
        np.testing.assert_array_equal(got.row_kmers[t, :m],
                                      want.row_kmers[t, :m])
        np.testing.assert_array_equal(got.row_nodes[t, :m],
                                      want.row_nodes[t, :m])
        assert not want.row_kmers[t, m:].any()
    rec("bit_equality", round(time.perf_counter() - t0, 2), "s",
        records_bytes=int(got.records.nbytes), ok=True)

    # serve a mixed batch from the sharded table (1M hits + 1M misses)
    n_q = 2_000_000
    q = np.concatenate([
        kmers[rng.integers(0, n_rows, n_q // 2)],
        rng.integers(0, 1 << 62, n_q // 2, dtype=np.uint64)])
    t0 = time.perf_counter()
    in_table = np.zeros(len(q), bool)
    in_table[:n_q // 2] = True
    miss_half = q[n_q // 2:]
    in_table[n_q // 2:] = np.isin(miss_half, kmers)
    t_truth = time.perf_counter() - t0

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8 // n_table,
                                                      n_table),
                ("data", "table"))
    k = 31
    step = make_member_step_packed(mesh, got, k, from_kmers=True)
    targs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
             for a, spec in ((got.records, P("table", None, None)),
                             (got.row_kmers, P("table", None)),
                             (got.row_nodes, P("table", None)))]
    q_j = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    t0 = time.perf_counter()
    verdicts = np.asarray(step(q_j, *targs))
    t_serve = time.perf_counter() - t0
    assert np.array_equal(verdicts, in_table), "served verdicts diverge"
    rec("sharded_serve_membership", round(n_q / t_serve), "queries/s",
        n_queries=n_q, truth_check_s=round(t_truth, 2), ok=True,
        note="single batch, includes compile")

    # steady-state serve (VERDICT r4 item 4): same compiled step over
    # many same-shape batches — the serving-fleet regime, where compile
    # is amortized to zero. Batches are freshly drawn (no cache reuse);
    # the final scalar fetch syncs the whole chain.
    n_batches = int(os.environ.get("GKI_SERVE_BATCHES", "10"))
    batches = []
    for _ in range(n_batches):
        qb = np.concatenate([
            kmers[rng.integers(0, n_rows, n_q // 2)],
            rng.integers(0, 1 << 62, n_q // 2, dtype=np.uint64)])
        batches.append(qb)
    sharding_q = NamedSharding(mesh, P("data"))
    t0 = time.perf_counter()
    acc = 0
    for qb in batches:
        qj = jax.device_put(jnp.asarray(qb), sharding_q)
        # per-batch sync: letting many 8-device psum batches queue up
        # deadlocks XLA:CPU's InProcessCommunicator (AwaitAndLogIfStuck
        # abort observed); the compile is still amortized
        acc = acc + int(jnp.sum(step(qj, *targs)))
    t_steady = time.perf_counter() - t0
    rec("sharded_serve_membership_steady", round(n_batches * n_q / t_steady),
        "queries/s", n_batches=n_batches, n_queries_per_batch=n_q,
        hits=acc, ok=True)

    # single-device whole-table baseline for the same steady-state load.
    # NB all 8 virtual devices share these host cores, so on the CPU
    # backend this measures SHARDING OVERHEAD, not scaling — the
    # multi-chip scaling claim is the on-chip (relay-gated) measurement.
    t0 = time.perf_counter()
    whole = PackedTableShards.from_index(
        SimpleNamespace(_kmers=kmers, _nodes=nodes), 1)
    t_build1 = time.perf_counter() - t0
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                 ("data", "table"))
    step1 = make_member_step_packed(mesh1, whole, k, from_kmers=True)
    targs1 = [jax.device_put(jnp.asarray(a), NamedSharding(mesh1, spec))
              for a, spec in ((whole.records, P("table", None, None)),
                              (whole.row_kmers, P("table", None)),
                              (whole.row_nodes, P("table", None)))]
    sharding_q1 = NamedSharding(mesh1, P("data"))
    qj = jax.device_put(jnp.asarray(batches[0]), sharding_q1)
    jax.block_until_ready(step1(qj, *targs1))  # compile outside timing
    t0 = time.perf_counter()
    acc1 = 0
    for qb in batches:
        qj = jax.device_put(jnp.asarray(qb), sharding_q1)
        acc1 = acc1 + int(jnp.sum(step1(qj, *targs1)))
    t_steady1 = time.perf_counter() - t0
    assert acc1 == acc, "single-device verdicts diverge from sharded"
    rec("single_device_serve_steady", round(n_batches * n_q / t_steady1),
        "queries/s", build_s=round(t_build1, 2),
        sharded_over_single=round(t_steady1 / t_steady, 2), ok=True)

    rec("sharded_build_acceptance", n_rows, "rows",
        n_table=n_table, ok=True)


if __name__ == "__main__":
    main()
