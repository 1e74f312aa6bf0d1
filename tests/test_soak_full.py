"""Deep randomized soak: N random SNP/indel graphs, three differential
oracles per trial —

1. python span walker vs native C++ walker (row-for-row),
2. DenseKmerFinder vs the ACTUAL reference implementation (row-for-row,
   when /root/reference is present),
3. SnpKmerFinder vectorized sweep vs the reference (row-for-row).

Trial count scales with GKI_SOAK_TRIALS (default keeps CI fast; the
full 10k-graph pass runs out of band: GKI_SOAK_TRIALS=10000 python -m
pytest tests/test_soak_full.py).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(
    pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))

from graph_kmer_index_tpu import DenseKmerFinder, SnpKmerFinder
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

N_TRIALS = int(os.environ.get("GKI_SOAK_TRIALS", "300"))  # 10k pass: 124s, green
SOAK_SEED = int(os.environ.get("GKI_SOAK_SEED", "1234"))
_HAVE_REF = os.path.exists("/root/reference")


def _rows(flat):
    return (np.asarray(flat._hashes), np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets))


def test_soak_walker_and_reference_differential():
    ref = None
    if _HAVE_REF:
        from reference_harness import load_reference
        ref = load_reference()
    rng = np.random.default_rng(SOAK_SEED)
    for trial in range(N_TRIALS):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([3, 5, 7, 16, 31]))
        n_bases = int(rng.integers(60, 260))
        n_var = int(rng.integers(1, 8))
        graph, _ = random_snp_graph(
            n_bases, n_var, seed=seed,
            indel_fraction=float(rng.choice([0.0, 0.3, 0.7])))
        mvn = int(rng.integers(2, 6))
        ctx = f"trial={trial} seed={seed} k={k} mvn={mvn}"

        ours = DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
        ours.find(use_native=False)
        rows_py = _rows(ours.get_flat_kmers(v="1"))

        nat = DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
        nat.find(use_native=True)
        rows_nat = _rows(nat.get_flat_kmers(v="1"))
        for a, b in zip(rows_py, rows_nat):
            np.testing.assert_array_equal(a, b, err_msg=f"native {ctx}")

        if ref is not None:
            theirs = ref.DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
            theirs.find()
            rows_ref = _rows(theirs.get_flat_kmers(v="1"))
            for a, b in zip(rows_py, rows_ref):
                np.testing.assert_array_equal(a, b,
                                              err_msg=f"reference {ctx}")

            ours_s = SnpKmerFinder(graph, k=k).find_kmers()
            theirs_s = ref.SnpKmerFinder(graph, k=k).find_kmers()
            for a, b in zip(_rows(ours_s), _rows(theirs_s)):
                np.testing.assert_array_equal(a, b, err_msg=f"snp {ctx}")


def test_soak_sharded_checkpoint_serve(tmp_path):
    """Scale soak of the full multi-chip serving loop: random
    multiplicity-skewed rows -> SHARDED table build (all_to_all) ->
    checkpoint -> mesh load -> from_kmers counts AND membership, all
    bit-equal to the host index on hit+miss queries. Row count scales
    with GKI_SCALE_ROWS (default keeps CI fast; out-of-band:
    GKI_SCALE_ROWS=2000000)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graph_kmer_index_tpu import CollisionFreeKmerIndex, FlatKmers
    from graph_kmer_index_tpu.parallel.checkpoint import (
        load_shards, save_shards)
    from graph_kmer_index_tpu.parallel.sharded import (
        KMER_PAD, build_packed_shards_sharded, make_count_step_packed,
        make_member_step_packed)

    n_rows = int(os.environ.get("GKI_SCALE_ROWS", "120000"))
    rng = np.random.default_rng(SOAK_SEED)
    kmers = rng.integers(0, 1 << 62, n_rows).astype(np.uint64)
    # multiplicity skew: ~10% of rows duplicate another row's kmer,
    # forcing dup2 and deep buckets through the exchange
    kmers[rng.integers(0, n_rows, n_rows // 10)] = \
        kmers[rng.integers(0, n_rows, n_rows // 10)]
    n_nodes = 1000
    nodes = rng.integers(1, n_nodes, n_rows).astype(np.uint32)
    flat = FlatKmers(kmers, nodes, np.arange(n_rows, dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=2_000_003)

    n_table = 4
    built, _ = build_packed_shards_sharded(
        np.asarray(index._kmers, np.uint64),
        np.asarray(index._nodes, np.uint32), n_table)
    prefix = str(tmp_path / "scale")
    save_shards(built, prefix)

    n_data = len(jax.devices()) // n_table
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_data, n_table),
                ("data", "table"))
    served = load_shards(prefix, mesh=mesh)

    n_q = min(n_rows, 100_000)
    queries = np.concatenate([
        rng.choice(kmers, n_q // 2),
        rng.integers(0, 1 << 62, n_q - n_q // 2).astype(np.uint64)])
    rng.shuffle(queries)
    want_counts = index.map_kmers(queries, n_nodes)
    want_member = np.asarray(index.has_kmers(queries))

    total = -(-len(queries) // n_data) * n_data
    q = np.full(total, KMER_PAD, dtype=np.uint64)
    q[:len(queries)] = queries
    q_dev = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    targs = (served.records, served.row_kmers, served.row_nodes)
    cstep = make_count_step_packed(mesh, served, n_nodes, 31,
                                   from_kmers=True)
    np.testing.assert_array_equal(np.asarray(cstep(q_dev, *targs)),
                                  want_counts)
    mstep = make_member_step_packed(mesh, served, 31, from_kmers=True)
    got_m = np.asarray(mstep(q_dev, *targs))
    np.testing.assert_array_equal(got_m[:len(queries)], want_member)
