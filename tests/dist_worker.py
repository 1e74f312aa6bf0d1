"""Worker process for the 2-process ``jax.distributed`` CPU test.

Spawned (twice) by ``tests/test_parallel.py::
test_two_process_distributed_matches_single_process`` with a clean env
(no axon registration, JAX_PLATFORMS=cpu, 4 virtual devices per
process). Each process joins a 2-process / 8-global-device cluster and
runs the two collectives whose single-process behavior is already
pinned — the packed-table sharded count step and the all_gather
FlatKmers merge — asserting bit-equality with host-side serial results.

This is the closest DCN analog this sandbox allows: sharding metadata
and collectives actually cross an OS process boundary (the reference's
L7 is fork+shm, shared_mem.py:123-176; ours claims a process-spanning
superset, so it must be tested at the process boundary).

Usage: dist_worker.py <process_id> <coordinator_port>
Prints ``DIST_WORKER_OK pid=N`` on success; ``DIST_UNSUPPORTED: <why>``
(exit 0) if the backend refuses multi-process CPU so the parent test
can skip with a reason.
"""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid,
            local_device_ids=[0, 1, 2, 3])
    except Exception as e:  # backend refuses multi-process CPU
        print(f"DIST_UNSUPPORTED: {type(e).__name__}: {e}", flush=True)
        return
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    def make_global(mesh, spec, host):
        """Global array from identical host data in every process."""
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    # --- A: packed-table sharded count step (data axis spans processes)
    from graph_kmer_index_tpu import DenseKmerFinder, KmerIndex
    from graph_kmer_index_tpu.graph import Graph
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, make_count_step_packed,
        merge_flat_kmers_all_gather)

    k = 5
    graph = Graph.from_dicts(
        {1: "ACTGACTGAC", 2: "A", 3: "G", 4: "CCTGACTGAT"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    finder = DenseKmerFinder(graph, k=k)
    finder.find()
    index = KmerIndex.from_flat_kmers(finder.get_flat_kmers(v="1"),
                                      modulo=4099)
    n_nodes = graph.n_nodes()

    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in (1, 2, 4)])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)

    # serial truth, computed host-side in both processes identically
    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = np.asarray(index.map_kmers(
        hashes[valid].astype(np.uint64), n_nodes))

    # 4 (data) x 2 (table) over the 8 global devices: the data axis
    # spans both processes, the table axis stays intra-process
    devices = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("data", "table"))
    shards = PackedTableShards.from_index(index, 2)
    step = make_count_step_packed(mesh, shards, n_nodes, k)
    got = np.asarray(step(
        make_global(mesh, P("data", None), reads),
        make_global(mesh, P("table", None, None),
                    np.asarray(shards.records)),
        make_global(mesh, P("table", None), np.asarray(shards.row_kmers)),
        make_global(mesh, P("table", None), np.asarray(shards.row_nodes))))
    np.testing.assert_array_equal(got, expected,
                                  err_msg="packed count step")

    # --- B: sharded packed-table BUILD across the process boundary —
    # the all_to_all row exchange itself crosses processes; each worker
    # verifies its ADDRESSABLE shards bit-equal to the host build
    from graph_kmer_index_tpu.parallel.sharded import (
        build_packed_shards_sharded)

    bk = np.asarray(index._kmers, dtype=np.uint64)
    bn = np.asarray(index._nodes, dtype=np.uint32)
    n_real = len(bk)
    n_tab = 8
    pad = (-n_real) % n_tab
    bk_p = np.concatenate([bk, np.zeros(pad, np.uint64)])
    bn_p = np.concatenate([bn, np.zeros(pad, np.uint32)])
    mesh_t = Mesh(np.asarray(jax.devices()), ("table",))
    k_glob = make_global(mesh_t, P("table"), bk_p)
    n_glob = make_global(mesh_t, P("table"), bn_p)
    got, counts = build_packed_shards_sharded(
        k_glob, n_glob, n_tab, n_rows=n_real, return_device=True)
    want = PackedTableShards.from_index(index, n_tab)
    count_by_shard = {}
    for sh in counts.addressable_shards:
        t = sh.index[0].start if sh.index[0].start is not None else 0
        count_by_shard[t] = int(np.asarray(sh.data)[0])
    for arr, ref, name in ((got.records, want.records, "records"),
                           (got.row_kmers, want.row_kmers, "row_kmers"),
                           (got.row_nodes, want.row_nodes, "row_nodes")):
        for sh in arr.addressable_shards:
            t = sh.index[0].start if sh.index[0].start is not None else 0
            local = np.asarray(sh.data)[0]
            if name == "records":
                np.testing.assert_array_equal(
                    local, ref[t], err_msg=f"cross-process {name} {t}")
            else:  # row segments: valid prefix must match the host build
                m = count_by_shard[t]
                np.testing.assert_array_equal(
                    local[:m], ref[t, :m],
                    err_msg=f"cross-process {name} shard {t}")
                assert not ref[t, m:].any(), f"host build pad {name} {t}"

    # --- B2: cross-process checkpoint — each process writes only its
    # ADDRESSABLE shards of the device-built table (parallel/checkpoint
    # .py); process 0 then loads the full set host-side and compares to
    # the host build. A psum barrier orders the load after both saves
    # (the collective cannot complete until both processes dispatched
    # it, i.e. both save_shards calls returned).
    import os
    ckpt = os.environ.get("GKI_DIST_CKPT")
    if ckpt:
        from graph_kmer_index_tpu.parallel.checkpoint import (
            save_shards, load_shards)
        written = save_shards(got, ckpt)
        assert written, "no shard files written by this process"
        ones = make_global(mesh_t, P("table"), np.ones(8, np.int32))
        assert int(jax.jit(jnp.sum)(ones)) == 8  # barrier
        if pid == 0:
            loaded = load_shards(ckpt)
            np.testing.assert_array_equal(loaded.records, want.records,
                                          err_msg="ckpt records")
            # per-shard valid row counts: the same bucket cut
            # from_index uses (rows sorted by internal-modulo bucket,
            # shard boundaries at multiples of m2_local)
            bucket = np.sort(
                (bk % np.uint64(want.modulo2)).astype(np.int64))
            cut = np.searchsorted(
                bucket, np.arange(1, n_tab) * want.m2_local)
            ms = np.diff(np.concatenate([[0], cut, [n_real]]))
            for t in range(n_tab):
                m = int(ms[t])
                np.testing.assert_array_equal(
                    loaded.row_kmers[t, :m], want.row_kmers[t, :m],
                    err_msg=f"ckpt row_kmers shard {t}")
                np.testing.assert_array_equal(
                    loaded.row_nodes[t, :m], want.row_nodes[t, :m],
                    err_msg=f"ckpt row_nodes shard {t}")
            assert loaded.max_scan == want.max_scan
            assert loaded.has_dup == want.has_dup

    # --- B3: serving the checkpoint ACROSS processes — the mesh load's
    # callback reads only THIS process's shard files (manifest from
    # process 0, ordered by the B2 barrier); the table axis spans both
    # processes and the pre-hashed count step must equal the host index
    if ckpt:
        from graph_kmer_index_tpu.parallel.sharded import (
            KMER_PAD, make_count_step_packed)
        mesh_serve = Mesh(np.asarray(jax.devices()).reshape(1, 8),
                          ("data", "table"))
        served = load_shards(ckpt, mesh=mesh_serve)
        kstep = make_count_step_packed(mesh_serve, served, n_nodes, k,
                                       from_kmers=True)
        q = np.where(valid, hashes.astype(np.uint64), KMER_PAD)
        q_dev = make_global(mesh_serve, P("data"), q)
        got_counts = np.asarray(kstep(q_dev, served.records,
                                      served.row_kmers,
                                      served.row_nodes))
        np.testing.assert_array_equal(
            got_counts, expected, err_msg="cross-process ckpt serving")

    # --- C: all_gather FlatKmers merge (1-D mesh over both processes)
    mesh1 = Mesh(np.asarray(jax.devices()), ("data",))
    n = 64
    h = rng.integers(0, 1 << 62, n).astype(np.uint64)
    nd = rng.integers(1, 100, n).astype(np.uint32)
    r = rng.integers(0, 1000, n).astype(np.uint64)
    a = rng.random(n).astype(np.float32)
    merged = merge_flat_kmers_all_gather(
        mesh1, [make_global(mesh1, P("data"), x) for x in (h, nd, r, a)])
    for got_col, want_col, name in zip(merged, (h, nd, r, a),
                                       ("hashes", "nodes", "ref_offsets",
                                        "allele_frequencies")):
        np.testing.assert_array_equal(np.asarray(got_col), want_col,
                                      err_msg=f"all_gather merge {name}")

    print(f"DIST_WORKER_OK pid={pid}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
