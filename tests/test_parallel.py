"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Mirrors the reference's parallel-equals-serial strategy
(tests/test_shared_memory.py:22-27, test_collision_free_kmer_index.py:30-34):
every sharded kernel must reproduce the single-device result exactly.
"""
import sys
import pathlib

import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    Graph, DenseKmerFinder, CollisionFreeKmerIndex, FlatKmers)
from graph_kmer_index_tpu.parallel.sharded import (
    has_kmers_sharded, map_kmers_sharded, count_min_sketch_sharded,
    run_sharded_function, TableShards, make_count_step)


def _toy_index():
    graph = Graph.from_dicts(
        {1: "ACTGACTGTCTAGGACTGAC", 2: "A", 3: "G", 4: "CCCTACTGTTTAGTCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    return graph, flat, CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=211)


def test_has_kmers_sharded_matches_serial():
    graph, flat, index = _toy_index()
    queries = np.concatenate([
        np.asarray(flat._hashes[:10], dtype=np.uint64),
        np.array([12345678, 999], dtype=np.uint64)])
    serial = np.array([int(q) in index for q in queries])
    for n_shards in (1, 2, 3, 8):
        got = has_kmers_sharded(index, queries, n_shards=n_shards)
        assert np.array_equal(got, serial), n_shards


def test_map_kmers_sharded_matches_serial():
    graph, flat, index = _toy_index()
    queries = np.asarray(flat._hashes, dtype=np.uint64)
    serial = index.map_kmers(queries, graph.n_nodes())
    for n_shards in (2, 8):
        got = map_kmers_sharded(index, queries, graph.n_nodes(),
                                n_shards=n_shards)
        assert np.array_equal(got, serial)


def test_count_min_sketch_sharded_matches_host():
    rng = np.random.default_rng(1)
    kmers = rng.integers(0, 1 << 40, 1000).astype(np.uint64)
    modulos = [97, 101, 103]
    sketch = count_min_sketch_sharded(kmers, modulos, n_shards=8)
    offset = 0
    for m in modulos:
        expected = np.bincount((kmers % np.uint64(m)).astype(np.int64),
                               minlength=m)
        assert np.array_equal(sketch[offset:offset + m], expected)
        offset += m


def test_run_sharded_function():
    x = np.arange(1000, dtype=np.float64)
    out = run_sharded_function(lambda a: a * 2 + 1, 4, [x])
    assert np.array_equal(out, x * 2 + 1)


def test_run_sharded_function_actually_distributes():
    """Each device must receive only its shard (not the full array): a
    shard-shape-dependent function proves the split, and non-array args
    broadcast. Uneven lengths exercise the pad/trim path."""
    import jax
    n_dev = len(jax.devices())
    assert n_dev >= 2, "virtual mesh missing"
    x = np.arange(999, dtype=np.float64)  # uneven: pads to 1000/8
    out = run_sharded_function(
        lambda a, s: a * a.shape[0] + s, 8, [x, 5.0])
    expected = x * ((999 + ((-999) % n_dev)) // n_dev) + 5.0
    assert np.array_equal(out, expected)


def test_table_sharded_count_step_matches_single_device():
    """2-D (data x table) mesh pipeline == single-device lookup, for every
    viable mesh shape on 8 virtual devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes

    k = 5
    graph, flat, index = _toy_index()
    n_nodes = graph.n_nodes()

    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)

    # single-device expectation via the host index
    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = index.map_kmers(hashes[valid].astype(np.uint64), n_nodes)

    for n_data, n_table in ((4, 2), (2, 4), (8, 1), (1, 8)):
        devices = np.asarray(jax.devices()[:8]).reshape(n_data, n_table)
        mesh = Mesh(devices, ("data", "table"))
        shards = TableShards.from_index(index, n_table)
        step = make_count_step(mesh, shards, n_nodes, k)
        reads_j = jax.device_put(jnp.asarray(reads),
                                 NamedSharding(mesh, P("data", None)))
        targs = [jax.device_put(jnp.asarray(a),
                                NamedSharding(mesh, P("table", None)))
                 for a in (shards.starts, shards.sizes, shards.row_kmers,
                           shards.row_nodes)]
        got = np.asarray(step(reads_j, *targs))
        assert np.array_equal(got, expected), (n_data, n_table)


def test_graft_entry():
    import __graft_entry__ as e
    import jax.numpy as jnp
    fn, args = e.entry()
    out = np.asarray(jax.jit(fn)(*[jnp.asarray(a) for a in args]))
    assert out.sum() > 0
    e.dryrun_multichip(8)


def test_host_pool_parallel_equals_serial():
    """Multiprocess worklist sharding == serial full find (the reference's
    index -t N invariant, command_line_interface.py:574-623)."""
    from graph_kmer_index_tpu.parallel.host_pool import find_kmers_parallel
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    graph, _ = random_snp_graph(3000, 30, seed=7)
    serial = find_kmers_parallel(graph, 7, n_workers=1,
                                 only_save_one_node_per_kmer=True)
    par = find_kmers_parallel(graph, 7, n_workers=3,
                              only_save_one_node_per_kmer=True)
    assert np.array_equal(np.asarray(serial._hashes), np.asarray(par._hashes))
    assert np.array_equal(np.asarray(serial._nodes), np.asarray(par._nodes))
    assert np.array_equal(np.asarray(serial._ref_offsets),
                          np.asarray(par._ref_offsets))


def test_host_pool_subprocess_context_equals_serial():
    """mp_context='spawn' routes to the SubprocessPool (fresh `python -m`
    workers, no __main__ replay — proc_pool.py rationale) and must give
    the identical rows; safe to use after jax is live in THIS process."""
    from graph_kmer_index_tpu.parallel.host_pool import find_kmers_parallel
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    jax.devices()  # backend live: the fork default would refuse this
    graph, _ = random_snp_graph(2000, 20, seed=11)
    serial = find_kmers_parallel(graph, 7, n_workers=1)
    par = find_kmers_parallel(graph, 7, n_workers=2, mp_context="spawn")
    assert np.array_equal(np.asarray(serial._hashes), np.asarray(par._hashes))
    assert np.array_equal(np.asarray(serial._nodes), np.asarray(par._nodes))
    assert np.array_equal(np.asarray(serial._ref_offsets),
                          np.asarray(par._ref_offsets))


def test_subprocess_pool_propagates_worker_errors():
    """A task that raises in the worker must surface as a RuntimeError
    carrying the worker traceback — never a hang or a silent drop."""
    import math
    import pytest
    from graph_kmer_index_tpu.parallel.proc_pool import SubprocessPool

    # math.log pickles by stdlib reference — no dependence on this test
    # module being importable inside the worker
    with SubprocessPool(2) as pool, pytest.raises(RuntimeError,
                                                  match="math domain error"):
        list(pool.imap_unordered(math.log, [(0, 1.0), (1, 0.0), (2, 4.0)]))


def test_merge_flat_kmers_all_gather():
    """all_gather merge == host concatenate (reference
    FlatKmers.from_multiple_flat_kmers, flat_kmers.py:71-90)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from graph_kmer_index_tpu.parallel.sharded import (
        merge_flat_kmers_all_gather)

    rng = np.random.default_rng(3)
    n = 64  # 8 devices x 8 rows
    h = rng.integers(0, 1 << 62, n).astype(np.uint64)
    nd = rng.integers(1, 100, n).astype(np.uint32)
    r = rng.integers(0, 1000, n).astype(np.uint64)
    a = rng.random(n).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    shards = [jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
              for x in (h, nd, r, a)]
    gh, gn, gr, ga = merge_flat_kmers_all_gather(mesh, shards)
    assert np.array_equal(np.asarray(gh), h)
    assert np.array_equal(np.asarray(gn), nd)
    assert np.array_equal(np.asarray(gr), r)
    assert np.array_equal(np.asarray(ga), a)


def test_packed_table_sharded_count_step_matches_single_device():
    """Packed-record 2-D (data x table) mesh pipeline == single-device
    lookup, for every viable mesh shape on 8 virtual devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, make_count_step_packed)

    k = 5
    graph, flat, index = _toy_index()
    n_nodes = graph.n_nodes()
    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)

    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = index.map_kmers(hashes[valid].astype(np.uint64), n_nodes)

    for n_data, n_table in ((4, 2), (2, 4), (8, 1), (1, 8)):
        devices = np.asarray(jax.devices()[:8]).reshape(n_data, n_table)
        mesh = Mesh(devices, ("data", "table"))
        shards = PackedTableShards.from_index(index, n_table)
        step = make_count_step_packed(mesh, shards, n_nodes, k)
        reads_j = jax.device_put(jnp.asarray(reads),
                                 NamedSharding(mesh, P("data", None)))
        targs = [jax.device_put(jnp.asarray(a),
                                NamedSharding(mesh, spec))
                 for a, spec in ((shards.records, P("table", None, None)),
                                 (shards.row_kmers, P("table", None)),
                                 (shards.row_nodes, P("table", None)))]
        got = np.asarray(step(reads_j, *targs))
        assert np.array_equal(got, expected), (n_data, n_table)


def test_packed_sharded_dup2_buckets():
    """A sharded table whose DEEPEST bucket is a size-2 same-kmer
    ("dup2") bucket must still run the scan stage (has_dup flag) —
    otherwise every dup2 hit is silently dropped from the counts."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, make_count_step_packed)

    k = 5
    n_nodes = 30
    # search deterministic seeds for a table with max bucket size == 2
    # AND dup2 buckets: 12 read kmers each stored twice, residues mod
    # the internal modulo collision-free in a fair share of seeds
    for seed in range(200):
        rng = np.random.default_rng(seed)
        reads = rng.integers(0, 4, (1, 16)).astype(np.int32)
        hashes = np.asarray(
            sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
        valid = np.arange(reads.size) <= reads.shape[1] - k
        uniq = np.unique(hashes[valid].astype(np.uint64))
        kmers = np.repeat(uniq, 2)
        nodes = (np.arange(len(kmers), dtype=np.uint32) % (n_nodes - 1)) + 1
        flat = FlatKmers(kmers, nodes,
                         np.arange(len(kmers), dtype=np.uint64))
        index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=101)
        shards = PackedTableShards.from_index(index, 2)
        if shards.max_scan == 2 and shards.has_dup:
            break
    else:
        raise AssertionError("no collision-free seed found")

    expected = np.zeros(n_nodes, dtype=np.int64)
    for q in hashes[valid]:
        hits = index.get(int(q), max_hits=10**9)
        if hits[0] is not None:
            for node in hits[0]:
                expected[node] += 1

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "table"))
    step = make_count_step_packed(mesh, shards, n_nodes, k)
    reads4 = np.repeat(reads, 4, axis=0)  # one row per data shard
    reads_j = jax.device_put(jnp.asarray(reads4),
                             NamedSharding(mesh, P("data", None)))
    targs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
             for a, spec in ((shards.records, P("table", None, None)),
                             (shards.row_kmers, P("table", None)),
                             (shards.row_nodes, P("table", None)))]
    got = np.asarray(step(reads_j, *targs))
    assert np.array_equal(got, 4 * expected)


def test_packed_sharded_member_step_matches_single_device():
    """Packed table-sharded membership == single-device has_kmers, for
    every viable mesh shape (positions past L-k are always False)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, make_member_step_packed)

    k = 5
    graph, flat, index = _toy_index()
    rng = np.random.default_rng(4)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)
    # corrupt half the reads so misses are exercised too
    reads[::2, 3:9] = rng.integers(0, 4, (4, 6))

    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = np.zeros(reads.size, dtype=bool)
    expected[valid] = index.has_kmers(hashes[valid].astype(np.uint64))
    expected = expected.reshape(reads.shape)

    for n_data, n_table in ((4, 2), (2, 4), (8, 1), (1, 8)):
        devices = np.asarray(jax.devices()[:8]).reshape(n_data, n_table)
        mesh = Mesh(devices, ("data", "table"))
        shards = PackedTableShards.from_index(index, n_table)
        step = make_member_step_packed(mesh, shards, k)
        reads_j = jax.device_put(jnp.asarray(reads),
                                 NamedSharding(mesh, P("data", None)))
        targs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
                 for a, spec in ((shards.records, P("table", None, None)),
                                 (shards.row_kmers, P("table", None)),
                                 (shards.row_nodes, P("table", None)))]
        got = np.asarray(step(reads_j, *targs))
        assert np.array_equal(got, expected), (n_data, n_table)


def test_from_kmers_steps_match_reads_steps():
    """Pre-hashed (from_kmers) counts AND membership == the read-matrix
    steps on the same queries, with KMER_PAD padding ignored."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        KMER_PAD, PackedTableShards, TableShards, make_count_step,
        make_count_step_packed, make_member_step_packed)

    k = 5
    graph, flat, index = _toy_index()
    n_nodes = graph.n_nodes()
    rng = np.random.default_rng(4)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)
    reads[::2, 3:9] = rng.integers(0, 4, (4, 6))

    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    queries = hashes[valid].astype(np.uint64)
    want_counts = index.map_kmers(queries, n_nodes)
    want_member = np.asarray(index.has_kmers(queries))

    n_data, n_table = 4, 2
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(n_data, n_table),
                ("data", "table"))
    total = -(-len(queries) // n_data) * n_data
    q = np.full(total, KMER_PAD, dtype=np.uint64)
    q[:len(queries)] = queries
    q_dev = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))

    pshards = PackedTableShards.from_index(index, n_table)
    ptargs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
              for a, spec in ((pshards.records, P("table", None, None)),
                              (pshards.row_kmers, P("table", None)),
                              (pshards.row_nodes, P("table", None)))]
    cstep = make_count_step_packed(mesh, pshards, n_nodes, k,
                                   from_kmers=True)
    np.testing.assert_array_equal(np.asarray(cstep(q_dev, *ptargs)),
                                  want_counts)
    mstep = make_member_step_packed(mesh, pshards, k, from_kmers=True)
    got_m = np.asarray(mstep(q_dev, *ptargs))
    np.testing.assert_array_equal(got_m[:len(queries)], want_member)
    assert not got_m[len(queries):].any()  # padding answers False

    cshards = TableShards.from_index(index, n_table)
    ctargs = [jax.device_put(jnp.asarray(a),
                             NamedSharding(mesh, P("table", None)))
              for a in (cshards.starts, cshards.sizes, cshards.row_kmers,
                        cshards.row_nodes)]
    csr_step = make_count_step(mesh, cshards, n_nodes, k, from_kmers=True)
    np.testing.assert_array_equal(np.asarray(csr_step(q_dev, *ctargs)),
                                  want_counts)


def test_from_kmers_deep_and_dup2_buckets():
    """from_kmers serving through a table with DEEP (>2) and dup2
    (same-kmer size-2) buckets: the scan stage and the dup2 routing
    must behave identically to the read-matrix path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.parallel.sharded import (
        KMER_PAD, PackedTableShards, make_count_step_packed,
        make_member_step_packed)

    rng = np.random.default_rng(11)
    n_nodes = 40
    # multiplicity-heavy rows: kmer i repeated (i % 5 + 1) times => deep
    # buckets up to 5 rows and plenty of dup2 (multiplicity-2) buckets
    uniq = np.unique(rng.integers(0, 1 << 40, 60).astype(np.uint64))
    reps = (np.arange(len(uniq)) % 5) + 1
    kmers = np.repeat(uniq, reps)
    nodes = (np.arange(len(kmers), dtype=np.uint32) % (n_nodes - 1)) + 1
    flat = FlatKmers(kmers, nodes, np.arange(len(kmers), dtype=np.uint64))
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=389)
    shards = PackedTableShards.from_index(index, 2)
    assert shards.max_scan >= 3  # deep buckets present

    queries = np.concatenate([
        uniq, rng.integers(0, 1 << 40, 37).astype(np.uint64)])
    rng.shuffle(queries)
    want_counts = index.map_kmers(queries, n_nodes)
    want_member = np.asarray(index.has_kmers(queries))

    n_data = 4
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(n_data, 2),
                ("data", "table"))
    total = -(-len(queries) // n_data) * n_data
    q = np.full(total, KMER_PAD, dtype=np.uint64)
    q[:len(queries)] = queries
    q_dev = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    targs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
             for a, spec in ((shards.records, P("table", None, None)),
                             (shards.row_kmers, P("table", None)),
                             (shards.row_nodes, P("table", None)))]
    cstep = make_count_step_packed(mesh, shards, n_nodes, 5,
                                   from_kmers=True)
    np.testing.assert_array_equal(np.asarray(cstep(q_dev, *targs)),
                                  want_counts)
    mstep = make_member_step_packed(mesh, shards, 5, from_kmers=True)
    got_m = np.asarray(mstep(q_dev, *targs))
    np.testing.assert_array_equal(got_m[:len(queries)], want_member)


def test_two_process_distributed_matches_single_process(tmp_path):
    """The packed count step and the all_gather FlatKmers merge across
    TWO OS processes via jax.distributed (2 x 4 virtual CPU devices,
    8-device global mesh), bit-equal to host-serial results.

    The in-process virtual mesh never crosses the boundary where
    sharding metadata actually bites; this does — it is the closest DCN
    analog this sandbox allows (reference L7 contract: fork + POSIX shm,
    shared_mem.py:123-176). Assertions live in tests/dist_worker.py."""
    import os
    import socket
    import subprocess

    worker = str(pathlib.Path(__file__).resolve().parent / "dist_worker.py")
    env = dict(os.environ)
    # a fresh interpreter re-runs sitecustomize: drop the axon trigger
    # and give each process 4 virtual CPU devices
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # section B2: cross-process sharded checkpoint into a shared tmp dir
    env["GKI_DIST_CKPT"] = str(tmp_path / "distckpt")

    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    timed_out = False
    try:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                # e.g. one worker refused the backend and exited while
                # the coordinator blocks in initialize(): kill and keep
                # whatever output exists so the skip check still runs
                timed_out = True
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
    finally:
        for p in procs:  # exact PIDs only, never by pattern
            if p.poll() is None:
                p.kill()
                p.wait()

    if any("DIST_UNSUPPORTED" in o for o in outs):
        import pytest
        pytest.skip("backend refuses multi-process CPU: "
                    + next(o for o in outs if "DIST_UNSUPPORTED" in o)
                    .split("DIST_UNSUPPORTED:")[1].strip())
    assert not timed_out, \
        "distributed workers hung past 300s:\n" + "\n---\n".join(outs)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n{out}"
        assert f"DIST_WORKER_OK pid={pid}" in out, f"worker {pid}:\n{out}"


def test_sharded_packed_build_matches_host_build():
    """The all_to_all sharded packed-table build must reproduce
    PackedTableShards.from_index bit-for-bit (records, row segments,
    metadata) and serve identical counts through the 2-D mesh step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, build_packed_shards_sharded,
        make_count_step_packed)

    k = 5
    graph, flat, index = _toy_index()
    n_nodes = graph.n_nodes()
    kmers = np.asarray(index._kmers, dtype=np.uint64)
    nodes = np.asarray(index._nodes, dtype=np.uint32)

    for n_table in (2, 4, 8):
        want = PackedTableShards.from_index(index, n_table)
        got, counts = build_packed_shards_sharded(kmers, nodes, n_table)
        assert got.modulo2 == want.modulo2
        assert got.m2_local == want.m2_local
        assert got.max_scan == want.max_scan
        assert got.has_dup == want.has_dup
        np.testing.assert_array_equal(got.records, want.records,
                                      err_msg=f"records n_table={n_table}")
        for t in range(n_table):
            m = int(counts[t])
            np.testing.assert_array_equal(
                got.row_kmers[t, :m], want.row_kmers[t, :m],
                err_msg=f"row_kmers shard {t}")
            np.testing.assert_array_equal(
                got.row_nodes[t, :m], want.row_nodes[t, :m],
                err_msg=f"row_nodes shard {t}")
            # the remainder of the reference shard is zero padding
            assert not want.row_kmers[t, m:].any()

    # end to end: counts served from the SHARDED-build table == serial
    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)
    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = index.map_kmers(hashes[valid].astype(np.uint64), n_nodes)

    shards, _ = build_packed_shards_sharded(kmers, nodes, 2)
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "table"))
    step = make_count_step_packed(mesh, shards, n_nodes, k)
    from jax.sharding import NamedSharding
    reads_j = jax.device_put(jnp.asarray(reads),
                             NamedSharding(mesh, P("data", None)))
    targs = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
             for a, spec in ((shards.records, P("table", None, None)),
                             (shards.row_kmers, P("table", None)),
                             (shards.row_nodes, P("table", None)))]
    got_counts = np.asarray(step(reads_j, *targs))
    assert np.array_equal(got_counts, expected)


def test_sharded_packed_build_randomized():
    """Randomized sharded-build differential: multiplicity-heavy row
    sets force dup2 buckets and deep buckets through the all_to_all
    exchange; records and row segments must stay bit-equal to the host
    build for every shard count."""
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, build_packed_shards_sharded)

    rng = np.random.default_rng(99)
    for trial in range(4):
        n = int(rng.integers(50, 4000))
        base = rng.integers(0, 1 << 62, max(1, n // 3)).astype(np.uint64)
        kmers = base[rng.integers(0, len(base), n)]  # heavy multiplicity
        nodes = rng.integers(1, 500, n).astype(np.uint32)

        class FakeIndex:
            _kmers = kmers
            _nodes = nodes

        for n_table in (2, 8):
            want = PackedTableShards.from_index(FakeIndex, n_table)
            got, counts = build_packed_shards_sharded(kmers, nodes,
                                                      n_table)
            assert (got.modulo2, got.m2_local, got.max_scan,
                    got.has_dup) == (want.modulo2, want.m2_local,
                                     want.max_scan, want.has_dup), \
                (trial, n_table)
            np.testing.assert_array_equal(
                got.records, want.records,
                err_msg=f"trial {trial} n_table={n_table}")
            for t in range(n_table):
                m = int(counts[t])
                np.testing.assert_array_equal(
                    got.row_kmers[t, :m], want.row_kmers[t, :m])
                np.testing.assert_array_equal(
                    got.row_nodes[t, :m], want.row_nodes[t, :m])


def test_sharded_packed_build_device_resident_input():
    """Device-resident (jax) row arrays must build identically without a
    host round-trip (the production case: rows born in HBM from the
    device finalize feed the sharded build directly)."""
    import jax.numpy as jnp
    from graph_kmer_index_tpu.parallel.sharded import (
        PackedTableShards, build_packed_shards_sharded)

    graph, flat, index = _toy_index()
    kmers = np.asarray(index._kmers, dtype=np.uint64)
    nodes = np.asarray(index._nodes, dtype=np.uint32)
    want = PackedTableShards.from_index(index, 4)
    got, counts = build_packed_shards_sharded(
        jnp.asarray(kmers), jnp.asarray(nodes), 4)
    np.testing.assert_array_equal(got.records, want.records)
    for t in range(4):
        m = int(counts[t])
        np.testing.assert_array_equal(got.row_kmers[t, :m],
                                      want.row_kmers[t, :m])


def test_sharded_csr_build_matches_host_build():
    """build_table_shards_sharded == TableShards.from_index: sizes and
    row segments bit-equal, starts equal wherever sizes > 0 (empty
    buckets carry meaningless re-based offsets in the host build), and
    identical counts through the 2-D mesh step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    from graph_kmer_index_tpu.parallel.sharded import (
        TableShards, build_table_shards_sharded, make_count_step)

    k = 5
    graph, flat, index = _toy_index()
    n_nodes = graph.n_nodes()
    # the sharded CSR build's contract is UNSORTED (emission-order)
    # rows — bucket-sorted input (index rows) skews whole source chunks
    # onto one owner; feed it the flat rows the finder emitted
    kmers = np.asarray(flat._hashes, dtype=np.uint64)
    nodes = np.asarray(flat._nodes, dtype=np.uint32)
    modulo = int(index._modulo)

    for n_table in (2, 4, 8):
        want = TableShards.from_index(index, n_table)
        got, counts = build_table_shards_sharded(kmers, nodes, modulo,
                                                 n_table)
        assert got.m_local == want.m_local
        assert got.max_scan == want.max_scan
        np.testing.assert_array_equal(got.sizes, want.sizes)
        nz = want.sizes > 0
        np.testing.assert_array_equal(got.starts[nz], want.starts[nz],
                                      err_msg=f"starts n_table={n_table}")
        for t in range(n_table):
            m = int(counts[t])
            np.testing.assert_array_equal(got.row_kmers[t, :m],
                                          want.row_kmers[t, :m])
            np.testing.assert_array_equal(got.row_nodes[t, :m],
                                          want.row_nodes[t, :m])

    # counts served from the sharded-built CSR table == serial
    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)
    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = index.map_kmers(hashes[valid].astype(np.uint64), n_nodes)

    shards, _ = build_table_shards_sharded(kmers, nodes, modulo, 2)
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "table"))
    step = make_count_step(mesh, shards, n_nodes, k)
    reads_j = jax.device_put(jnp.asarray(reads),
                             NamedSharding(mesh, P("data", None)))
    targs = [jax.device_put(jnp.asarray(a),
                            NamedSharding(mesh, P("table", None)))
             for a in (shards.starts, shards.sizes, shards.row_kmers,
                       shards.row_nodes)]
    got_counts = np.asarray(step(reads_j, *targs))
    assert np.array_equal(got_counts, expected)


def test_frequencies_sharded_matches_device():
    """Sharded distinct-ref-offset frequencies == the single-device /
    host computation, on random multiplicity-heavy rows including
    ref offsets past 2^32 (the wide-key regime)."""
    from graph_kmer_index_tpu.ops.build import frequencies_device
    from graph_kmer_index_tpu.parallel.sharded import frequencies_sharded

    rng = np.random.default_rng(17)
    for trial in range(4):
        n = int(rng.integers(10, 3000))
        base = rng.integers(0, 1 << 62, max(1, n // 4)).astype(np.uint64)
        kmers = base[rng.integers(0, len(base), n)]
        hi = (1 << 33) if trial % 2 else (1 << 20)
        offs = rng.integers(0, hi, n).astype(np.uint64)
        # duplicate pairs too (same kmer+offset must count once)
        if n > 10:
            offs[1::7] = offs[0]
            kmers[1::7] = kmers[0]
        want = np.asarray(frequencies_device(kmers, offs))
        for n_shards in (2, 8):
            got = frequencies_sharded(kmers, offs, n_shards)
            np.testing.assert_array_equal(
                got, want, err_msg=f"trial {trial} shards {n_shards}")
    assert frequencies_sharded(np.zeros(0, np.uint64),
                               np.zeros(0, np.uint64)).shape == (0,)
