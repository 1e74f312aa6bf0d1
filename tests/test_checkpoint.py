"""Sharded index checkpoint tests (parallel/checkpoint.py).

The reference has nothing to mirror here — it checkpoints whole-array
npz files only (collision_free_kmer_index.py:393-420). The contract
tested instead: save -> load round-trips every shard container
bit-exactly (host- and device-backed), a mesh load serves counts
identical to the single-device index, and torn/foreign files are
rejected loudly.
"""
import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pytest

from graph_kmer_index_tpu import (
    Graph, DenseKmerFinder, CollisionFreeKmerIndex)
from graph_kmer_index_tpu.parallel.sharded import (
    PackedTableShards, TableShards, make_count_step_packed,
    make_count_step, build_packed_shards_sharded)
from graph_kmer_index_tpu.parallel.checkpoint import (
    save_shards, load_shards, manifest_path, shard_path)


def _toy_index():
    graph = Graph.from_dicts(
        {1: "ACTGACTGTCTAGGACTGAC", 2: "A", 3: "G", 4: "CCCTACTGTTTAGTCA"},
        {1: [2, 3], 2: [4], 3: [4]}, [1, 2, 4])
    finder = DenseKmerFinder(graph, k=5)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    return graph, flat, CollisionFreeKmerIndex.from_flat_kmers(
        flat, modulo=211)


def _reads_and_expected(graph, index, k=5):
    from graph_kmer_index_tpu.ops.encode import sliding_hashes
    rng = np.random.default_rng(2)
    ref_seq = np.concatenate([graph.get_numeric_node_sequence(v)
                              for v in [1, 2, 4]])
    reads = np.stack([
        np.resize(np.roll(ref_seq, -int(s)), 16) for s in
        rng.integers(0, len(ref_seq), 8)]).astype(np.int32)
    hashes = np.asarray(sliding_hashes(jnp.asarray(reads.reshape(-1)), k))
    pos = np.arange(reads.size) % reads.shape[1]
    valid = pos <= reads.shape[1] - k
    expected = index.map_kmers(hashes[valid].astype(np.uint64),
                               graph.n_nodes())
    return reads, expected


def test_packed_roundtrip_host(tmp_path):
    _, _, index = _toy_index()
    for n_table in (1, 2, 8):
        want = PackedTableShards.from_index(index, n_table)
        prefix = str(tmp_path / f"packed{n_table}")
        paths = save_shards(want, prefix)
        assert len(paths) == n_table + 1  # shards + manifest
        assert manifest_path(prefix) in paths
        got = load_shards(prefix)
        assert isinstance(got, PackedTableShards)
        for attr in ("m2_local", "modulo2", "max_scan", "n_table",
                     "has_dup"):
            assert getattr(got, attr) == getattr(want, attr), attr
        np.testing.assert_array_equal(got.records, want.records)
        np.testing.assert_array_equal(got.row_kmers, want.row_kmers)
        np.testing.assert_array_equal(got.row_nodes, want.row_nodes)


def test_csr_roundtrip_host(tmp_path):
    _, _, index = _toy_index()
    want = TableShards.from_index(index, 4)
    prefix = str(tmp_path / "csr")
    save_shards(want, prefix)
    got = load_shards(prefix)
    assert isinstance(got, TableShards)
    for attr in ("m_local", "modulo", "max_scan", "n_table"):
        assert getattr(got, attr) == getattr(want, attr), attr
    np.testing.assert_array_equal(got.starts, want.starts)
    np.testing.assert_array_equal(got.sizes, want.sizes)
    np.testing.assert_array_equal(got.row_kmers, want.row_kmers)
    np.testing.assert_array_equal(got.row_nodes, want.row_nodes)


def test_packed_mesh_load_serves_counts(tmp_path):
    """Loading straight onto a 2-D mesh (each table device's columns
    materialized by the callback) must serve counts identical to the
    single-device index — the multi-host serving path."""
    k = 5
    graph, _, index = _toy_index()
    reads, expected = _reads_and_expected(graph, index, k)

    prefix = str(tmp_path / "serve")
    save_shards(PackedTableShards.from_index(index, 2), prefix)

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "table"))
    shards = load_shards(prefix, mesh=mesh)
    assert isinstance(shards.records, jax.Array)
    step = make_count_step_packed(mesh, shards, graph.n_nodes(), k)
    reads_j = jax.device_put(jnp.asarray(reads),
                             NamedSharding(mesh, P("data", None)))
    got = np.asarray(step(reads_j, shards.records, shards.row_kmers,
                          shards.row_nodes))
    np.testing.assert_array_equal(got, expected)


def test_csr_mesh_load_serves_counts(tmp_path):
    k = 5
    graph, _, index = _toy_index()
    reads, expected = _reads_and_expected(graph, index, k)

    prefix = str(tmp_path / "csr_serve")
    save_shards(TableShards.from_index(index, 4), prefix)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "table"))
    shards = load_shards(prefix, mesh=mesh)
    step = make_count_step(mesh, shards, graph.n_nodes(), k)
    reads_j = jax.device_put(jnp.asarray(reads),
                             NamedSharding(mesh, P("data", None)))
    got = np.asarray(step(reads_j, shards.starts, shards.sizes,
                          shards.row_kmers, shards.row_nodes))
    np.testing.assert_array_equal(got, expected)


def test_device_built_shards_save_from_jax_arrays(tmp_path):
    """Saving a DEVICE-RESIDENT shard set (straight from the sharded
    build, the multi-process production path) exercises the
    addressable-shards writer; the loaded checkpoint must equal the
    device arrays exactly."""
    _, _, index = _toy_index()
    kmers = np.asarray(index._kmers, dtype=np.uint64)
    nodes = np.asarray(index._nodes, dtype=np.uint32)
    built, _counts = build_packed_shards_sharded(
        kmers, nodes, 8, return_device=True)
    assert isinstance(built.records, jax.Array)

    prefix = str(tmp_path / "dev")
    save_shards(built, prefix)
    got = load_shards(prefix)
    np.testing.assert_array_equal(got.records, np.asarray(built.records))
    np.testing.assert_array_equal(got.row_kmers,
                                  np.asarray(built.row_kmers))
    np.testing.assert_array_equal(got.row_nodes,
                                  np.asarray(built.row_nodes))
    assert got.max_scan == built.max_scan
    assert got.has_dup == built.has_dup


def test_load_rejects_mismatches(tmp_path):
    _, _, index = _toy_index()
    want = PackedTableShards.from_index(index, 2)
    prefix = str(tmp_path / "bad")
    save_shards(want, prefix)

    # wrong mesh axis size
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "table"))
    with pytest.raises(ValueError, match="4 devices but"):
        load_shards(prefix, mesh=mesh)

    # torn/foreign shard file: wrong dtype for a column
    with np.load(shard_path(prefix, 0, 2)) as z:
        cols = {k: z[k] for k in z.files}
    cols["row_kmers"] = cols["row_kmers"].astype(np.int32)
    with open(shard_path(prefix, 0, 2), "wb") as f:
        np.savez(f, **cols)
    with pytest.raises(ValueError, match="row_kmers"):
        load_shards(prefix)

    # future version refused
    with np.load(manifest_path(prefix)) as z:
        meta = {k: z[k] for k in z.files}
    meta["version"] = np.int64(999)
    with open(manifest_path(prefix), "wb") as f:
        np.savez(f, **meta)
    with pytest.raises(ValueError, match="version 999"):
        load_shards(prefix)


def test_unpadded_shard_columns_pad_at_load(tmp_path):
    """Out-of-core builders store row columns unpadded; load_shards
    pads to the manifest shape on read (host and mesh paths), and a
    shard LARGER than the manifest is refused."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt

    n_table, m_local, rmax = 2, 8, 6
    rows = [4, 6]
    for t in range(n_table):
        nt = rows[t]
        ckpt._atomic_savez(
            ckpt.shard_path(str(tmp_path / "p"), t, n_table),
            starts=np.zeros(m_local, np.int64),
            sizes=np.zeros(m_local, np.int32),
            row_kmers=np.arange(nt, dtype=np.uint64) + 10 * t,
            row_nodes=np.arange(nt, dtype=np.int32))
    ckpt._atomic_savez(
        ckpt.manifest_path(str(tmp_path / "p")),
        kind="csr", version=ckpt._VERSION, n_table=n_table,
        m_local=m_local, modulo=16, max_scan=1,
        shape_starts=np.asarray([m_local]),
        shape_sizes=np.asarray([m_local]),
        shape_row_kmers=np.asarray([rmax]),
        shape_row_nodes=np.asarray([rmax]))
    got = ckpt.load_shards(str(tmp_path / "p"))
    assert got.row_kmers.shape == (n_table, rmax)
    assert np.array_equal(got.row_kmers[0], [0, 1, 2, 3, 0, 0])
    assert np.array_equal(got.row_kmers[1], [10, 11, 12, 13, 14, 15])
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "table"))
    gm = ckpt.load_shards(str(tmp_path / "p"), mesh=mesh)
    assert np.array_equal(np.asarray(gm.row_kmers),
                          np.asarray(got.row_kmers))

    # an oversized shard must refuse, not truncate
    ckpt._atomic_savez(
        ckpt.shard_path(str(tmp_path / "p"), 0, n_table),
        starts=np.zeros(m_local, np.int64),
        sizes=np.zeros(m_local, np.int32),
        row_kmers=np.arange(rmax + 2, dtype=np.uint64),
        row_nodes=np.arange(rmax + 2, dtype=np.int32))
    import pytest
    with pytest.raises(ValueError, match="manifest says"):
        ckpt.load_shards(str(tmp_path / "p"))
