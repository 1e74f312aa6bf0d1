"""Out-of-core (bucket-range spill) build == monolithic build.

The contract mirrors the sharded-build tests: every decomposition of the
index build must reproduce the single-piece result bit-for-bit
(reference invariant: the index -t N merge equals one big find+build,
command_line_interface.py:574-623 / collision_free_kmer_index.py:422-467).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import CollisionFreeKmerIndex
from graph_kmer_index_tpu.parallel.host_pool import find_kmers_parallel
from graph_kmer_index_tpu.parallel.oocbuild import (
    SpillWriter, build_shards_from_spills, find_and_build_out_of_core,
    index_from_shard_checkpoint)
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

MODULO = 1009
K = 7


def _fixture(seed=13):
    graph, _ = random_snp_graph(4000, 50, seed=seed, indel_fraction=0.3)
    flat = find_kmers_parallel(graph, K, n_workers=1)
    mono = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=MODULO,
                                                  use_device=False)
    return graph, flat, mono


def _assert_index_equal(a, b):
    assert np.array_equal(np.asarray(a._kmers, dtype=np.uint64),
                          np.asarray(b._kmers, dtype=np.uint64))
    assert np.array_equal(np.asarray(a._nodes), np.asarray(b._nodes))
    assert np.array_equal(np.asarray(a._ref_offsets, dtype=np.uint64),
                          np.asarray(b._ref_offsets, dtype=np.uint64))
    assert np.array_equal(np.asarray(a._allele_frequencies,
                                     dtype=np.float32),
                          np.asarray(b._allele_frequencies,
                                     dtype=np.float32))
    sa = np.asarray(a._n_kmers, dtype=np.int64)
    sb = np.asarray(b._n_kmers, dtype=np.int64)
    assert np.array_equal(sa, sb)
    nz = sa > 0
    assert np.array_equal(np.asarray(a._hashes_to_index)[nz],
                          np.asarray(b._hashes_to_index)[nz])
    assert np.array_equal(np.asarray(a._frequencies, dtype=np.int64),
                          np.asarray(b._frequencies, dtype=np.int64))


def _spill_flat(spill_dir, flat, n_chunks, n_ranges, modulo=MODULO):
    w = SpillWriter(spill_dir, modulo, n_ranges)
    h = np.asarray(flat._hashes, dtype=np.uint64)
    bounds = np.linspace(0, len(h), n_chunks + 1).astype(int)
    for c in range(n_chunks):
        s = slice(bounds[c], bounds[c + 1])
        w.add_chunk(c, h[s], np.asarray(flat._nodes)[s],
                    np.asarray(flat._ref_offsets)[s],
                    np.asarray(flat._allele_frequencies)[s])
    return w


def test_spill_build_matches_monolithic(tmp_path):
    graph, flat, mono = _fixture()
    for n_ranges in (1, 3, 8):
        d = tmp_path / f"r{n_ranges}"
        _spill_flat(str(d / "spill"), flat, n_chunks=5, n_ranges=n_ranges)
        res = build_shards_from_spills(str(d / "spill"), str(d / "index"))
        assert res["total_rows"] == len(flat)
        ooc = index_from_shard_checkpoint(str(d / "index"))
        _assert_index_equal(ooc, mono)


def test_ooc_shards_match_from_index(tmp_path):
    """Shard container equality vs TableShards.from_index of the
    monolithic build (the serving layout)."""
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.sharded import TableShards

    graph, flat, mono = _fixture()
    n_ranges = 4
    _spill_flat(str(tmp_path / "spill"), flat, 3, n_ranges)
    build_shards_from_spills(str(tmp_path / "spill"),
                             str(tmp_path / "index"))
    got = ckpt.load_shards(str(tmp_path / "index"))
    want = TableShards.from_index(mono, n_ranges)
    assert got.modulo == want.modulo and got.m_local == want.m_local
    assert got.max_scan == want.max_scan
    assert np.array_equal(np.asarray(got.sizes), np.asarray(want.sizes))
    assert np.array_equal(np.asarray(got.row_kmers),
                          np.asarray(want.row_kmers))
    assert np.array_equal(np.asarray(got.row_nodes),
                          np.asarray(want.row_nodes))
    nz = np.asarray(want.sizes) > 0
    assert np.array_equal(np.asarray(got.starts)[nz],
                          np.asarray(want.starts)[nz])


def test_ooc_checkpoint_serves_on_mesh(tmp_path):
    """The out-of-core checkpoint drives the mesh count step with
    results equal to the monolithic host lookup."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.sharded import (KMER_PAD,
                                                       make_count_step)

    graph, flat, mono = _fixture()
    n_table = 4
    _spill_flat(str(tmp_path / "spill"), flat, 4, n_table)
    build_shards_from_spills(str(tmp_path / "spill"),
                             str(tmp_path / "index"))

    rng = np.random.default_rng(5)
    qs = np.concatenate([
        rng.choice(np.asarray(flat._hashes, dtype=np.uint64), 64),
        rng.integers(0, 1 << 40, 64).astype(np.uint64)])
    n_nodes = graph.n_nodes()
    expected = mono.map_kmers(qs, n_nodes)

    devices = np.asarray(jax.devices()[:8]).reshape(2, n_table)
    mesh = Mesh(devices, ("data", "table"))
    shards = ckpt.load_shards(str(tmp_path / "index"), mesh=mesh)
    step = make_count_step(mesh, shards, n_nodes, K, from_kmers=True)
    qpad = np.full(128, KMER_PAD, dtype=np.uint64)
    qpad[:len(qs)] = qs
    qj = jax.device_put(jnp.asarray(qpad.reshape(2, 64)),
                        NamedSharding(mesh, P("data", None)))
    got = np.asarray(step(qj, shards.starts, shards.sizes,
                          shards.row_kmers, shards.row_nodes))
    assert np.array_equal(got, expected)


def test_spill_crash_truncation_and_order(tmp_path):
    graph, flat, mono = _fixture(seed=21)
    d = str(tmp_path / "spill")
    w = _spill_flat(d, flat, n_chunks=6, n_ranges=3)
    # only 4 of 6 chunks "completed" before the crash: rebuild journal
    with open(os.path.join(d, "journal.jsonl")) as f:
        lines = f.readlines()
    with open(os.path.join(d, "journal.jsonl"), "w") as f:
        f.writelines(lines[:4])
    # simulate a torn post-crash append beyond the journal
    with open(os.path.join(d, "range-00001.kmers.bin"), "ab") as f:
        f.write(b"\xff" * 24)

    w2 = SpillWriter(d, MODULO, 3)
    assert w2.done == {0, 1, 2, 3}
    with pytest.raises(ValueError):
        w2.add_chunk(5, *[np.zeros(0)] * 4)  # out of order
    h = np.asarray(flat._hashes, dtype=np.uint64)
    bounds = np.linspace(0, len(h), 7).astype(int)
    for c in (3, 4, 5):  # 3 is journaled: must be a no-op replay
        s = slice(bounds[c], bounds[c + 1])
        w2.add_chunk(c, h[s], np.asarray(flat._nodes)[s],
                     np.asarray(flat._ref_offsets)[s],
                     np.asarray(flat._allele_frequencies)[s])
    assert np.array_equal(w2.range_rows, w.range_rows)
    build_shards_from_spills(d, str(tmp_path / "index"))
    _assert_index_equal(index_from_shard_checkpoint(str(tmp_path / "index")),
                        mono)


def test_build_stage_resumes_per_shard(tmp_path):
    graph, flat, mono = _fixture(seed=33)
    d = str(tmp_path / "spill")
    _spill_flat(d, flat, n_chunks=4, n_ranges=4)
    prefix = str(tmp_path / "index")
    build_shards_from_spills(d, prefix)
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    # wipe the manifest + one shard: the re-run must rebuild exactly that
    os.remove(ckpt.manifest_path(prefix))
    os.remove(ckpt.shard_path(prefix, 2, 4))
    kept = {t: os.path.getmtime(ckpt.shard_path(prefix, t, 4))
            for t in (0, 1, 3)}
    build_shards_from_spills(d, prefix)
    for t, mt in kept.items():
        assert os.path.getmtime(ckpt.shard_path(prefix, t, 4)) == mt, \
            f"shard {t} was rebuilt needlessly"
    _assert_index_equal(index_from_shard_checkpoint(prefix), mono)


def test_find_and_build_out_of_core_end_to_end(tmp_path):
    """The full driver (pooled find -> spill -> build) == monolithic,
    including a find-checkpointed resume after deleting the spills."""
    graph, flat, mono = _fixture(seed=44)
    wd = str(tmp_path / "wd")
    res = find_and_build_out_of_core(
        graph, K, n_workers=1, workdir=wd, modulo=MODULO, n_ranges=4,
        checkpoint_dir=os.path.join(wd, "findck"), delete_spills=True)
    assert res["spilled_rows"] == len(flat)
    ooc = index_from_shard_checkpoint(os.path.join(wd, "index"))
    _assert_index_equal(ooc, mono)
    # spills were deleted as shards landed
    assert not any(f.endswith(".bin")
                   for f in os.listdir(os.path.join(wd, "spill")))

    # resume path: wipe spill + index, keep find checkpoints; the rerun
    # must replay chunks from the checkpoint into a fresh spill
    import shutil
    shutil.rmtree(os.path.join(wd, "spill"))
    for f in list(os.listdir(wd)):
        if f.startswith("index"):
            os.remove(os.path.join(wd, f))
    res2 = find_and_build_out_of_core(
        graph, K, n_workers=1, workdir=wd, modulo=MODULO, n_ranges=4,
        checkpoint_dir=os.path.join(wd, "findck"), delete_spills=False)
    assert res2["spilled_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(os.path.join(wd, "index")),
                        mono)


def test_spill_refuses_mismatched_inputs(tmp_path):
    d = str(tmp_path / "spill")
    SpillWriter(d, MODULO, 4)
    with pytest.raises(ValueError):
        SpillWriter(d, MODULO, 8)
    with pytest.raises(ValueError):
        SpillWriter(d, 2003, 4)


def test_empty_and_tiny_inputs(tmp_path):
    # zero rows overall; ranges larger than distinct buckets
    w = SpillWriter(str(tmp_path / "s0"), 17, 8)
    w.add_chunk(0, *[np.zeros(0, d) for d in
                     (np.uint64, np.int32, np.uint64, np.float32)])
    res = build_shards_from_spills(str(tmp_path / "s0"),
                                   str(tmp_path / "i0"))
    assert res["total_rows"] == 0
    idx = index_from_shard_checkpoint(str(tmp_path / "i0"))
    assert len(np.asarray(idx._kmers)) == 0
    assert not idx.has_kmers(np.array([3], dtype=np.uint64),
                             backend="host").any()


def test_packed_conversion_matches_from_index(tmp_path):
    """Out-of-core packed conversion == PackedTableShards.from_index of
    the monolithic index, bit-for-bit, and serves on the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.oocbuild import \
        convert_checkpoint_to_packed
    from graph_kmer_index_tpu.parallel.sharded import (
        KMER_PAD, PackedTableShards, make_count_step_packed)

    graph, flat, mono = _fixture(seed=55)
    n_table = 4
    _spill_flat(str(tmp_path / "spill"), flat, 4, n_table)
    build_shards_from_spills(str(tmp_path / "spill"),
                             str(tmp_path / "index"))
    for workers in (1, 3):
        wd = str(tmp_path / f"p{workers}")
        res = convert_checkpoint_to_packed(
            str(tmp_path / "index"), wd, n_table=n_table,
            n_workers=workers)
        got = ckpt.load_shards(res["prefix"])
        want = PackedTableShards.from_index(mono, n_table)
        assert got.modulo2 == want.modulo2
        assert got.m2_local == want.m2_local
        assert got.max_scan == want.max_scan
        assert got.has_dup == want.has_dup
        np.testing.assert_array_equal(np.asarray(got.records),
                                      np.asarray(want.records))
        np.testing.assert_array_equal(np.asarray(got.row_kmers),
                                      np.asarray(want.row_kmers))
        np.testing.assert_array_equal(np.asarray(got.row_nodes),
                                      np.asarray(want.row_nodes))

    # mesh serve from the converted checkpoint == monolithic counts
    rng = np.random.default_rng(9)
    qs = np.concatenate([
        rng.choice(np.asarray(flat._hashes, dtype=np.uint64), 60),
        rng.integers(0, 1 << 40, 40).astype(np.uint64)])
    n_nodes = graph.n_nodes()
    expected = mono.map_kmers(qs, n_nodes)
    devices = np.asarray(jax.devices()[:8]).reshape(2, n_table)
    mesh = Mesh(devices, ("data", "table"))
    shards = ckpt.load_shards(res["prefix"], mesh=mesh)
    step = make_count_step_packed(mesh, shards, n_nodes, K,
                                  from_kmers=True)
    qpad = np.full(128, KMER_PAD, dtype=np.uint64)
    qpad[:len(qs)] = qs
    qj = jax.device_put(jnp.asarray(qpad.reshape(2, 64)),
                        NamedSharding(mesh, P("data", None)))
    got_counts = np.asarray(step(qj, shards.records, shards.row_kmers,
                                 shards.row_nodes))
    assert np.array_equal(got_counts, expected)


def test_out_of_order_stash_path(tmp_path):
    """Parent-streaming mode (checkpoint_dir set) with the stash forced
    (ram_cap=0: every out-of-order completion goes to disk) == the
    serial run."""
    graph, flat, mono = _fixture(seed=66)
    wd = str(tmp_path / "wd")
    res = find_and_build_out_of_core(
        graph, K, n_workers=3, workdir=wd, modulo=MODULO, n_ranges=4,
        stash_ram_chunks=0, delete_spills=False,
        checkpoint_dir=os.path.join(wd, "findck"))
    assert res["spilled_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(os.path.join(wd, "index")),
                        mono)
    # every stash file was consumed and removed
    stash = os.path.join(wd, "stash")
    assert not os.path.isdir(stash) or not os.listdir(stash)


def test_worker_spill_mode_matches_monolithic(tmp_path):
    """Default worker-side spill (layout='chunk', rows never cross the
    pool): multiworker == monolithic, resume skips journaled chunks,
    and a torn unjournaled chunk file is cleaned up."""
    graph, flat, mono = _fixture(seed=88)
    wd = str(tmp_path / "wd")
    res = find_and_build_out_of_core(
        graph, K, n_workers=3, workdir=wd, modulo=MODULO, n_ranges=4,
        delete_spills=False)
    assert res["spilled_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(os.path.join(wd, "index")),
                        mono)
    spill = os.path.join(wd, "spill")
    assert any(f.startswith("chunk-") for f in os.listdir(spill))

    # crash sim: drop 2 journal lines (their chunks become unjournaled)
    # and write a torn file; the re-run must re-spill those chunks,
    # delete the torn survivor, and reproduce the same index
    jp = os.path.join(spill, "journal.jsonl")
    with open(jp) as f:
        lines = f.readlines()
    with open(jp, "w") as f:
        f.writelines(lines[:-2])
    with open(os.path.join(spill, "chunk-99999990-99999999.range-00001"
                                  ".kmers.bin"), "wb") as f:
        f.write(b"\xff" * 16)
    for fn in list(os.listdir(str(tmp_path / "wd"))):
        if fn.startswith("index"):
            os.remove(os.path.join(wd, fn))
    res2 = find_and_build_out_of_core(
        graph, K, n_workers=3, workdir=wd, modulo=MODULO, n_ranges=4,
        delete_spills=False)
    assert res2["spilled_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(os.path.join(wd, "index")),
                        mono)
    assert not os.path.exists(os.path.join(
        spill, "chunk-99999990-99999999.range-00001.kmers.bin"))


def test_rerun_after_completion_with_deleted_spills(tmp_path):
    """Re-invoking the build/convert after a completed run whose spills
    were deleted must no-op cleanly (crash-just-before-return story)."""
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.oocbuild import \
        convert_checkpoint_to_packed

    graph, flat, mono = _fixture(seed=77)
    d = str(tmp_path / "spill")
    _spill_flat(d, flat, n_chunks=3, n_ranges=4)
    prefix = str(tmp_path / "index")
    build_shards_from_spills(d, prefix, delete_spills=True)
    assert not any(f.endswith(".bin") for f in os.listdir(d))
    # re-run on the consumed spill set: must skip everything, rewrite
    # only the manifest, and not raise
    res = build_shards_from_spills(d, prefix, delete_spills=True)
    assert res["total_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(prefix), mono)

    wd = str(tmp_path / "pk")
    convert_checkpoint_to_packed(prefix, wd, n_table=4)
    res2 = convert_checkpoint_to_packed(prefix, wd, n_table=4)
    assert res2["total_rows"] == len(flat)
    # crash-mid-build sim (spills kept): drop one shard, rebuild it only
    wd2 = str(tmp_path / "pk2")
    convert_checkpoint_to_packed(prefix, wd2, n_table=4,
                                 delete_spills=False)
    os.remove(ckpt.shard_path(os.path.join(wd2, "packed"), 1, 4))
    convert_checkpoint_to_packed(prefix, wd2, n_table=4,
                                 delete_spills=False)
    a = ckpt.load_shards(os.path.join(wd, "packed"))
    b = ckpt.load_shards(os.path.join(wd2, "packed"))
    np.testing.assert_array_equal(a.records, b.records)


def test_resume_with_different_workers_refused(tmp_path):
    """A spill journal written under one chunking must refuse a resume
    under another (different n_workers) instead of double-counting."""
    graph, flat, mono = _fixture(seed=99)
    wd = str(tmp_path / "wd")
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                               modulo=MODULO, n_ranges=4,
                               delete_spills=False)
    for f in list(os.listdir(wd)):
        if f.startswith("index"):
            os.remove(os.path.join(wd, f))
    with pytest.raises(ValueError, match="different inputs"):
        find_and_build_out_of_core(graph, K, n_workers=3, workdir=wd,
                                   modulo=MODULO, n_ranges=4,
                                   delete_spills=False)
    # same worker count resumes fine
    res = find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                                     modulo=MODULO, n_ranges=4,
                                     delete_spills=False)
    assert res["spilled_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(os.path.join(wd, "index")),
                        mono)


def test_reshard_checkpoint_serves_identically(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.oocbuild import reshard_checkpoint
    from graph_kmer_index_tpu.parallel.sharded import (KMER_PAD,
                                                       make_count_step)

    graph, flat, mono = _fixture(seed=111)
    _spill_flat(str(tmp_path / "spill"), flat, 3, 8)
    build_shards_from_spills(str(tmp_path / "spill"),
                             str(tmp_path / "i8"))
    res = reshard_checkpoint(str(tmp_path / "i8"), str(tmp_path / "i4"), 4)
    assert res["n_table"] == 4 and res["total_rows"] == len(flat)

    # merged row stream == a direct 4-range build's row stream
    _spill_flat(str(tmp_path / "spill4"), flat, 3, 4)
    build_shards_from_spills(str(tmp_path / "spill4"),
                             str(tmp_path / "d4"))
    a = ckpt.load_shards(str(tmp_path / "i4"))
    b = ckpt.load_shards(str(tmp_path / "d4"))
    ar = np.concatenate([a.row_kmers[t][:int(np.asarray(a.sizes[t]).sum())]
                         for t in range(4)])
    br = np.concatenate([b.row_kmers[t][:int(np.asarray(b.sizes[t]).sum())]
                         for t in range(4)])
    assert np.array_equal(ar, br)

    # reassembled full index == monolithic
    _assert_index_equal(index_from_shard_checkpoint(str(tmp_path / "i4")),
                        mono)

    # mesh serve from the resharded checkpoint == monolithic counts
    rng = np.random.default_rng(12)
    qs = np.concatenate([
        rng.choice(np.asarray(flat._hashes, dtype=np.uint64), 64),
        rng.integers(0, 1 << 40, 64).astype(np.uint64)])
    n_nodes = graph.n_nodes()
    expected = mono.map_kmers(qs, n_nodes)
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "table"))
    shards = ckpt.load_shards(str(tmp_path / "i4"), mesh=mesh)
    step = make_count_step(mesh, shards, n_nodes, K, from_kmers=True)
    qpad = np.full(128, KMER_PAD, dtype=np.uint64)
    qpad[:len(qs)] = qs
    qj = jax.device_put(jnp.asarray(qpad.reshape(2, 64)),
                        NamedSharding(mesh, P("data", None)))
    got = np.asarray(step(qj, shards.starts, shards.sizes,
                          shards.row_kmers, shards.row_nodes))
    assert np.array_equal(got, expected)


def test_kn_only_spill_serves_counts(tmp_path):
    """spill_cols='kn' (serving columns only, half the spill/checkpoint
    disk): mesh counts equal the monolithic index; full-index
    reassembly is refused loudly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.sharded import (KMER_PAD,
                                                       make_count_step)

    graph, flat, mono = _fixture(seed=123)
    wd = str(tmp_path / "wd")
    res = find_and_build_out_of_core(
        graph, K, n_workers=2, workdir=wd, modulo=MODULO, n_ranges=4,
        spill_cols="kn", delete_spills=True)
    assert res["spilled_rows"] == len(flat)
    prefix = os.path.join(wd, "index")
    with pytest.raises(ValueError, match="spill_cols='kn'"):
        index_from_shard_checkpoint(prefix)

    rng = np.random.default_rng(7)
    qs = np.concatenate([
        rng.choice(np.asarray(flat._hashes, dtype=np.uint64), 64),
        rng.integers(0, 1 << 40, 64).astype(np.uint64)])
    n_nodes = graph.n_nodes()
    expected = mono.map_kmers(qs, n_nodes)
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "table"))
    shards = ckpt.load_shards(prefix, mesh=mesh)
    step = make_count_step(mesh, shards, n_nodes, K, from_kmers=True)
    qpad = np.full(128, KMER_PAD, dtype=np.uint64)
    qpad[:len(qs)] = qs
    qj = jax.device_put(jnp.asarray(qpad.reshape(2, 64)),
                        NamedSharding(mesh, P("data", None)))
    got = np.asarray(step(qj, shards.starts, shards.sizes,
                          shards.row_kmers, shards.row_nodes))
    assert np.array_equal(got, expected)


def test_kn_checkpoint_reshard_and_packed_convert(tmp_path):
    """The serving-columns checkpoint composes with reshard and packed
    conversion (both only touch kmers+nodes)."""
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    from graph_kmer_index_tpu.parallel.oocbuild import (
        convert_checkpoint_to_packed, reshard_checkpoint)
    from graph_kmer_index_tpu.parallel.sharded import PackedTableShards

    graph, flat, mono = _fixture(seed=131)
    wd = str(tmp_path / "wd")
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                               modulo=MODULO, n_ranges=8,
                               spill_cols="kn")
    prefix = os.path.join(wd, "index")
    res = reshard_checkpoint(prefix, str(tmp_path / "r4"), 4)
    assert res["total_rows"] == len(flat)
    got = ckpt.load_shards(str(tmp_path / "r4"))
    rows = np.concatenate([got.row_kmers[t][:int(np.asarray(
        got.sizes[t]).sum())] for t in range(4)])
    assert np.array_equal(rows, np.asarray(mono._kmers, np.uint64))

    pres = convert_checkpoint_to_packed(prefix, str(tmp_path / "pk"),
                                        n_table=4)
    pgot = ckpt.load_shards(pres["prefix"])
    want = PackedTableShards.from_index(mono, 4)
    np.testing.assert_array_equal(pgot.records, want.records)


def test_driver_reentry_after_delete_spills(tmp_path):
    """Re-invoking the DEFAULT driver (worker-spill + delete_spills)
    after completion — and resuming after a simulated build-stage crash
    — must succeed, not die validating deleted spills (r5 review #1)."""
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt

    graph, flat, mono = _fixture(seed=141)
    wd = str(tmp_path / "wd")
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                               modulo=MODULO, n_ranges=4,
                               delete_spills=True)
    # 1) re-entry after completion: must no-op cleanly
    res = find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                                     modulo=MODULO, n_ranges=4,
                                     delete_spills=True)
    assert res["total_rows"] == len(flat)
    # 2) build-stage crash sim (the REAL post-crash shape: built
    #    shards' spills deleted, the pending shard's spill intact):
    #    rebuild in a fresh workdir without deletion, then craft it
    wd2 = str(tmp_path / "wd2")
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd2,
                               modulo=MODULO, n_ranges=4,
                               delete_spills=False)
    prefix2 = os.path.join(wd2, "index")
    os.remove(ckpt.manifest_path(prefix2))
    os.remove(ckpt.shard_path(prefix2, 2, 4))
    from graph_kmer_index_tpu.parallel.oocbuild import (
        SpillWriter, _COL_DTYPES, _delete_range_spills)
    import json as _json
    with open(os.path.join(wd2, "spill", "meta.json")) as f:
        sm = _json.load(f)
    w = SpillWriter(os.path.join(wd2, "spill"), sm["modulo"],
                    sm["n_ranges"],
                    pins=sm.get("pins") or {},
                    cols=tuple((c, _COL_DTYPES[c]) for c in sm["cols"]),
                    m_range=sm.get("m_range"),
                    layout=sm.get("layout", "range"))
    for t in (0, 1, 3):
        _delete_range_spills(w, t)
    res2 = find_and_build_out_of_core(graph, K, n_workers=1,
                                      workdir=wd2, modulo=MODULO,
                                      n_ranges=4, delete_spills=True)
    assert res2["total_rows"] == len(flat)
    _assert_index_equal(index_from_shard_checkpoint(prefix2), mono)
    # the impossible-by-construction state (shard AND spill both gone)
    # still fails loudly rather than fabricating data
    os.remove(ckpt.shard_path(prefix2, 2, 4))
    _delete_range_spills(w, 2)
    with pytest.raises(ValueError, match="missing"):
        find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd2,
                                   modulo=MODULO, n_ranges=4,
                                   delete_spills=True)


def test_resume_flip_skip_frequencies_rebuilds(tmp_path):
    """A resumed build under a different skip_frequencies flag must
    REBUILD shards, not reuse ones missing the frequency column
    (r5 review #2)."""
    graph, flat, mono = _fixture(seed=151)
    d = str(tmp_path / "spill")
    _spill_flat(d, flat, n_chunks=3, n_ranges=4)
    prefix = str(tmp_path / "index")
    build_shards_from_spills(d, prefix, skip_frequencies=True)
    # flip: the re-run must produce shards WITH frequencies
    build_shards_from_spills(d, prefix, skip_frequencies=False)
    ooc = index_from_shard_checkpoint(prefix)
    _assert_index_equal(ooc, mono)
    assert np.asarray(ooc._frequencies).sum() > 0


def test_pass_partitioned_spill_matches_single_pass(tmp_path):
    """n_spill_passes=2/3 (find the graph per pass, spill+build only
    that pass's bucket ranges, delete before the next) == single pass
    == monolithic."""
    graph, flat, mono = _fixture(seed=161)
    for passes in (2, 3):
        wd = str(tmp_path / f"p{passes}")
        res = find_and_build_out_of_core(
            graph, K, n_workers=2, workdir=wd, modulo=MODULO,
            n_ranges=6, n_spill_passes=passes, delete_spills=True)
        assert res["total_rows"] == len(flat)
        _assert_index_equal(
            index_from_shard_checkpoint(os.path.join(wd, "index")), mono)
        # re-entry after completion: all windows detected as built
        res2 = find_and_build_out_of_core(
            graph, K, n_workers=2, workdir=wd, modulo=MODULO,
            n_ranges=6, n_spill_passes=passes, delete_spills=True)
        assert res2["total_rows"] == len(flat)


def test_flag_flip_with_deleted_spills_refinds(tmp_path):
    """Spill journal gone + flags flipped: the driver must re-find and
    rebuild honoring the new flags, not silently reuse stale shards
    (r5 review round 2, finding 1)."""
    import shutil
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt

    graph, flat, mono = _fixture(seed=171)
    wd = str(tmp_path / "wd")
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                               modulo=MODULO, n_ranges=4,
                               skip_frequencies=False,
                               delete_spills=True)
    shutil.rmtree(os.path.join(wd, "spill"))
    res = find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                                     modulo=MODULO, n_ranges=4,
                                     skip_frequencies=True,
                                     delete_spills=True)
    assert res["total_rows"] == len(flat)
    with np.load(ckpt.manifest_path(os.path.join(wd, "index"))) as z:
        extras = [str(x) for x in z["extras"]]
    assert "row_frequencies" not in extras, extras
    # and flipping back re-finds again and restores frequencies
    shutil.rmtree(os.path.join(wd, "spill"))
    find_and_build_out_of_core(graph, K, n_workers=1, workdir=wd,
                               modulo=MODULO, n_ranges=4,
                               skip_frequencies=False,
                               delete_spills=True)
    _assert_index_equal(
        index_from_shard_checkpoint(os.path.join(wd, "index")), mono)
