"""Sharded (multi-chip) query and count kernels.

The reference's concurrency model is fork() + POSIX shared memory +
worklist splits with a final host concatenate (shared_mem.py:123-176,
collision_free_kmer_index.py:222-232). The TPU-native equivalents:

- membership / lookup: shard the query batch over the mesh ``data`` axis;
  the table is replicated (or bucket-sharded on the ``table`` axis for
  very large indexes); results gather back.
- node counts / count-min sketch: each device scatter-adds its local
  counts; merging is a pure ``psum`` over the data axis (SURVEY.md §5.8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import data_mesh
from ..ops.lookup import _has_kmers, _node_counts


def _shard_pad(kmers: np.ndarray, n_shards: int):
    """Pad onto the jit size ladder. Ladder sizes are multiples of 1024,
    hence divisible by any power-of-two mesh size up to 1024 — those
    shapes are shared with the single-chip path. Non-power-of-two shard
    counts can't ride that ladder; they pad to the next multiple of
    lcm(1024, n_shards) so the set of compiled shapes stays bounded
    (one per ladder step) instead of one per batch length."""
    import math
    from ..ops.lookup import _pad_queries
    q, n = _pad_queries(np.asarray(kmers, dtype=np.uint64))
    if len(q) % n_shards:
        step = math.lcm(1024, n_shards)
        new_len = -(-len(q) // step) * step
        q = np.concatenate([q, np.zeros(new_len - len(q),
                                        dtype=np.uint64)])
    return q, n


def _mesh_view(dev, mesh):
    """A shallow clone of the DeviceKmerIndex whose packed tables are
    replicated over ``mesh`` (cached per device set): sharded query
    batches then flow through the SAME packed kernels as the single-chip
    path — GSPMD partitions the decode by query, the tables stay whole
    on every device. Returns None when the index has no packed tables
    (over the HBM budget)."""
    import copy

    packed = dev._packed()
    if packed is None:
        return None
    key = tuple(d.id for d in mesh.devices.flat)
    cache = getattr(dev, "_mesh_packed", None)
    if cache is None:
        cache = dev._mesh_packed = {}
    if key not in cache:
        rep = NamedSharding(mesh, P())
        rec, ks, ns, m2, mx = packed
        cache[key] = (jax.device_put(rec, rep), jax.device_put(ks, rep),
                      jax.device_put(ns, rep), m2, mx)
    view = copy.copy(dev)
    view._packed_tables = cache[key]
    return view


def has_kmers_sharded(index, kmers: np.ndarray, n_shards: int | None = None):
    """Data-parallel membership query (reference has_kmers_parallel):
    queries shard over the mesh data axis, the packed record table is
    replicated, and the single-chip packed kernels run under GSPMD."""
    dev = index._device()
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    qj = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    view = _mesh_view(dev, mesh)
    if view is not None:
        out = view._has_kmers_packed_device(qj, n)
        return np.asarray(out)[:n]
    out = _has_kmers(qj, n, dev.table_kmers, dev.starts_tbl, dev.sizes_tbl,
                     dev.modulo, dev.max_scan)
    return np.asarray(out)[:n]


def map_kmers_sharded(index, kmers: np.ndarray, n_nodes: int,
                      n_shards: int | None = None):
    """Sharded node-count mapping: each device counts its query shard into
    a node-count vector; the scatter-add result is an implicit psum."""
    dev = index._device()
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    qj = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    view = _mesh_view(dev, mesh)
    if view is not None:
        return view._map_kmers_packed_device(qj, n, int(n_nodes))
    counts = _node_counts(qj, n, dev.table_kmers, dev.table_nodes,
                          dev.starts_tbl, dev.sizes_tbl, dev.modulo,
                          int(n_nodes), dev.max_scan)
    return np.asarray(counts)


def count_min_sketch_sharded(kmers: np.ndarray, modulos,
                             n_shards: int | None = None,
                             dtype=jnp.int32):
    """Count-min sketch over a sharded kmer batch; rows are bincounts per
    modulo, merged across devices by psum (reference
    count_min_sketch_kmer_counter.py:25-29 is the single-host loop)."""
    from jax import shard_map

    modulos = np.asarray(modulos, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(modulos)[:-1]])
    total = int(np.sum(modulos))
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    valid_len = n

    modulos_j = jnp.asarray(modulos.astype(np.uint64))
    offsets_j = jnp.asarray(offsets.astype(np.int64))

    def local_count(shard):
        # shard: (per,) local kmers; build local sketch then psum
        sketch = jnp.zeros(total, dtype=dtype)
        idx_in_shard = jax.lax.axis_index("data")
        per = shard.shape[0]
        global_pos = idx_in_shard * per + jnp.arange(per)
        valid = (global_pos < valid_len).astype(dtype)
        for r in range(len(modulos)):
            pos = (shard % modulos_j[r]).astype(jnp.int64) + offsets_j[r]
            sketch = sketch.at[pos].add(valid)
        return jax.lax.psum(sketch, "data")

    fn = shard_map(local_count, mesh=mesh, in_specs=P("data"),
                   out_specs=P())
    return np.asarray(fn(jnp.asarray(q)))


# ---------------------------------------------------------------------------
# 2-D sharded pipeline: reads data-parallel x index table-parallel.
#
# This is the production multi-chip layout (SURVEY.md §5.8): the bucket
# table (modulo-sized, ~3.6 GB at production modulo 452930477) is sharded
# by contiguous BUCKET RANGE over the mesh "table" axis — each device owns
# buckets [t*m_local, (t+1)*m_local) plus the row segment they point into —
# while read/query batches shard over the "data" axis. A query is answered
# by the single table shard owning its bucket; node-count merging is a
# psum over BOTH axes (the reference's equivalent is fork() + host
# concatenate, shared_mem.py:123-176 / collision_free_kmer_index.py:222-232).
# ---------------------------------------------------------------------------


class TableShards:
    """Host-side container of the bucket-range-sharded index arrays, stacked
    with a leading (n_table,) axis so shard_map can split them."""

    def __init__(self, starts, sizes, row_kmers, row_nodes, m_local, modulo,
                 max_scan, n_table):
        self.starts = starts          # (n_table, m_local) int64, shard-local row offsets
        self.sizes = sizes            # (n_table, m_local) int32
        self.row_kmers = row_kmers    # (n_table, rmax) uint64
        self.row_nodes = row_nodes    # (n_table, rmax) int32
        self.m_local = m_local
        self.modulo = modulo
        self.max_scan = max_scan
        self.n_table = n_table

    @classmethod
    def from_index(cls, index, n_table: int):
        starts_tbl = np.asarray(index._hashes_to_index, dtype=np.int64)
        sizes_tbl = np.asarray(index._n_kmers, dtype=np.int32)
        kmers = np.asarray(index._kmers, dtype=np.uint64)
        nodes = np.asarray(index._nodes, dtype=np.int32)
        modulo = int(index._modulo)
        m_local = -(-modulo // n_table)

        starts_p = np.zeros(m_local * n_table, dtype=np.int64)
        sizes_p = np.zeros(m_local * n_table, dtype=np.int32)
        starts_p[:modulo] = starts_tbl
        sizes_p[:modulo] = sizes_tbl
        starts_p = starts_p.reshape(n_table, m_local)
        sizes_p = sizes_p.reshape(n_table, m_local)

        # rows live sorted by bucket, so each shard's rows are contiguous
        rows_lo, rows_hi = [], []
        for t in range(n_table):
            nz = sizes_p[t] > 0
            if nz.any():
                lo = int(starts_p[t][nz].min())
                hi = int((starts_p[t][nz] + sizes_p[t][nz]).max())
            else:
                lo, hi = 0, 0
            rows_lo.append(lo)
            rows_hi.append(hi)
        rmax = max(1, max(h - l for l, h in zip(rows_lo, rows_hi)))
        row_kmers = np.zeros((n_table, rmax), dtype=np.uint64)
        row_nodes = np.zeros((n_table, rmax), dtype=np.int32)
        for t, (lo, hi) in enumerate(zip(rows_lo, rows_hi)):
            row_kmers[t, : hi - lo] = kmers[lo:hi]
            row_nodes[t, : hi - lo] = nodes[lo:hi]
            starts_p[t] -= lo  # re-base to shard-local row offsets
        max_scan = max(1, int(sizes_tbl.max()) if len(sizes_tbl) else 1)
        return cls(starts_p, sizes_p, row_kmers, row_nodes, m_local, modulo,
                   max_scan, n_table)


def make_count_step(mesh, shards: TableShards, n_nodes: int, k: int,
                    data_axis: str = "data", table_axis: str = "table",
                    from_kmers: bool = False):
    """Build the jitted full pipeline step over a 2-D mesh: 2-bit reads ->
    sliding-window hashes -> bucket-range-sharded lookup -> node counts.

    Returns ``step(reads, table_args...)``: reads (n_reads, read_len) int32
    sharded over ``data_axis``; table arrays sharded over ``table_axis``;
    output node counts replicated (psum over both axes). With
    ``from_kmers`` the query input is a flat (n,) uint64 pre-hashed
    batch padded with :data:`KMER_PAD` (see make_count_step_packed).
    """
    from jax import shard_map
    from ..ops.encode import combine_u32_pair, sliding_hashes_u32

    m_local = shards.m_local
    max_scan = shards.max_scan
    modulo = np.uint64(shards.modulo)

    def local_step(reads, starts, sizes, row_kmers, row_nodes):
        # shard-local shapes: reads (r_loc, L); table args (1, ...)
        starts, sizes = starts[0], sizes[0]
        row_kmers, row_nodes = row_kmers[0], row_nodes[0]
        t_idx = jax.lax.axis_index(table_axis).astype(jnp.int64)

        if from_kmers:
            flat = reads.reshape(-1)
            valid = flat < jnp.uint64(1 << 62)
            kmers = jnp.where(valid, flat, jnp.uint64(0))
        else:
            r_loc, L = reads.shape
            flat = reads.reshape(-1)
            # u32-lane ladder + one combine (u64 emulated on TPU)
            hashes = combine_u32_pair(*sliding_hashes_u32(flat, k))
            # windows crossing read boundaries are invalid
            pos = jnp.arange(r_loc * L) % L
            valid = pos <= L - k
            kmers = jnp.where(valid, hashes, jnp.uint64(0))

        bucket = (kmers % modulo).astype(jnp.int64)
        owner = bucket // m_local
        mine = (owner == t_idx) & valid
        local_bucket = jnp.clip(bucket - t_idx * m_local, 0, m_local - 1)
        start = starts[local_bucket]
        n_in_bucket = sizes[local_bucket].astype(jnp.int32)
        scan = jnp.arange(max_scan, dtype=jnp.int64)
        rows = jnp.minimum(start[:, None] + scan[None, :],
                           row_kmers.shape[0] - 1)
        stored = row_kmers[rows]
        hit = ((scan[None, :] < n_in_bucket[:, None])
               & (stored == kmers[:, None]) & mine[:, None])
        nodes_hit = row_nodes[rows]
        counts = jnp.zeros(n_nodes, jnp.int32).at[nodes_hit.reshape(-1)].add(
            hit.reshape(-1).astype(jnp.int32))
        return jax.lax.psum(counts, (data_axis, table_axis))

    P_ = P
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P_(data_axis) if from_kmers else P_(data_axis, None),
                  P_(table_axis, None),
                  P_(table_axis, None), P_(table_axis, None),
                  P_(table_axis, None)),
        out_specs=P_(),
    )
    return jax.jit(step)


class PackedTableShards:
    """Bucket-range shards of the packed-record layout (ops.lookup): each
    table shard owns a contiguous INTERNAL-modulo bucket range as a
    (groups_local, 128) uint32 record slice — the SAME 16-buckets-per-
    128-lane-row format as the single-chip table (any narrower minor dim
    is (8,128)-tile-padded up to 32x on TPU; see ops/lookup.py) — plus
    its contiguous row segment, with deep records' start lanes re-based
    to shard-local row offsets. The multi-chip mirror of the single-chip
    one-gather-per-query path."""

    def __init__(self, records, row_kmers, row_nodes, m2_local, modulo2,
                 max_scan, n_table, has_dup=True):
        self.records = records        # (n_table, m2_local//16, 128) u32
        self.row_kmers = row_kmers    # (n_table, rmax) uint64
        self.row_nodes = row_nodes    # (n_table, rmax) int32
        self.m2_local = m2_local
        self.modulo2 = modulo2
        self.max_scan = max_scan
        self.n_table = n_table
        # dup2 buckets present: their hits resolve only in the scan, so
        # the scan stage must run even when max_scan == 2
        self.has_dup = has_dup

    @classmethod
    def from_index(cls, index, n_table: int):
        from ..ops.lookup import internal_modulo, SCAN_CAP, _DUP2

        kmers = np.asarray(index._kmers, dtype=np.uint64)
        nodes = np.asarray(index._nodes, dtype=np.uint32)
        n = len(kmers)
        modulo2 = internal_modulo(n)
        bucket = (kmers % np.uint64(modulo2)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        bs, ks, ns = bucket[order], kmers[order], nodes[order]

        # ediff1d on an empty array still emits to_begin — guard so a
        # 0-row index builds all-empty shards instead of a mask mismatch
        first = (np.ediff1d(bs, to_begin=1) != 0) if n \
            else np.zeros(0, bool)
        second = np.concatenate([[False], first[:-1]]) & ~first \
            if n else first
        sizes_at = np.zeros(modulo2, np.int64)
        np.add.at(sizes_at, bs, 1)
        sz_row = sizes_at[bs]
        max_scan = int(sz_row.max()) if n else 1
        if max_scan > SCAN_CAP:
            raise ValueError(
                "table has buckets deeper than SCAN_CAP; use the CSR "
                "TableShards for this index")

        # shard bucket ranges: multiples of 16 so record GROUPS (16
        # buckets per 128-lane row) never straddle a shard boundary
        per_shard = -(-modulo2 // n_table)
        m2_local = 16 * (-(-per_shard // 16))
        # row segments: rows are sorted by bucket, so each shard's rows
        # are contiguous [lo, hi)
        cut = np.searchsorted(bs, np.arange(1, n_table) * m2_local)
        lo = np.concatenate([[0], cut])
        hi = np.concatenate([cut, [n]])

        # flat 8-lane uint32 records, same format as ops.lookup
        # _packed_records: [k0_lo, k0_hi, node0, ~(size|dup2_flag),
        # k1_lo, k1_hi, node1_or_LOCAL_start, spare]; all-ones default
        # never matches a query and reads as size 0. dup2 buckets (same
        # kmer twice, see ops.lookup._DUP2) are flagged scan-buckets so
        # the lane hits stay mutually exclusive.
        idx_local = (np.arange(n, dtype=np.int64)
                     - lo[np.minimum(bs // m2_local, n_table - 1)])
        rec = np.full(8 * m2_local * n_table, 0xFFFFFFFF, np.uint32)
        tb = bs * 8
        ks_lo = (ks & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        ks_hi = (ks >> np.uint64(32)).astype(np.uint32)
        from ..ops.lookup import _dup2_masks
        dup_b, dup_a = _dup2_masks(second, sz_row, ks, xp=np)
        sec2 = second & (sz_row == 2) & ~dup_b
        rec[tb[first]] = ks_lo[first]
        rec[tb[first] + 1] = ks_hi[first]
        rec[tb[first] + 2] = ns[first]
        szv = sz_row.astype(np.uint32)
        szv[dup_a] |= np.uint32(_DUP2)
        rec[tb[first] + 3] = ~szv[first]
        rec[tb[sec2] + 4] = ks_lo[sec2]
        rec[tb[sec2] + 5] = ks_hi[sec2]
        rec[tb[sec2] + 6] = ns[sec2]
        fdeep = first & ((sz_row > 2) | dup_a)
        rec[tb[fdeep] + 6] = idx_local[fdeep].astype(np.uint32)
        rec_p = rec.reshape(n_table, m2_local // 16, 128)

        rmax = max(1, int((hi - lo).max()))
        row_kmers = np.zeros((n_table, rmax), np.uint64)
        row_nodes = np.zeros((n_table, rmax), np.int32)
        for t in range(n_table):
            row_kmers[t, :hi[t] - lo[t]] = ks[lo[t]:hi[t]]
            row_nodes[t, :hi[t] - lo[t]] = ns[lo[t]:hi[t]]
        return cls(rec_p, row_kmers, row_nodes, m2_local, modulo2,
                   max_scan, n_table, has_dup=bool(dup_b.any()))


#: pad value for pre-hashed query batches: real kmers are < 4^31 = 2^62
#: (SURVEY §0, k <= 31), so this can never match a stored kmer and is
#: recognized as padding by the ``from_kmers`` steps.
KMER_PAD = np.uint64(1 << 63)


def make_count_step_packed(mesh, shards: PackedTableShards, n_nodes: int,
                           k: int, data_axis: str = "data",
                           table_axis: str = "table",
                           from_kmers: bool = False):
    """The packed-record mirror of :func:`make_count_step`: one 512-byte
    group-row gather per (query, owning shard) — the shared
    ``_decode_group_rows`` select — then a sort-compacted deep-bucket
    scan, psum over both axes. Raises at call time (via the returned
    overflow count) if the deep-query compaction capacity is exceeded.

    With ``from_kmers`` the step takes a flat (n,) uint64 PRE-HASHED
    query array (padded to a multiple of the data-axis size with
    :data:`KMER_PAD`) instead of a 2-bit read matrix — the serving path
    for queries that didn't come from fixed-length reads."""
    from jax import shard_map
    from ..ops.encode import combine_u32_pair, sliding_hashes_u32
    from ..ops.lookup import _decode_group_rows, _compact_overflow

    m2_local = shards.m2_local
    max_scan = shards.max_scan
    modulo2 = shards.modulo2
    has_dup = getattr(shards, "has_dup", True)

    def local_step(reads, records, row_kmers, row_nodes):
        records = records[0]
        row_kmers, row_nodes = row_kmers[0], row_nodes[0]
        t_idx = jax.lax.axis_index(table_axis).astype(jnp.int64)

        if from_kmers:
            flat = reads.reshape(-1)
            n_q = flat.shape[0]
            valid = flat < jnp.uint64(1 << 62)
            kmers = jnp.where(valid, flat, jnp.uint64(0))
        else:
            r_loc, L = reads.shape
            n_q = r_loc * L
            flat = reads.reshape(-1)
            # u32-lane ladder + one combine (u64 emulated on TPU)
            hashes = combine_u32_pair(*sliding_hashes_u32(flat, k))
            pos = jnp.arange(n_q) % L
            valid = pos <= L - k
            kmers = jnp.where(valid, hashes, jnp.uint64(0))

        bucket = (kmers % jnp.uint64(modulo2)).astype(jnp.int64)
        owner = bucket // m2_local
        mine = (owner == t_idx) & valid
        lb = jnp.clip(bucket - t_idx * m2_local, 0,
                      m2_local - 1).astype(jnp.int32)
        q_lo = (kmers & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        q_hi = (kmers >> jnp.uint64(32)).astype(jnp.uint32)
        n0, r3, sz, dup2, hit0, hit1 = _decode_group_rows(
            records, lb // 16, lb % 16, q_lo, q_hi)
        # dup2 buckets scan only on an actual match (hit0); lane hits
        # are mutually exclusive so ONE scatter covers both
        deep = ((sz > 2) | (dup2 & hit0)) & mine
        hit0 = hit0 & mine & ~deep
        hit1 = hit1 & mine & ~deep
        counts = jnp.zeros(n_nodes, jnp.int32)
        counts = counts.at[
            jnp.where(hit0, n0,
                      jnp.where(hit1, r3.astype(jnp.int32), n_nodes))
        ].add(1, mode="drop")

        dropped = jnp.int32(0)
        if max_scan > 2 or has_dup:
            # each shard sees ~1/n_table of the batch's deep queries;
            # 1/8 of the full batch is a wide margin over the ~9%
            # all-hit deep share
            cap = min(max(1024, n_q // 8), n_q)
            oq, ostart, osz, _oi, n_over = _compact_overflow(
                kmers, deep, r3, sz, cap)
            scan = jnp.arange(max_scan, dtype=jnp.int32)
            rows = jnp.minimum(ostart[:, None] + scan[None, :],
                               row_kmers.shape[0] - 1)
            ovalid = jnp.arange(oq.shape[0]) < jnp.minimum(n_over, cap)
            mask = ((scan[None, :] < osz[:, None])
                    & (row_kmers[rows] == oq[:, None]) & ovalid[:, None])
            onodes = jnp.where(mask, row_nodes[rows], n_nodes)
            counts = counts.at[onodes.reshape(-1)].add(1, mode="drop")
            dropped = jnp.maximum(0, n_over - cap)

        counts = jax.lax.psum(counts, (data_axis, table_axis))
        dropped = jax.lax.psum(dropped, (data_axis, table_axis))
        return counts, dropped

    P_ = P
    q_spec = P_(data_axis) if from_kmers else P_(data_axis, None)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(q_spec, P_(table_axis, None, None),
                  P_(table_axis, None), P_(table_axis, None)),
        out_specs=(P_(), P_()),
    )
    jitted = jax.jit(step)

    def run(reads, records, row_kmers, row_nodes):
        counts, dropped = jitted(reads, records, row_kmers, row_nodes)
        if int(dropped) > 0:
            raise RuntimeError(
                "packed sharded lookup: deep-query compaction capacity "
                "exceeded; use the CSR step for this batch")
        return counts

    return run


def make_member_step_packed(mesh, shards: PackedTableShards, k: int,
                            data_axis: str = "data",
                            table_axis: str = "table",
                            from_kmers: bool = False):
    """Membership mirror of :func:`make_count_step_packed`: each table
    shard answers its own queries from one group-row gather (+ deep
    scan; dup2 buckets need none — a lane hit is definitive), then a
    psum over the table axis ORs the per-shard verdicts. The (reads, L)
    hit matrix stays sharded over the data axis (positions past L-k are
    False). Raises at call time on compaction-capacity overflow. With
    ``from_kmers`` queries are a flat pre-hashed uint64 batch padded
    with :data:`KMER_PAD` (padding answers False) and the verdicts come
    back as a flat data-sharded vector."""
    from jax import shard_map
    from ..ops.encode import combine_u32_pair, sliding_hashes_u32
    from ..ops.lookup import _decode_group_rows, _compact_overflow

    m2_local = shards.m2_local
    max_scan = shards.max_scan
    modulo2 = shards.modulo2

    def local_step(reads, records, row_kmers, row_nodes):
        records = records[0]
        row_kmers = row_kmers[0]
        t_idx = jax.lax.axis_index(table_axis).astype(jnp.int64)

        if from_kmers:
            flat = reads.reshape(-1)
            r_loc, L = flat.shape[0], 1
            n_q = r_loc
            valid = flat < jnp.uint64(1 << 62)
            kmers = jnp.where(valid, flat, jnp.uint64(0))
        else:
            r_loc, L = reads.shape
            n_q = r_loc * L
            flat = reads.reshape(-1)
            # u32-lane ladder + one combine (u64 emulated on TPU)
            hashes = combine_u32_pair(*sliding_hashes_u32(flat, k))
            pos = jnp.arange(n_q) % L
            valid = pos <= L - k
            kmers = jnp.where(valid, hashes, jnp.uint64(0))

        bucket = (kmers % jnp.uint64(modulo2)).astype(jnp.int64)
        owner = bucket // m2_local
        mine = (owner == t_idx) & valid
        lb = jnp.clip(bucket - t_idx * m2_local, 0,
                      m2_local - 1).astype(jnp.int32)
        q_lo = (kmers & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        q_hi = (kmers >> jnp.uint64(32)).astype(jnp.uint32)
        n0, r3, sz, dup2, hit0, hit1 = _decode_group_rows(
            records, lb // 16, lb % 16, q_lo, q_hi)
        hit = (hit0 | hit1) & mine

        dropped = jnp.int32(0)
        if max_scan > 2:
            # a lane hit answers membership outright: dup2 buckets and
            # first-row-matched deep buckets skip the scan
            deep = (sz > 2) & mine & ~hit
            cap = min(max(1024, n_q // 8), n_q)
            oq, ostart, osz, oi, n_over = _compact_overflow(
                kmers, deep, r3, sz, cap)
            scan = jnp.arange(max_scan, dtype=jnp.int32)
            rows = jnp.minimum(ostart[:, None] + scan[None, :],
                               row_kmers.shape[0] - 1)
            ovalid = jnp.arange(oq.shape[0]) < jnp.minimum(n_over, cap)
            mask = ((scan[None, :] < osz[:, None])
                    & (row_kmers[rows] == oq[:, None]) & ovalid[:, None])
            ohit = jnp.any(mask, axis=1)
            hit = hit.at[jnp.where(ovalid & ohit, oi, n_q)].set(
                True, mode="drop")
            dropped = jnp.maximum(0, n_over - cap)

        hit = jax.lax.psum(hit.astype(jnp.int32), table_axis) > 0
        dropped = jax.lax.psum(dropped, (data_axis, table_axis))
        if from_kmers:
            return hit, dropped
        return hit.reshape(r_loc, L), dropped

    P_ = P
    q_spec = P_(data_axis) if from_kmers else P_(data_axis, None)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(q_spec, P_(table_axis, None, None),
                  P_(table_axis, None), P_(table_axis, None)),
        out_specs=(q_spec, P_()),
    )
    jitted = jax.jit(step)

    def run(reads, records, row_kmers, row_nodes):
        hit, dropped = jitted(reads, records, row_kmers, row_nodes)
        if int(dropped) > 0:
            raise RuntimeError(
                "packed sharded membership: deep-query compaction "
                "capacity exceeded; use the CSR step for this batch")
        return hit

    return run


def merge_flat_kmers_all_gather(mesh, shard_arrays, axis: str = "data"):
    """Merge per-device FlatKmers shards with an all_gather collective.

    The reference merges worker FlatKmers with a host-side
    ``np.concatenate`` after fork-join (flat_kmers.py:71-90,
    cli:601-616). On a mesh, each device holds its shard of the four row
    arrays; one ``all_gather`` over the ``axis`` (ICI) leaves every
    device with the concatenated arrays, in shard order — bit-identical
    to the host merge. ``shard_arrays`` = (hashes, nodes, ref_offsets,
    allele_frequencies), each sharded over ``axis``.
    """
    from jax import shard_map

    def gather(h, n, r, a):
        return (jax.lax.all_gather(h, axis, tiled=True),
                jax.lax.all_gather(n, axis, tiled=True),
                jax.lax.all_gather(r, axis, tiled=True),
                jax.lax.all_gather(a, axis, tiled=True))

    specs = P(axis)
    fn = shard_map(gather, mesh=mesh, in_specs=(specs,) * 4,
                   out_specs=(P(),) * 4, check_vma=False)
    return fn(*shard_arrays)


def run_sharded_function(func, n_shards, array_args):
    """Data-parallel map over the leading axis of the array args — the
    reference's ``run_numpy_based_function_in_parallel``
    (shared_mem.py:123-176) with mesh devices in place of forked
    processes. Array args are sharded over a 1-D device mesh and ``func``
    (jax-traceable, output row-aligned with its input rows, like the
    reference's slice-into-shared-memory contract) runs on every device's
    shard simultaneously under shard_map; results concatenate in shard
    order. ``n_shards`` caps the device count used."""
    lengths = {len(a) for a in array_args if isinstance(a, np.ndarray)}
    assert len(lengths) == 1, "array args must share leading length"
    n = lengths.pop()
    devs = jax.devices()[:max(1, min(int(n_shards), len(jax.devices())))]
    d = len(devs)
    pad = (-n) % d
    padded = [np.concatenate([x, np.repeat(x[:1], pad, axis=0)])
              if pad and isinstance(x, np.ndarray) else x
              for x in array_args]

    from jax import shard_map
    mesh = Mesh(np.array(devs), ("data",))
    in_specs = tuple(P("data") if isinstance(x, np.ndarray) else P()
                     for x in array_args)
    fn = shard_map(func, mesh=mesh, in_specs=in_specs,
                   out_specs=P("data"), check_vma=False)
    out = np.asarray(jax.jit(fn)(*padded))
    return out[:n]


# ---------------------------------------------------------------------------
# Sharded index BUILD: rows all_to_all'd to their bucket-range owners,
# each shard builds its packed-record slice locally.
#
# This closes the build side of the 2-D serving layout: until now the
# packed table was built on ONE device (ops.lookup._build_packed) or on
# host (PackedTableShards.from_index) and then sharded; at human-genome
# scale (2.5G rows, ~50 GB of row arrays) no single device can hold the
# build. Here the input rows start data-sharded across the mesh axis,
# each device routes every row to the shard owning its internal-modulo
# bucket range (ONE all_to_all — the only collective), and each shard
# then sorts its received rows by (local bucket, original row index) —
# reproducing the global stable sort exactly — and scatters its record
# groups. Equivalent of the reference's fork+concatenate build
# (collision_free_kmer_index.py:422-467) lifted onto ICI.
# ---------------------------------------------------------------------------



def _route_rows_to_owners(kc, nc, axis, per, n, modulo, m_local, cap,
                          n_table, sent_k):
    """Traced helper (called inside shard_map bodies): group this
    device's rows by owning shard — stable, so ranks are deterministic —
    and all_to_all the fixed-capacity segments. Returns
    (recv_kmers, recv_nodes, n_overflowed).

    ORDER INVARIANT the builders rely on: the received array's position
    encodes the global original row index. Within each (src, dst)
    segment rows keep the source's original order (stable owner sort +
    ascending ranks), segments arrive ordered by source id, and source s
    holds global rows [s*per, (s+1)*per) — so received position order ==
    global original order, and no original-index payload has to cross
    the wire (a third of the exchange volume, and what previously
    limited builds to 2^31 GLOBAL rows instead of 2^31 rows PER
    SHARD)."""
    i = jax.lax.axis_index(axis).astype(jnp.int32)
    # int64 scalar arithmetic: i*per overflows int32 once the GLOBAL row
    # count passes 2^31 (per-shard counts still must fit int32)
    local_limit = n - i.astype(jnp.int64) * per
    valid = jnp.arange(per, dtype=jnp.int64) < local_limit
    bucket = (kc % jnp.uint64(modulo)).astype(jnp.int64)
    owner = jnp.where(valid, bucket // m_local,
                      jnp.int64(n_table)).astype(jnp.int32)
    ow_s, perm = jax.lax.sort_key_val(
        owner, jnp.arange(per, dtype=jnp.int32), is_stable=True)
    k_s, n_s = kc[perm], nc[perm]
    cnt = jnp.zeros(n_table + 1, jnp.int32).at[ow_s].add(1)
    seg_start = jnp.cumsum(cnt) - cnt
    rank = jnp.arange(per, dtype=jnp.int32) - seg_start[ow_s]
    dropped = jnp.maximum(0, jnp.max(cnt[:n_table]) - cap)

    oob = jnp.int32(n_table * cap)
    dst = jnp.where((ow_s < n_table) & (rank < cap),
                    ow_s * cap + rank, oob)
    stage_k = jnp.full(n_table * cap, sent_k).at[dst].set(k_s, mode="drop")
    stage_n = jnp.zeros(n_table * cap, jnp.uint32).at[dst].set(
        n_s, mode="drop")
    # THE collective: segment j of every device lands on device j
    recv = [jax.lax.all_to_all(st.reshape(n_table, cap), axis, 0, 0,
                               tiled=True).reshape(-1)
            for st in (stage_k, stage_n)]
    return recv[0], recv[1], dropped


def _sort_received(recv_k, recv_n, axis, m_local, modulo, sent_k):
    """Traced helper: sort this shard's received rows by local bucket,
    STABLE — received position order is global original order (see
    _route_rows_to_owners), so this reproduces the global stable bucket
    sort restricted to the shard's range; sentinels (interspersed as
    per-segment tail padding) sort to the end. Returns
    (local_buckets, kmers, nodes, n_valid)."""
    i = jax.lax.axis_index(axis).astype(jnp.int64)
    got = recv_k != sent_k
    lb = (recv_k % jnp.uint64(modulo)).astype(jnp.int64) - i * m_local
    lb32 = jnp.where(got, lb, jnp.int64(m_local)).astype(jnp.int32)
    lb_s, k_s, n_s = jax.lax.sort(
        (lb32, recv_k, recv_n), num_keys=1, is_stable=True)
    m = jnp.sum(got.astype(jnp.int32))
    return lb_s, k_s, n_s, m


def build_packed_shards_sharded(kmers: np.ndarray, nodes: np.ndarray,
                                n_table: int | None = None,
                                axis: str = "table",
                                capacity_factor: float = 1.3,
                                n_rows: int | None = None,
                                return_device: bool = False):
    """Build :class:`PackedTableShards` with the build itself sharded.

    ``kmers``/``nodes`` are the global rows — host numpy, device jax
    arrays (e.g. straight from the device finalize — no host
    round-trip), or, in a multi-process ``jax.distributed`` run,
    pre-padded GLOBAL arrays with ``n_rows`` giving the true row count
    (padding must make the length a multiple of n_table; eager padding
    of non-addressable arrays is impossible, so the caller pads).
    Returns (PackedTableShards, per-shard row counts). With
    ``return_device`` the shard arrays stay jax arrays (required in
    multi-process runs where the full arrays are not addressable).
    Bit-equal to ``PackedTableShards.from_index`` on the same rows
    (pinned by tests/test_parallel.py).

    Raises if any (source, destination) segment overflows the padded
    all_to_all capacity (``capacity_factor`` x the uniform expectation;
    random 62-bit hashes concentrate tightly around it).
    """
    from jax import shard_map
    from ..ops.lookup import internal_modulo, SCAN_CAP, _DUP2

    on_device = isinstance(kmers, jnp.ndarray)
    if not on_device:
        kmers = np.asarray(kmers, dtype=np.uint64)
        nodes = np.asarray(nodes, dtype=np.uint32)
    n = int(n_rows) if n_rows is not None else len(kmers)
    n_devices = len(jax.devices())
    n_table = min(n_table or n_devices, n_devices)
    mesh = Mesh(np.asarray(jax.devices()[:n_table]), (axis,))

    modulo2 = internal_modulo(n)
    per_shard_buckets = -(-modulo2 // n_table)
    m2_local = 16 * (-(-per_shard_buckets // 16))  # groups never straddle
    if n_rows is not None:
        assert len(kmers) % n_table == 0, \
            "pre-padded input length must be a multiple of n_table"
        per = len(kmers) // n_table
    else:
        per = -(-max(n, 1) // n_table)             # rows per source device
    # only PER-SHARD index spaces must fit int32 (received position
    # order carries the global original order — no global index exists
    # on device); the global row count is bounded by n_table * 2^31
    assert per < 2**31, \
        "per-shard row-index space exceeds int32; raise n_table"
    cap = min(per, int(capacity_factor * per / n_table) + 1024)
    n_groups = m2_local // 16
    rcap = n_table * cap                           # rows per dest shard

    pad = n_table * per - len(kmers)
    if on_device:
        k_p, n_p = kmers.astype(jnp.uint64), nodes.astype(jnp.uint32)
        if pad:  # eager pad impossible on non-addressable global arrays
            k_p = jnp.concatenate([k_p, jnp.zeros(pad, jnp.uint64)])
            n_p = jnp.concatenate([n_p, jnp.zeros(pad, jnp.uint32)])
    else:
        k_p = np.concatenate([kmers, np.zeros(pad, np.uint64)])
        n_p = np.concatenate([nodes, np.zeros(pad, np.uint32)])

    sent_k = jnp.uint64((1 << 63))   # hashes < 4^31: never a real kmer

    def local_build(kc, nc):
        recv_k, recv_n, dropped = _route_rows_to_owners(
            kc, nc, axis, per, n, modulo2, m2_local, cap, n_table, sent_k)
        lb_s, k_sorted, n_sorted, m = _sort_received(
            recv_k, recv_n, axis, m2_local, modulo2, sent_k)

        rows_idx = jnp.arange(rcap, dtype=jnp.int32)
        in_range = rows_idx < m
        is_first = jnp.concatenate(
            [jnp.ones(1, bool), lb_s[1:] != lb_s[:-1]]) & in_range
        is_second = jnp.concatenate(
            [jnp.zeros(1, bool), is_first[:-1]]) & ~is_first & in_range
        sizes_tbl = jnp.zeros(m2_local + 1, jnp.int32).at[
            jnp.where(in_range, lb_s, m2_local)].add(1, mode="drop")
        sz_row = sizes_tbl[jnp.minimum(lb_s, m2_local)]
        from ..ops.lookup import _dup2_masks
        dup_b, dup_a = _dup2_masks(is_second, sz_row, k_sorted)
        dup_b, dup_a = dup_b & in_range, dup_a & in_range

        flat_len = 8 * m2_local
        oobr = jnp.int32(flat_len)
        tb = jnp.where(in_range, lb_s * 8, oobr)
        ks_lo = (k_sorted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        ks_hi = (k_sorted >> jnp.uint64(32)).astype(jnp.uint32)
        rec = jnp.full(flat_len, jnp.uint32(0xFFFFFFFF))
        base = jnp.where(is_first, tb,
                         jnp.where(is_second & (sz_row == 2) & ~dup_b,
                                   tb + 4, oobr))
        rec = rec.at[base].set(ks_lo, mode="drop")
        rec = rec.at[base + 1].set(ks_hi, mode="drop")
        rec = rec.at[base + 2].set(n_sorted, mode="drop")
        szv = sz_row.astype(jnp.uint32) | jnp.where(
            dup_a, jnp.uint32(_DUP2), jnp.uint32(0))
        rec = rec.at[jnp.where(is_first, tb + 3, oobr)].set(
            ~szv, mode="drop")
        t_deep = jnp.where(is_first & ((sz_row > 2) | dup_a),
                           tb + 6, oobr)
        rec = rec.at[t_deep].set(rows_idx.astype(jnp.uint32),
                                 mode="drop")

        row_k = jnp.where(in_range, k_sorted, jnp.uint64(0))
        row_n = jnp.where(in_range, n_sorted.astype(jnp.int32), 0)
        # scalar diagnostics reduce INSIDE the one program (pmax ->
        # replicated outputs): no extra jits, and the scalars fetch fine
        # even when the shard arrays are not fully addressable
        # (multi-process runs)
        max_sz = jax.lax.pmax(jnp.max(sizes_tbl[:m2_local]), axis)
        any_dup = jax.lax.pmax(jnp.any(dup_b).astype(jnp.int32), axis)
        dropped = jax.lax.pmax(dropped, axis)
        return (rec.reshape(1, n_groups, 128), row_k.reshape(1, -1),
                row_n.reshape(1, -1), m.reshape(1),
                max_sz, any_dup, dropped)

    fn = shard_map(
        local_build, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis, None, None), P(axis, None), P(axis, None),
                   P(axis), P(), P(), P()),
        check_vma=False)
    rec, row_k, row_n, counts, max_szs, dups, dropped = jax.jit(fn)(
        k_p if on_device else jnp.asarray(k_p),
        n_p if on_device else jnp.asarray(n_p))
    if int(dropped) > 0:
        raise RuntimeError(
            "sharded build: an all_to_all segment overflowed its padded "
            "capacity; raise capacity_factor (pathological hash skew)")
    max_scan = int(max_szs)
    if max_scan > SCAN_CAP:
        raise ValueError(
            "table has buckets deeper than SCAN_CAP; use the CSR "
            "TableShards for this index")
    has_dup = bool(int(dups))
    if return_device:
        shards = PackedTableShards(rec, row_k, row_n, m2_local, modulo2,
                                   max(1, max_scan), n_table,
                                   has_dup=has_dup)
        return shards, counts
    shards = PackedTableShards(
        np.asarray(rec), np.asarray(row_k), np.asarray(row_n),
        m2_local, modulo2, max(1, max_scan), n_table, has_dup=has_dup)
    return shards, np.asarray(counts)


def build_table_shards_sharded(kmers: np.ndarray, nodes: np.ndarray,
                               modulo: int, n_table: int | None = None,
                               axis: str = "table",
                               capacity_factor: float = 1.3,
                               n_rows: int | None = None,
                               return_device: bool = False):
    """Build :class:`TableShards` (the CSR bucket layout, used when a
    table has buckets deeper than the packed layout's SCAN_CAP — e.g.
    poly-A-heavy genomes) with the build itself sharded: the same ONE
    all_to_all row exchange as :func:`build_packed_shards_sharded`, then
    each shard scatters its local starts/sizes tables. ``modulo`` is the
    index's own hash modulo (TableShards shards the index layout, not
    the internal packed modulo). Returns (TableShards, per-shard row
    counts). Semantically equal to ``TableShards.from_index`` — starts
    of EMPTY buckets differ (0 here vs a meaningless re-based offset
    there); queries only read starts where sizes > 0.

    Input rows must NOT already be sorted by ``kmer % modulo`` (the
    natural case: finder emission order, hash-random): a bucket-sorted
    input puts each source chunk's rows almost entirely on ONE owner
    and overflows the padded exchange by construction. For rows taken
    from an existing index (already bucket-sorted), use
    ``TableShards.from_index`` — each shard's rows are a contiguous
    slice there, no exchange needed.
    """
    from jax import shard_map

    on_device = isinstance(kmers, jnp.ndarray)
    if not on_device:
        kmers = np.asarray(kmers, dtype=np.uint64)
        nodes = np.asarray(nodes, dtype=np.uint32)
    n = int(n_rows) if n_rows is not None else len(kmers)
    n_devices = len(jax.devices())
    n_table = min(n_table or n_devices, n_devices)
    mesh = Mesh(np.asarray(jax.devices()[:n_table]), (axis,))

    modulo = int(modulo)
    m_local = -(-modulo // n_table)
    if n_rows is not None:
        assert len(kmers) % n_table == 0, \
            "pre-padded input length must be a multiple of n_table"
        per = len(kmers) // n_table
    else:
        per = -(-max(n, 1) // n_table)
    assert per < 2**31, \
        "per-shard row-index space exceeds int32; raise n_table"
    cap = min(per, int(capacity_factor * per / n_table) + 1024)
    rcap = n_table * cap

    pad = n_table * per - len(kmers)
    if on_device:
        k_p, n_p = kmers.astype(jnp.uint64), nodes.astype(jnp.uint32)
        if pad:  # eager pad impossible on non-addressable global arrays
            k_p = jnp.concatenate([k_p, jnp.zeros(pad, jnp.uint64)])
            n_p = jnp.concatenate([n_p, jnp.zeros(pad, jnp.uint32)])
    else:
        k_p = np.concatenate([kmers, np.zeros(pad, np.uint64)])
        n_p = np.concatenate([nodes, np.zeros(pad, np.uint32)])

    sent_k = jnp.uint64((1 << 63))

    def local_build(kc, nc):
        recv_k, recv_n, dropped = _route_rows_to_owners(
            kc, nc, axis, per, n, modulo, m_local, cap, n_table, sent_k)
        lb_s, k_sorted, n_sorted, m = _sort_received(
            recv_k, recv_n, axis, m_local, modulo, sent_k)

        rows_idx = jnp.arange(rcap, dtype=jnp.int32)
        in_range = rows_idx < m
        lbc = jnp.where(in_range, lb_s, m_local)
        sizes = jnp.zeros(m_local + 1, jnp.int32).at[lbc].add(
            1, mode="drop")[:m_local]
        is_first = jnp.concatenate(
            [jnp.ones(1, bool), lb_s[1:] != lb_s[:-1]]) & in_range
        starts = jnp.zeros(m_local, jnp.int32).at[
            jnp.where(is_first, lb_s, m_local)].set(
                rows_idx, mode="drop")
        row_k = jnp.where(in_range, k_sorted, jnp.uint64(0))
        row_n = jnp.where(in_range, n_sorted.astype(jnp.int32), 0)
        # replicated scalar diagnostics (see build_packed_shards_sharded)
        max_sz = jax.lax.pmax(jnp.max(sizes), axis)
        dropped = jax.lax.pmax(dropped, axis)
        return (starts.reshape(1, -1), sizes.reshape(1, -1),
                row_k.reshape(1, -1), row_n.reshape(1, -1),
                m.reshape(1), max_sz, dropped)

    fn = shard_map(
        local_build, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(axis, None), P(axis), P(), P()),
        check_vma=False)
    starts, sizes, row_k, row_n, counts, max_szs, dropped = jax.jit(fn)(
        k_p if on_device else jnp.asarray(k_p),
        n_p if on_device else jnp.asarray(n_p))
    if int(dropped) > 0:
        raise RuntimeError(
            "sharded CSR build: an all_to_all segment overflowed its "
            "padded capacity. Bucket-sorted input (e.g. rows taken from "
            "an existing index) skews every source chunk onto one owner "
            "— use TableShards.from_index for already-built indexes, or "
            "raise capacity_factor for mild hash skew")
    max_scan = max(1, int(max_szs))
    if return_device:
        return TableShards(starts, sizes, row_k, row_n, m_local, modulo,
                           max_scan, n_table), counts
    shards = TableShards(
        np.asarray(starts).astype(np.int64), np.asarray(sizes),
        np.asarray(row_k), np.asarray(row_n), m_local, modulo,
        max_scan, n_table)
    return shards, np.asarray(counts)


def frequencies_sharded(kmers, ref_offsets, n_shards: int | None = None,
                        axis: str = "table",
                        capacity_factor: float = 1.3):
    """Per-row kmer frequencies (distinct ref offsets per kmer — the
    reference set_frequencies semantics, collision_free_kmer_index.py
    :267-293) computed SHARDED: rows route to ``kmer % n_shards``
    owners (one all_to_all — same-kmer rows co-locate, so each owner
    counts its kmers completely), each shard runs the 4-lane
    lexicographic sort + distinct-pair count locally, and the
    frequencies ride the symmetric all_to_all back to their source
    rows. Output aligned to input order; equal to
    ops.build.frequencies_device (pinned by tests/test_parallel.py).
    """
    from jax import shard_map

    kmers = np.asarray(kmers, dtype=np.uint64)
    ref_offsets = np.asarray(ref_offsets, dtype=np.uint64)
    n = len(kmers)
    if n == 0:
        return np.zeros(0, dtype=np.uint16)
    n_devices = len(jax.devices())
    ns = min(n_shards or n_devices, n_devices)
    mesh = Mesh(np.asarray(jax.devices()[:ns]), (axis,))
    per = -(-n // ns)
    assert per < 2**31, \
        "per-shard row-index space exceeds int32; raise n_shards"
    cap = min(per, int(capacity_factor * per / ns) + 1024)
    pad = ns * per - n
    k_p = np.concatenate([kmers, np.zeros(pad, np.uint64)])
    r_p = np.concatenate([ref_offsets, np.zeros(pad, np.uint64)])
    sent = jnp.uint64(1 << 63)
    oob = jnp.int32(ns * cap)

    def local(kc, rc):
        i = jax.lax.axis_index(axis).astype(jnp.int32)
        # int64 scalar arithmetic: i*per overflows int32 past 2^31 rows
        local_limit = n - i.astype(jnp.int64) * per
        valid = jnp.arange(per, dtype=jnp.int64) < local_limit
        owner = jnp.where(valid, (kc % jnp.uint64(ns)).astype(jnp.int32),
                          jnp.int32(ns))
        ow_s, perm = jax.lax.sort_key_val(
            owner, jnp.arange(per, dtype=jnp.int32), is_stable=True)
        k_s, r_s = kc[perm], rc[perm]
        cnt = jnp.zeros(ns + 1, jnp.int32).at[ow_s].add(1)
        seg = jnp.cumsum(cnt) - cnt
        rank = jnp.arange(per, dtype=jnp.int32) - seg[ow_s]
        dropped = jnp.maximum(0, jnp.max(cnt[:ns]) - cap)
        dst = jnp.where((ow_s < ns) & (rank < cap), ow_s * cap + rank, oob)
        stage_k = jnp.full(ns * cap, sent).at[dst].set(k_s, mode="drop")
        stage_r = jnp.zeros(ns * cap, jnp.uint64).at[dst].set(
            r_s, mode="drop")
        recv_k = jax.lax.all_to_all(stage_k.reshape(ns, cap), axis, 0, 0,
                                    tiled=True).reshape(-1)
        recv_r = jax.lax.all_to_all(stage_r.reshape(ns, cap), axis, 0, 0,
                                    tiled=True).reshape(-1)

        # the single-device distinct-pair kernel runs per shard as-is:
        # sentinel rows (k_hi >= 2^31) group at the end and their
        # frequencies are never read back (wide_offsets: offsets may
        # reach 2^32)
        from ..ops.build import _frequencies_full_device
        freq_recv = _frequencies_full_device(recv_k,
                                             recv_r.astype(jnp.int64),
                                             True)

        # symmetric return trip: segment j goes back to source device j,
        # landing at exactly the stage slots this device filled
        back = jax.lax.all_to_all(freq_recv.reshape(ns, cap), axis, 0, 0,
                                  tiled=True).reshape(-1)
        f_s = back[jnp.minimum(dst, oob - 1)]
        f_chunk = jnp.zeros(per, jnp.int32).at[perm].set(f_s)
        return f_chunk.reshape(1, -1), jax.lax.pmax(dropped, axis)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis, None), P()), check_vma=False)
    freqs, dropped = jax.jit(fn)(jnp.asarray(k_p), jnp.asarray(r_p))
    if int(dropped) > 0:
        raise RuntimeError(
            "frequencies_sharded: an all_to_all segment overflowed; "
            "raise capacity_factor (pathological kmer skew)")
    return np.asarray(freqs).reshape(-1)[:n].astype(np.uint16)
