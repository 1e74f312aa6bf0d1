"""Batched device lookup into modulo-bucket k-mer tables.

Replaces the reference's native hot paths: CythonKmerIndex.get
(cython_kmer_index.pyx:22-109, the two-pass bucket scan) and the external
``kmer_mapper`` package's map_kmers_to_graph_index / in_graph_index
(used at collision_free_kmer_index.py:210-232).

Design: a query's bucket is a contiguous row range [start, start+n). With
MAX_SCAN = max bucket size (static, computed at build), every query
becomes a dense (n_queries, MAX_SCAN) gather + vectorized kmer-equality
mask — no data-dependent shapes, so XLA tiles it. Node counting is a
scatter-add (segment-sum) over the masked hits, which is the KAGE
genotyping kernel (CounterKmerIndex.get_node_counts,
collision_free_kmer_index.py:39-40).

Queries are padded to a fixed quantum and masked with a dynamic valid
count, so jit caches stay warm across variable batch sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# hard caps mirroring the Cython reference (cython_kmer_index.pyx:62-63,93-99)
DEFAULT_HIT_CAP = 10000
DEFAULT_FREQUENCY_CAP = 20

_PAD = 1024  # query padding quantum for jit cache reuse


def _bucket_hits_from_ranges(kmers, n_valid, table_kmers, start, n,
                             n_rows, max_scan):
    """Bucket scan given per-query [start, start+n) row ranges.

    Returns (row_idx, hit_mask): row indices (n_q, max_scan) and boolean
    hit mask (False for padded queries)."""
    scan = jnp.arange(max_scan, dtype=jnp.int64)
    rows = start.astype(jnp.int64)[:, None] + scan[None, :]
    rows_c = jnp.minimum(rows, n_rows - 1)
    stored = table_kmers[rows_c]
    qvalid = jnp.arange(kmers.shape[0]) < n_valid
    mask = ((scan[None, :] < n[:, None])
            & (stored == kmers[:, None])
            & qvalid[:, None])
    return rows_c, mask


@functools.partial(jax.jit, static_argnums=(7,))
def _bucket_hits(kmers, n_valid, table_kmers, starts_tbl, sizes_tbl, modulo,
                 n_rows, max_scan):
    """Per-query bucket scan via the modulo-sized bucket tables.

    Returns (row_idx, hit_mask, n_in_bucket): row indices (n_q, max_scan),
    boolean hit mask (False for padded queries), and bucket sizes."""
    bucket = (kmers % modulo).astype(jnp.int64)
    start = starts_tbl[bucket]
    n = sizes_tbl[bucket].astype(jnp.int32)
    rows_c, mask = _bucket_hits_from_ranges(kmers, n_valid, table_kmers,
                                            start, n, n_rows, max_scan)
    return rows_c, mask, n


@jax.jit
def _ranges_from_tables(kmers, starts_tbl, sizes_tbl, modulo):
    """Per-query [start, size) row range via the modulo-sized bucket
    tables: two random gathers per query (~78M/s each). Preferred when
    the tables are cheap (small modulo) or already resident in HBM
    (device-built indexes)."""
    b = (kmers % modulo).astype(jnp.int64)
    return starts_tbl[b], sizes_tbl[b].astype(jnp.int32)


@jax.jit
def _ref_bucket_ranges(qb, tb):
    """Per-query [start, size) row range under the REFERENCE modulo,
    WITHOUT the modulo-sized bucket tables.

    The row arrays are sorted by reference bucket, so a query's range is
    (searchsorted left, searchsorted right) in the sorted bucket column
    ``tb``. A direct device searchsorted is a ~24-step dependent-gather
    binary search (~3M/s); instead ONE merged stable sort of
    [table*2+1, query*2 (left probes), query*2+2 (right probes)] gives
    every probe's rank, and #table-rows-before = merged_pos − probe_rank.
    At measured rates (sort ~450-650M items/s, modulo-table gathers
    ~78M/s) the two range sources are roughly a WASH per batch at scale;
    this one's value is memory: no modulo-sized tables (3.6+ GB of HBM
    plus a multi-minute tunnel transfer at the production modulo, vs an
    n-sized int32 column). Probe-key
    collisions (right probe of bucket b == left probe of b+1) are
    harmless: no table row separates equal keys, so both probes read
    the same count.
    """
    n = tb.shape[0]
    n_q = qb.shape[0]
    keys = jnp.concatenate(
        [tb * 2 + 1, qb * 2, qb * 2 + 2]).astype(tb.dtype)
    pv = jnp.concatenate([
        jnp.full(n, -1, jnp.int32),
        jnp.arange(n_q, dtype=jnp.int32),
        n_q + jnp.arange(n_q, dtype=jnp.int32)])
    _, pv_s = jax.lax.sort_key_val(keys, pv, is_stable=True)
    m = n + 2 * n_q
    is_q = pv_s >= 0
    _, qpos = jax.lax.sort_key_val((~is_q).astype(jnp.int32),
                                   jnp.arange(m, dtype=jnp.int32),
                                   is_stable=True)
    qpos = qpos[:2 * n_q]
    j = jnp.arange(2 * n_q, dtype=jnp.int32)
    cnt = qpos - j  # table rows before this probe
    qid = pv_s[qpos]
    left = jnp.zeros(n_q, jnp.int32).at[
        jnp.where(qid < n_q, qid, n_q)].set(cnt, mode="drop")
    right = jnp.zeros(n_q, jnp.int32).at[
        jnp.where(qid >= n_q, qid - n_q, n_q)].set(cnt, mode="drop")
    return left, right - left


@functools.partial(jax.jit, static_argnums=(7, 8))
def _node_counts(kmers, n_valid, table_kmers, table_nodes, starts_tbl,
                 sizes_tbl, modulo, n_nodes, max_scan):
    rows, mask, _ = _bucket_hits(kmers, n_valid, table_kmers, starts_tbl,
                                 sizes_tbl, modulo, table_kmers.shape[0],
                                 max_scan)
    nodes = table_nodes[rows]
    counts = jnp.zeros(n_nodes, dtype=jnp.int32)
    return counts.at[nodes.reshape(-1)].add(mask.reshape(-1).astype(jnp.int32))


# -- packed-record internal-modulo layout -----------------------------------
#
# Measured on this chip (benchmarks/bench_primitives.py, v5e): random
# gather of contiguous 16-32B records ~100M/s, 8B gather ~78M/s,
# scatter-add ~150M/s isolated, device sort ~450-650M/s. The fastest
# exact lookup is
# therefore ONE gather of a packed 32-byte record per query — NOT the
# reference's bucket-pointer chase (cython_kmer_index.pyx:57-72), which
# costs 2 + 2*bucket_size dependent random reads.
#
# The record table lives under an INTERNAL modulo (next prime >= 2x the
# row count, load factor <= 0.5) decoupled from the reference's on-disk
# modulo — same query results, ~3x less HBM than modulo-sized lanes at
# the production table. Record for bucket b: [k0, node0|size<<32, k1,
# node1-or-start]: buckets of size <= 2 resolve from the record alone;
# deeper buckets (rare at this load factor: the record's 4th lane then
# holds the bucket's start row) are compacted by prefix-sum to a
# fixed-capacity side batch scanned CSR-style against the
# internally-sorted rows.

_EMPTY = (1 << 64) - 1  # never matches a query: hashes are < 4^62

# size-lane flag for "dup2" buckets: size-2 buckets holding the SAME
# kmer twice (a multiplicity-2 kmer alone in its bucket). Without the
# flag both record lanes hit for such queries, forcing the counts path
# to aggregate TWO full-size node lists; flagged, the k1 lanes stay
# EMPTY, lane 6 holds the bucket's start row, and the (rare) hitting
# queries resolve in the deep scan — lane hits become mutually
# exclusive and counts aggregation halves. Bit 30: the complemented
# size lane must stay positive as int32 (bit 31 is the EMPTY default).
_DUP2 = 1 << 30


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def internal_modulo(n_rows: int) -> int:
    """Next prime >= max(67, 2*n_rows + 1): load factor <= 0.5 keeps
    buckets of size > 2 (the compacted slow path) rare."""
    m = max(67, 2 * n_rows + 1)
    while not _is_prime(m):
        m += 1
    return m


@functools.partial(jax.jit, static_argnums=(2,))
def _packed_sort(kmers, nodes, modulo2):
    """Stage 1: sort rows by internal bucket. int32 keys/permutation
    when the modulo fits: int64 is X64Combine-emulated on this TPU and
    sorts/gathers ~2x slower."""
    n = kmers.shape[0]
    bucket = kmers % jnp.uint64(modulo2)
    bucket = (bucket.astype(jnp.int32) if modulo2 < 2**31
              else bucket.astype(jnp.int64))
    idx = jnp.arange(n, dtype=jnp.int32)
    bs, perm = jax.lax.sort_key_val(bucket, idx, is_stable=True)
    return bs, kmers[perm], nodes[perm].astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=(1,))
def _packed_sizes(bs, modulo2):
    """Stage 2: per-row bucket sizes + max bucket size."""
    sizes_tbl = jnp.zeros(modulo2, jnp.int32).at[bs].add(1, mode="drop")
    return sizes_tbl[bs], jnp.max(sizes_tbl)


@functools.partial(jax.jit, static_argnums=(2,))
def _packed_stage1(kmers, nodes, modulo2):
    """Fused stage 1: sort by internal bucket + per-row bucket sizes +
    max bucket size + deep-row count, ONE compile unit.

    Previously this was two jits (_packed_sort, _packed_sizes) plus
    ~10 eager kernels for the dup2 masks and the deep-fraction sum; on
    this sandbox each eager dispatch is its own remote compile, and
    those dominated the measured packed-build wall time (the scatter
    campaign itself runs at ~9 M rows/s). The big record buffer still
    builds in a separate stage (_packed_records) so the sort
    temporaries here never coexist with it in HBM."""
    n = kmers.shape[0]
    bucket = kmers % jnp.uint64(modulo2)
    bucket = (bucket.astype(jnp.int32) if modulo2 < 2**31
              else bucket.astype(jnp.int64))
    bs, perm = jax.lax.sort_key_val(
        bucket, jnp.arange(n, dtype=jnp.int32), is_stable=True)
    ks = kmers[perm]
    ns = nodes[perm].astype(jnp.uint32)
    sizes_tbl = jnp.zeros(modulo2, jnp.int32).at[bs].add(1, mode="drop")
    sz_row = sizes_tbl[bs]
    max_sz = jnp.max(sizes_tbl)
    # deep rows (size > 2 or dup2 pairs) size the lookup kernels' deep-
    # query compaction capacity — an all-hit batch's deep share
    # approaches this fraction
    is_first = jnp.concatenate([jnp.ones(1, bool), bs[1:] != bs[:-1]])
    is_second = jnp.concatenate([jnp.zeros(1, bool), is_first[:-1]]) \
        & ~is_first
    dup_b, dup_a = _dup2_masks(is_second, sz_row, ks)
    deep_count = jnp.sum((sz_row > 2) | dup_a | dup_b)
    return bs, ks, ns, sz_row, max_sz, deep_count


def _dup2_masks(is_second, sz_row, ks, xp=jnp):
    """The dup2-bucket masks, shared by every packed-record builder
    (device build here, numpy shard build in parallel.sharded).

    A "dup2" bucket holds the SAME kmer twice (two nodes): its lane
    hits would otherwise double-count, so the second slot is
    suppressed and the bucket is flagged deep (_DUP2 bit in the size
    lane) to resolve in the scan. Returns ``(dup_b, dup_a)``:
    ``dup_b`` marks the second row of such a bucket, ``dup_a`` its
    first row (the one whose size lane carries the flag)."""
    if ks.shape[0] == 0:  # concatenate([zeros(1), empty]) is length 1
        return is_second, is_second
    zero = xp.zeros(1, bool)
    dup_b = (is_second & (sz_row == 2)
             & xp.concatenate([zero, ks[1:] == ks[:-1]]))
    dup_a = xp.concatenate([dup_b[1:], zero])
    return dup_b, dup_a


@functools.partial(jax.jit, static_argnums=(4,))
def _packed_records(bs, ks, ns, sz_row, modulo2):
    """Stage 2: the (groups, 128) uint32 record table (16 buckets/row).

    Record for bucket b, lanes [8b..8b+8): [k0_lo, k0_hi, node0, ~size,
    k1_lo, k1_hi, node1_or_start, spare]. All-uint32 on purpose: uint64
    on this TPU is emulated (X64Combine), and any 2-D uint64 buffer
    produced in-program gets a (8,128)-tiled layout that pads a narrow
    minor dim 32x (32 GB at the production table). The size lane is
    stored complemented so the all-ones EMPTY default reads as size 0,
    and the sentinel kmer lanes can never match a query (hashes < 4^31).
    Staging (see _build_packed) keeps peak HBM at ~records + row arrays."""
    n = bs.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones(1, bool), bs[1:] != bs[:-1]])
    is_second = jnp.concatenate([jnp.zeros(1, bool), is_first[:-1]]) \
        & ~is_first
    # flat length padded to a 128 multiple: the 2-D view packs 16
    # buckets (16 x 8 lanes) per 128-lane row, the only minor-dim size
    # the TPU stores without tile padding
    flat_len = 8 * (-(-modulo2 // 16) * 16)
    # int32 scatter indices whenever the buffer fits: int64 scatter
    # indices are emulated and cost ~7x (measured on _bucket_tables)
    idt = jnp.int32 if flat_len < 2**31 else jnp.int64
    oob = idt(flat_len)
    tb = bs.astype(idt) * 8
    ks_lo = (ks & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ks_hi = (ks >> jnp.uint64(32)).astype(jnp.uint32)
    rec = jnp.full(flat_len, jnp.uint32(0xFFFFFFFF))
    # dup2 buckets (see _DUP2): second slot suppressed, size lane
    # flagged, lane 6 re-purposed as the bucket's start row
    dup_b, dup_a = _dup2_masks(is_second, sz_row, ks)
    # ONE scatter triple covers both slots — the bucket's first row
    # targets lane base 8b, its second (size-2 buckets only) 8b+4; the
    # n-sized scatters dominate this stage, so 5 instead of 8 of them
    # is a direct ~1.5x
    base = jnp.where(is_first, tb,
                     jnp.where(is_second & (sz_row == 2) & ~dup_b,
                               tb + 4, oob))
    rec = rec.at[base].set(ks_lo, mode="drop")
    rec = rec.at[base + 1].set(ks_hi, mode="drop")
    rec = rec.at[base + 2].set(ns, mode="drop")
    szv = sz_row.astype(jnp.uint32) | jnp.where(
        dup_a, jnp.uint32(_DUP2), jnp.uint32(0))
    rec = rec.at[jnp.where(is_first, tb + 3, oob)].set(~szv, mode="drop")
    t_deep = jnp.where(is_first & ((sz_row > 2) | dup_a), tb + 6, oob)
    rec = rec.at[t_deep].set(idx.astype(jnp.uint32), mode="drop")
    # 16 buckets (16 x 8 lanes) per 128-lane row — the only minor-dim
    # size the TPU stores without (8,128) tile padding; reshaping here
    # keeps the whole record stage one compile unit
    return rec.reshape(rec.shape[0] // 128, 128)


def _build_packed(kmers, nodes, modulo2):
    """Sorted rows + (modulo2, 8) record table, built in stages so sort
    temporaries free before the record buffer allocates. Also returns
    the fraction of rows in deep (size > 2) buckets — it sizes the
    deep-query compaction capacity of the lookup kernels (an all-hit
    query batch's deep share approaches it)."""
    n = int(kmers.shape[0])
    if n == 0:
        bs, ks, ns = _packed_sort(kmers, nodes, modulo2)
        sz_row = jnp.zeros(0, jnp.int32)
        max_sz, deep_frac = 0, 0.0
    else:
        bs, ks, ns, sz_row, max_sz, deep_count = _packed_stage1(
            kmers, nodes, modulo2)
        jax.block_until_ready(ks)  # stage boundary: free sort temporaries
        max_sz = int(max_sz)
        # dup2 rows count toward the deep fraction: their hit queries go
        # through the same compaction (an all-hit batch's deep share
        # approaches this number)
        deep_frac = int(deep_count) / n
    rec = _packed_records(bs, ks, ns, sz_row, modulo2)
    jax.block_until_ready(rec)
    return rec, ks, ns, max_sz, deep_frac


def _decode_group_rows(records, row, slot, q_lo, q_hi):
    """Core of the packed decode: ONE 512-byte group-row gather per
    query (the bucket's 16-bucket group), then a vectorized slot-select
    — compares in native uint32 lanes, no second gather. ``row``/
    ``slot`` address bucket ``b`` as (b // 16, b % 16); shared by the
    single-chip path and the table-sharded mesh path (which offsets
    ``row`` into its local record shard)."""
    g = records[row]  # (n_q, 128): THE one random access per query
    # lane-relative index per column; stays in the gathered row's natural
    # layout (a (n,16,8) reshape forces a tile-padded relayout that costs
    # ~20x the gather itself)
    rel = (jnp.arange(128, dtype=jnp.int32)[None, :]
           - (slot * 8)[:, None])

    def sel(lane):
        return jnp.sum(jnp.where(rel == lane, g, 0), axis=1,
                       dtype=jnp.uint32)

    # size lane is stored complemented (EMPTY default reads as 0);
    # bit 30 is the dup2 flag (see _DUP2)
    raw = (~sel(3)).astype(jnp.int32)
    dup2 = raw >= _DUP2
    sz = raw & (_DUP2 - 1)
    n0 = sel(2).astype(jnp.int32)
    r3 = sel(6)  # node1 (size 2), else bucket start row (deep / dup2)
    hit0 = (sel(0) == q_lo) & (sel(1) == q_hi)
    hit1 = (sel(4) == q_lo) & (sel(5) == q_hi)
    return n0, r3, sz, dup2, hit0, hit1


def _packed_decode(records, kmers, n_valid, modulo2):
    """Single-chip packed decode head (see _decode_group_rows)."""
    n_q = kmers.shape[0]
    qvalid = jnp.arange(n_q) < n_valid
    # int32 bucket/row index when the modulo fits (int64 arithmetic and
    # gather indices are emulated on this TPU)
    b = kmers % jnp.uint64(modulo2)
    b = (b.astype(jnp.int32) if modulo2 < 2**31 else b.astype(jnp.int64))
    q_lo = (kmers & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    q_hi = (kmers >> jnp.uint64(32)).astype(jnp.uint32)
    n0, r3, sz, dup2, hit0, hit1 = _decode_group_rows(
        records, b // 16, (b % 16).astype(jnp.int32), q_lo, q_hi)
    hit0 = hit0 & qvalid
    hit1 = hit1 & qvalid
    deep = (sz > 2) & qvalid
    return qvalid, n0, r3, sz, dup2, hit0, hit1, deep


def _compact_overflow(kmers, deep, r3, sz, overflow_cap):
    """Sort-based compaction of deep-bucket queries into fixed-capacity
    (kmers, starts, sizes, orig_idx, n_overflow) side arrays.

    A stable sort by NOT-deep floats the deep queries to the front in
    original order; device sort runs ~450-650M items/s on this chip —
    several times cheaper than the prefix-sum + full-size scatter
    formulation."""
    n = deep.shape[0]
    key = (~deep).astype(jnp.int32)
    # int32 payload: query chunks are capped at 2^22, and halving the
    # payload bytes measurably speeds the 600M items/s device sort
    _, oi_full = jax.lax.sort_key_val(
        key, jnp.arange(n, dtype=jnp.int32), is_stable=True)
    n_overflow = jnp.sum(deep.astype(jnp.int32))
    oi = oi_full[:overflow_cap]
    # cap-sized gathers from the compacted positions; int32 row starts
    # (table rows < 2^31 everywhere; int64 indexing is emulated)
    oq = kmers[oi]
    ostart = r3[oi].astype(jnp.int32)
    osz = sz[oi]
    return oq, ostart, osz, oi, n_overflow


# buckets deeper than this are 'ultra' (repeat kmers like poly-A on real
# genomes): they skip the on-device scan — whose (cap, max_scan) matrix
# must stay bounded — and resolve on host, deduplicated per unique kmer
SCAN_CAP = 256

# sort-key sentinel for missed hits: sorts after every real node id
_NODE_SENT = jnp.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnums=(2,))
def _compact_masked_unique(kmers, mask, cap):
    """Deduplicated masked kmers, computed on device: returns
    (first ``cap`` unique masked kmers, their multiplicities, n_unique).
    Lets callers fetch just the handful of host-resolved (ultra-deep)
    query VALUES instead of the whole chunk + mask — at production
    chunk sizes 36 MB of device->host transfer per chunk avoided, and
    repeat-heavy read batches (one poly-A kmer repeated 10^4-10^5
    times) dedup to a few dozen fetched values."""
    n = kmers.shape[0]
    # unmasked -> all-ones sentinel (above any k<=31 hash), sorts last
    s = jax.lax.sort(jnp.where(mask, kmers, ~jnp.uint64(0)))
    n_masked = jnp.sum(mask, dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), s[1:] != s[:-1]]) & (idx < n_masked)
    n_unique = jnp.sum(is_start, dtype=jnp.int32)
    # run starts compacted to the front in ascending order
    _, pos = jax.lax.sort_key_val((~is_start).astype(jnp.int32), idx,
                                  is_stable=True)
    posc = pos[:cap]
    nxt = jnp.concatenate([posc[1:], jnp.full((1,), n, jnp.int32)])
    i = jnp.arange(posc.shape[0], dtype=jnp.int32)
    runlen = jnp.where(i < n_unique - 1, nxt, n_masked) - posc
    return s[posc], jnp.maximum(runlen, 0), n_unique


@jax.jit
def _fixup_membership(hit, mask, kmers, present_sorted):
    """Overwrite ``hit`` at masked positions with membership of the
    query kmer in ``present_sorted`` (sorted, padded with a > 4^31
    sentinel) — the device-side application of the host-resolved
    ultra-bucket verdicts."""
    pos = jnp.searchsorted(present_sorted, kmers)
    pos = jnp.minimum(pos, present_sorted.shape[0] - 1)
    isin = present_sorted[pos] == kmers
    return jnp.where(mask, isin, hit)


# padding sentinel for _fixup_membership: above any k<=31 hash (< 4^31)
_PRESENT_SENT = np.uint64(1) << np.uint64(63)


def _present_padded(present):
    """Sorted uint64 array of the present ultra kmers, padded to a
    power-of-two length with _PRESENT_SENT (bounds _fixup_membership
    recompiles to the size ladder)."""
    arr = np.fromiter(present, np.uint64, len(present))
    size = 1 << max(0, int(len(arr) - 1).bit_length())
    out = np.full(max(1, size), _PRESENT_SENT, dtype=np.uint64)
    out[:len(arr)] = np.sort(arr)
    return out


def _aggregate_counts_sorted(node_lists, n_nodes):
    """Dense node counts from hit-node id arrays (misses = _NODE_SENT).

    Isolated rates on this chip (benchmarks/bench_counts_agg.py, 8.4M
    hits, 1M nodes): full-batch scatter-add ~150M updates/s, device sort
    ~650M items/s, this aggregation 190M hits/s — ~25% cheaper than
    direct scatters when n_nodes is well below the hit count (2 sorts +
    one scatter of min(m, n_nodes+1) run-lengths instead of m updates).
    NB round 2's "72M/s scatter floor" was a chain artifact: that
    harness's loop body folded a same-size random gather into the
    measured op."""
    allnodes = jnp.concatenate(node_lists)
    m = allnodes.shape[0]
    s = jax.lax.sort(allnodes)
    is_start = (s != _NODE_SENT) & jnp.concatenate(
        [jnp.ones(1, bool), s[1:] != s[:-1]])
    n_runs = jnp.sum(is_start, dtype=jnp.int32)
    n_valid = jnp.sum(s != _NODE_SENT, dtype=jnp.int32)
    # stable sort by NOT-start floats run-start positions to the front
    # in ascending order
    _, pos = jax.lax.sort_key_val(
        (~is_start).astype(jnp.int32), jnp.arange(m, dtype=jnp.int32),
        is_stable=True)
    cap = min(m, n_nodes + 1)
    posc = pos[:cap]
    nxt = jnp.concatenate([posc[1:], jnp.full((1,), m, jnp.int32)])
    i = jnp.arange(cap, dtype=jnp.int32)
    # run i spans [posc[i], next run start); the last run ends at the
    # first sentinel position (= n_valid, sentinels sort to the back)
    run_len = jnp.where(i < n_runs - 1, nxt, n_valid) - posc
    u = jnp.where(i < n_runs, s[posc], n_nodes)  # OOB -> dropped
    counts = jnp.zeros(n_nodes, dtype=jnp.int32)
    return counts.at[u].add(run_len, mode="drop")


def _lane_counts(kmers, n_valid, records, modulo2, n_nodes, sort_agg):
    """Decode + lane-hit node counts (shared trace head). Deep-bucket
    queries are counted exclusively by the overflow scan (their record
    lanes duplicate the bucket's first rows), so their lane hits are
    masked out here."""
    n_q = kmers.shape[0]
    qvalid, n0, r3, sz, dup2, hit0, hit1, deep = _packed_decode(
        records, kmers, n_valid, modulo2)
    ultra = (sz > SCAN_CAP) & qvalid
    # dup2 buckets need the scan only when the query actually matches
    # (hit0 = both rows); misses in them resolve from the lanes alone
    deep = (deep | (dup2 & hit0)) & ~ultra
    hit0 = hit0 & ~deep & ~ultra
    hit1 = hit1 & ~deep & ~ultra
    # dup2 flagging makes hit0/hit1 mutually exclusive, so ONE n_q-sized
    # node list covers both lanes (round 2 aggregated two)
    node_lists = [jnp.where(hit0, n0,
                            jnp.where(hit1, r3.astype(jnp.int32),
                                      _NODE_SENT))]
    use_sorted = sort_agg and (n_nodes + 1) < (3 * n_q) // 4
    counts = None
    if not use_sorted:
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        for nl in node_lists:
            counts = counts.at[jnp.where(nl == _NODE_SENT, n_nodes, nl)
                               ].add(1, mode="drop")
    return counts, ultra, deep, r3, sz, node_lists, use_sorted


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _counts_decode_packed(kmers, n_valid, records, modulo2, n_nodes,
                          cap_hi, sort_agg):
    """Stage A of the counts path: decode, aggregate the lane hits, and
    compact the deep-bucket queries to a generous static capacity
    (compaction is a ~600M items/s sort — cheap; the SCAN matrix is
    not, so it lives in stage B sized to the true overflow count).
    Returns (lane_counts, ultra_mask, oq, ostart, osz, n_overflow);
    with cap_hi == 0 (no deep buckets in the table) the overflow pieces
    are None/0."""
    counts, ultra, deep, r3, sz, node_lists, use_sorted = _lane_counts(
        kmers, n_valid, records, modulo2, n_nodes, sort_agg)
    if use_sorted:
        counts = _aggregate_counts_sorted(node_lists, n_nodes)
    if not cap_hi:
        return counts, ultra, None, None, None, jnp.int32(0)
    oq, ostart, osz, _oi, n_overflow = _compact_overflow(
        kmers, deep, r3, sz, cap_hi)
    return counts, ultra, oq, ostart, osz, n_overflow


@functools.partial(jax.jit, static_argnums=(3, 4))
def _member_decode_packed(kmers, n_valid, records, modulo2, cap_hi):
    """Stage A of the membership path: decode + lane verdicts + deep
    compaction. Returns (hit, ultra_mask, oq, ostart, osz, oi,
    n_overflow)."""
    qvalid, n0, r3, sz, dup2, hit0, hit1, deep = _packed_decode(
        records, kmers, n_valid, modulo2)
    hit = hit0 | hit1
    ultra = (sz > SCAN_CAP) & qvalid & ~hit
    # a lane hit answers membership outright — deep buckets whose first
    # row matched, and ALL dup2 buckets, skip the scan
    deep = deep & ~ultra & ~hit
    if not cap_hi:
        return hit, ultra, None, None, None, None, jnp.int32(0)
    oq, ostart, osz, oi, n_overflow = _compact_overflow(
        kmers, deep, r3, sz, cap_hi)
    return hit, ultra, oq, ostart, osz, oi, n_overflow


def _overflow_scan_mask(oq, ostart, osz, n_overflow, kmers_i, max_scan):
    """(scan_cap, max_scan) row indices + hit mask for the compacted
    deep queries; entries past n_overflow are compaction garbage and
    masked off."""
    scan = jnp.arange(min(max_scan, SCAN_CAP), dtype=jnp.int32)
    rows = jnp.minimum(ostart[:, None] + scan[None, :],
                       kmers_i.shape[0] - 1)
    ovalid = jnp.arange(oq.shape[0], dtype=jnp.int32) < n_overflow
    mask = ((scan[None, :] < osz[:, None]) & (kmers_i[rows] == oq[:, None])
            & ovalid[:, None])
    return rows, mask, ovalid


@functools.partial(jax.jit, static_argnums=(6, 7))
def _overflow_scan_counts(oq, ostart, osz, n_overflow, kmers_i, nodes_i,
                          n_nodes, max_scan):
    """Stage B of the counts path: scan the deep buckets of the
    compacted queries (sliced by the caller to a power-of-two >= the
    true overflow count) and return their node-count contribution."""
    rows, mask, _ = _overflow_scan_mask(oq, ostart, osz, n_overflow,
                                        kmers_i, max_scan)
    onodes = jnp.where(mask, nodes_i[rows].astype(jnp.int32), n_nodes)
    counts = jnp.zeros(n_nodes, dtype=jnp.int32)
    return counts.at[onodes.reshape(-1)].add(1, mode="drop")


@functools.partial(jax.jit, static_argnums=(7,))
def _overflow_scan_member(hit, oi, oq, ostart, osz, n_overflow, kmers_i,
                          max_scan):
    """Stage B of the membership path: scan the deep buckets and set
    the hit flags of the compacted queries (via their original indices
    ``oi``)."""
    rows, mask, ovalid = _overflow_scan_mask(oq, ostart, osz, n_overflow,
                                             kmers_i, max_scan)
    ohit = jnp.any(mask, axis=1)
    return hit.at[jnp.where(ovalid & ohit, oi, hit.shape[0])].set(
        True, mode="drop")


@functools.partial(jax.jit, static_argnums=(6,))
def _has_kmers(kmers, n_valid, table_kmers, starts_tbl, sizes_tbl, modulo,
               max_scan):
    _, mask, _ = _bucket_hits(kmers, n_valid, table_kmers, starts_tbl,
                              sizes_tbl, modulo, table_kmers.shape[0],
                              max_scan)
    return jnp.any(mask, axis=1)


@functools.partial(jax.jit, static_argnums=(9, 12))
def _get_batched_kernel(kmers, n_valid, table_kmers, table_nodes,
                        table_ref_offsets, table_frequencies,
                        table_allele_frequencies, start, n_bucket,
                        max_scan, hit_cap, freq_cap, max_total):
    """Fully on-device batched get with compaction: hits scatter into a
    fixed (5, max_total) matrix by prefix-sum position; returns the
    matrix + true hit count (caller re-runs with a bigger max_total on
    overflow). Replaces the Cython two-pass scan
    (cython_kmer_index.pyx:57-107). Per-query bucket ranges come from
    ``_ref_bucket_ranges`` (no modulo-sized tables)."""
    rows, mask = _bucket_hits_from_ranges(kmers, n_valid, table_kmers,
                                          start, n_bucket,
                                          table_kmers.shape[0], max_scan)
    mask = mask & (n_bucket <= hit_cap)[:, None]
    mask = mask & (table_frequencies[rows] <= freq_cap)
    flat_mask = mask.reshape(-1)
    pos = jnp.cumsum(flat_mask.astype(jnp.int64)) - 1
    n_hits = pos[-1] + 1 if flat_mask.shape[0] else jnp.int64(0)
    out_idx = jnp.where(flat_mask, pos, max_total)  # overflow -> dropped
    rows_f = rows.reshape(-1)
    qi = (jnp.arange(flat_mask.shape[0], dtype=jnp.int64)
          // jnp.int64(max_scan))
    out = jnp.zeros((5, max_total + 1), dtype=jnp.uint64)
    out = out.at[0, out_idx].set(table_nodes[rows_f].astype(jnp.uint64),
                                 mode="drop")
    out = out.at[1, out_idx].set(table_ref_offsets[rows_f].astype(jnp.uint64),
                                 mode="drop")
    out = out.at[2, out_idx].set(qi.astype(jnp.uint64), mode="drop")
    out = out.at[3, out_idx].set(table_frequencies[rows_f].astype(jnp.uint64),
                                 mode="drop")
    out = out.at[4, out_idx].set(
        (table_allele_frequencies[rows_f] * 1000).astype(jnp.uint64),
        mode="drop")
    return out[:, :max_total], n_hits


def _pad_queries(kmers):
    """Pad the query batch onto a geometric size ladder (×1.25 steps from
    1024) so the number of distinct jit shapes — and therefore compiles —
    is bounded (~40 across 1k..1B queries) at ≤25% padding waste."""
    n = len(kmers)
    padded = _PAD
    while padded < n:
        padded = -(-(padded * 5) // (4 * _PAD)) * _PAD
    out = np.zeros(padded, dtype=np.uint64)
    out[:n] = kmers
    return out, n


class DeviceKmerIndex:
    """Device-resident view of a CollisionFreeKmerIndex.

    Arrays transfer to HBM LAZILY, per query path: the packed map/has
    path needs only (kmers, nodes); the reference-modulo bucket tables
    (modulo-sized — 3.6+ GB at the production modulo) and the full row
    arrays transfer only when the CSR fallback or ``get_batched``
    actually reads them. At 66M rows the eager transfer plus the packed
    build used to exceed a v5e's 16 GB HBM.
    """

    _LAZY = {
        "table_kmers": ("_kmers", jnp.uint64),
        "table_nodes": ("_nodes", jnp.int32),
        "table_ref_offsets": ("_ref_offsets", jnp.int64),
        "table_frequencies": ("_frequencies", jnp.int32),
        "table_allele_frequencies": ("_allele_frequencies", jnp.float32),
        "starts_tbl": ("_hashes_to_index", jnp.int32),
        "sizes_tbl": ("_n_kmers", jnp.int32),
    }

    def __init__(self, host_index):
        self._host = host_index
        self._cache = {}
        self.modulo = jnp.uint64(host_index._modulo)
        self._max_scan = None

    def __getattr__(self, name):
        spec = DeviceKmerIndex._LAZY.get(name)
        if spec is None:
            raise AttributeError(name)
        if name not in self._cache:
            attr, dtype = spec
            value = getattr(self._host, attr)
            if name == "table_frequencies":
                n = len(self._host._kmers)
                if np.ndim(value) == 0 or np.shape(value)[0] != n:
                    value = np.zeros(n, dtype=np.uint16)
            if name == "table_allele_frequencies":
                n = len(self._host._kmers)
                if (value is None or np.ndim(value) == 0
                        or np.shape(value)[0] != n):
                    value = np.zeros(n, dtype=np.float32)
            if name == "table_ref_offsets":
                # remove_ref_offsets() placeholder: same zero-substitute
                # as the native table (an n-gather over a 1-element
                # array would silently return row 0's offset)
                n = len(self._host._kmers)
                if np.ndim(value) == 0 or np.shape(value)[0] != n:
                    value = np.zeros(n, dtype=np.uint64)
            self._cache[name] = jnp.asarray(value).astype(dtype)
        return self._cache[name]

    # modulo-sized bucket tables below this are considered cheap to hold
    # (and, for host-built indexes, to transfer) — above it, per-query
    # ranges come from the merged-sort searchsorted over the n-sized
    # bucket column instead
    BUCKET_TABLE_BYTE_BUDGET = 256 << 20

    def _bucket_tables_cheap(self):
        """True when get_batched should use the modulo-sized bucket
        tables (two fast gathers/query): they are already device-resident
        (device-built index), or small enough to transfer and keep."""
        if "starts_tbl" in self._cache:
            return True
        host = self._host._hashes_to_index
        if host is not None and not isinstance(host, np.ndarray):
            return True  # already a device array (device-built index)
        return int(self.modulo) * 12 <= self.BUCKET_TABLE_BYTE_BUDGET

    @property
    def sorted_buckets(self):
        """Reference-modulo bucket id per row (rows are bucket-sorted) —
        n-sized, NOT modulo-sized: with ``_ref_bucket_ranges`` it replaces
        the starts/sizes bucket tables (3.6+ GB at the production modulo)
        for ``get_batched``. int32 when 2*modulo+2 fits."""
        if "sorted_buckets" not in self._cache:
            tb = self.table_kmers % self.modulo
            dtype = (jnp.int32 if 2 * int(self.modulo) + 2 < 2**31
                     else jnp.int64)
            self._cache["sorted_buckets"] = tb.astype(dtype)
        return self._cache["sorted_buckets"]

    @property
    def max_scan(self):
        if self._max_scan is None:
            sizes = self._host._n_kmers
            if np.shape(sizes)[0] == 0:
                self._max_scan = 1
            elif isinstance(sizes, jnp.ndarray):
                # device-built tables: reduce on device, fetch the scalar
                # (a 452M-element host fetch through this tunnel is ~6 min)
                self._max_scan = max(1, int(jnp.max(sizes)))
            else:
                self._max_scan = max(1, int(np.max(sizes)))
        return self._max_scan

    @classmethod
    def from_host_index(cls, index):
        """Device view; index arrays may be numpy (transferred on first
        use) or already-device jax arrays (zero copy — the device-build
        path leaves the modulo-sized bucket tables in HBM)."""
        return cls(index)

    # the packed record table costs internal_modulo * 32 bytes of HBM
    # (~= n_rows * 64B at load factor 0.5); above this budget the CSR
    # scan path is used instead
    PACKED_BYTE_BUDGET = 8 << 30

    def _packed(self):
        """(records, kmers_sorted, nodes_sorted, modulo2, max_scan2),
        built lazily on device; None when over the HBM budget."""
        if getattr(self, "_packed_tables", None) is None:
            n = int(self.table_kmers.shape[0])
            modulo2 = internal_modulo(n)
            if modulo2 * 32 > self.PACKED_BYTE_BUDGET:
                self._packed_tables = False
            else:
                rec, ks, ns, max_sz, deep_frac = _build_packed(
                    self.table_kmers, self.table_nodes, modulo2)
                self._deep_frac = deep_frac
                self._packed_tables = (rec, ks, ns, modulo2, int(max_sz))
        return self._packed_tables or None

    def _overflow_hint(self, n_q):
        """Deep-query COMPACTION capacity for a batch of n_q: sized
        from the table's own deep-row fraction with a 1.25x margin,
        power-of-two. Compaction at this cap is cheap (a sort + three
        cap-sized gathers); the expensive scan matrix is sized
        separately from the true overflow count (_overflow_pieces)."""
        frac = getattr(self, "_deep_frac", None)
        if frac is None:
            frac = 0.125
        cap = int(1.25 * frac * n_q) + 1024
        return min(n_q, max(1024, 1 << int(cap - 1).bit_length()))

    # queries per device dispatch; bounds the (chunk, max_scan) working set
    QUERY_CHUNK = 1 << 22

    # UNIQUE host-resolved kmers fetched per chunk before falling back
    # to the full mask+chunk transfer (pathological: >128k distinct
    # ultra-deep kmers in one chunk)
    ULTRA_FETCH_CAP = 1 << 17

    def _fetch_masked_kmers(self, chunk_dev, host_mask):
        """The host-resolved (ultra-deep / overflow-exceeded) query
        kmers of a device chunk as (unique values, multiplicities),
        deduplicated and compacted ON DEVICE: only n_unique values ever
        cross the link, instead of the full chunk and mask (32 + 4 MB
        per 4M-query chunk; this sandbox's host link runs ~5 MB/s, so
        the full fetch would cost more than the lookup itself)."""
        packed = self._packed()
        if packed is not None and packed[4] <= SCAN_CAP:
            # no bucket exceeds SCAN_CAP, so the ultra mask is provably
            # all-False — skip the two full-chunk device sorts
            # _compact_masked_unique would launch (the common case:
            # real tables rarely have >SCAN_CAP-deep buckets at all)
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        uq, mult, n_unique = _compact_masked_unique(
            chunk_dev, host_mask, self.ULTRA_FETCH_CAP)
        n_unique = int(n_unique)
        if n_unique == 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        if n_unique > self.ULTRA_FETCH_CAP:  # pathological; stay exact
            km = np.asarray(chunk_dev)[np.asarray(host_mask)]
            return np.unique(km, return_counts=True)
        return (np.asarray(uq[:n_unique], dtype=np.uint64),
                np.asarray(mult[:n_unique], dtype=np.int64))

    def _ultra_rows(self, uniq, mult=None):
        """Yield (kmer, multiplicity, bucket_nodes_matching) for each
        unique ultra-deep-bucket query — one bounded-chunk device scan
        per unique kmer (repeat kmers like poly-A dedup to a handful).
        ``uniq``/``mult`` come deduplicated from _fetch_masked_kmers;
        a raw (possibly repeating) kmer array also works."""
        import jax
        rec, ks, ns, modulo2, _ = self._packed()
        n_rows = int(ks.shape[0])
        chunk = min(4096, n_rows)
        if mult is None:
            uniq, mult = np.unique(np.asarray(uniq, dtype=np.uint64),
                                   return_counts=True)
        for kq, m in zip(uniq.tolist(), mult.tolist()):
            b = int(kq) % modulo2
            group = np.asarray(rec[b // 16])
            meta = group[(b % 16) * 8:(b % 16) * 8 + 8]
            sz = int(~int(meta[3]) & 0xFFFFFFFF) & (_DUP2 - 1)
            start = int(meta[6])
            matches = []
            for off in range(0, sz, chunk):
                ln = min(chunk, sz - off)
                s0 = min(start + off, max(0, n_rows - chunk))
                delta = (start + off) - s0
                kk = np.asarray(jax.lax.dynamic_slice(ks, (s0,), (chunk,)))
                nn = np.asarray(jax.lax.dynamic_slice(ns, (s0,), (chunk,)))
                sel = kk[delta:delta + ln] == kq
                matches.append(nn[delta:delta + ln][sel])
            yield kq, m, (np.concatenate(matches) if matches
                          else np.zeros(0, np.uint32))

    def _overflow_finish(self, chunk, nvc, decode, cap_hi, out):
        """Resolve a dispatched decode stage A (returns (..., oq, ostart,
        osz[, oi], n_overflow)): fetch the TRUE overflow count, re-run A
        at a bigger compaction capacity in the rare case it exceeds
        ``cap_hi``, then slice the compacted arrays to a power-of-two
        just covering it for stage B. Returns (A outputs, sliced
        overflow pieces or None). The split keeps the expensive static
        (cap x max_scan) scan matrix exactly sized: an oversized cap
        measured 1.7x on the whole lookup, and zero-deep batches skip
        stage B entirely. The n_overflow fetch here is the chunk's one
        device sync — the chunked drivers dispatch the NEXT chunk's
        stage A before calling this so the device never idles on it."""
        if not cap_hi:
            return out, None
        n_over = int(out[-1])
        if n_over > cap_hi:
            cap_hi = min(chunk.shape[0], 1 << int(n_over - 1).bit_length())
            out = decode(chunk, nvc, cap_hi)
        if n_over == 0:
            return out, None
        scan_cap = min(cap_hi, max(1024, 1 << int(n_over - 1).bit_length()))
        pieces = tuple(a[:scan_cap] for a in out[2:-1])
        return out, pieces

    def _overflow_pieces(self, chunk, nvc, decode, cap_hi):
        """Single-shot dispatch + finish (see _overflow_finish)."""
        return self._overflow_finish(chunk, nvc, decode, cap_hi,
                                     decode(chunk, nvc, cap_hi))

    def _counts_packed_dispatch(self, chunk, nvc, n_nodes):
        """Dispatch stage A (decode) of the counts A/B split for one
        device chunk; no device sync. Returns opaque state for
        _counts_packed_finish."""
        rec, ks, ns, modulo2, max_sz = self._packed()
        # dup2 hits resolve ONLY in the scan (deep_frac counts their
        # rows), so max_sz == 2 alone does not disable it
        cap_hi = (0 if max_sz <= 2 and not getattr(self, "_deep_frac", 0)
                  else self._overflow_hint(chunk.shape[0]))
        decode = lambda c, v, cap: _counts_decode_packed(  # noqa: E731
            c, v, rec, modulo2, int(n_nodes), cap, True)
        return (chunk, nvc, decode, cap_hi, decode(chunk, nvc, cap_hi),
                ks, ns, max_sz, n_nodes)

    def _counts_packed_finish(self, state):
        """Resolve a dispatched counts chunk (the one n_overflow sync) and
        run stage B. Returns (device counts, host_mask of unresolved =
        ultra queries)."""
        chunk, nvc, decode, cap_hi, out, ks, ns, max_sz, n_nodes = state
        out, pieces = self._overflow_finish(chunk, nvc, decode, cap_hi,
                                            out)
        counts, ultra = out[0], out[1]
        if pieces is not None:
            oq, ostart, osz = pieces
            counts = counts + _overflow_scan_counts(
                oq, ostart, osz, out[-1], ks, ns, int(n_nodes), max_sz)
        return counts, ultra

    def _counts_packed_full(self, chunk, nvc, n_nodes):
        """Counts for one device chunk via the A/B split; returns
        (device counts, host_mask of unresolved = ultra queries)."""
        return self._counts_packed_finish(
            self._counts_packed_dispatch(chunk, nvc, n_nodes))

    def _member_packed_dispatch(self, chunk, nvc):
        """Dispatch stage A (decode) of the membership A/B split for one
        device chunk; no device sync."""
        rec, ks, ns, modulo2, max_sz = self._packed()
        cap_hi = (0 if max_sz <= 2
                  else self._overflow_hint(chunk.shape[0]))
        decode = lambda c, v, cap: _member_decode_packed(  # noqa: E731
            c, v, rec, modulo2, cap)
        return (chunk, nvc, decode, cap_hi, decode(chunk, nvc, cap_hi),
                ks, max_sz)

    def _member_packed_finish(self, state):
        """Resolve a dispatched membership chunk; returns (device hit
        flags, host_mask of unresolved = ultra queries)."""
        chunk, nvc, decode, cap_hi, out, ks, max_sz = state
        out, pieces = self._overflow_finish(chunk, nvc, decode, cap_hi,
                                            out)
        hit, ultra = out[0], out[1]
        if pieces is not None:
            oq, ostart, osz, oi = pieces
            hit = _overflow_scan_member(hit, oi, oq, ostart, osz,
                                        out[-1], ks, max_sz)
        return hit, ultra

    def _member_packed_full(self, chunk, nvc):
        """Membership for one device chunk via the A/B split; returns
        (device hit flags, host_mask of unresolved = ultra queries)."""
        return self._member_packed_finish(
            self._member_packed_dispatch(chunk, nvc))

    def _has_kmers_packed_device(self, qj, n):
        """Packed membership for ONE padded device batch. ``qj`` may be
        sharded over a data mesh (the packed tables must then be
        replicated on the same devices, see parallel.sharded)."""
        out, host_mask = self._member_packed_full(qj, n)
        km, mult = self._fetch_masked_kmers(qj, host_mask)
        if len(km):
            present = {kq for kq, _m, nodes in
                       self._ultra_rows(km, mult) if len(nodes)}
            out = _fixup_membership(out, host_mask, qj,
                                    jnp.asarray(_present_padded(present)))
        return out

    def has_kmers(self, kmers: np.ndarray) -> np.ndarray:
        if len(kmers) > self.QUERY_CHUNK:
            return np.concatenate(
                [self.has_kmers(kmers[i:i + self.QUERY_CHUNK])
                 for i in range(0, len(kmers), self.QUERY_CHUNK)])
        kmers = np.asarray(kmers, dtype=np.uint64)
        q, n = _pad_queries(kmers)
        packed = self._packed()
        if packed is not None:
            out = self._has_kmers_packed_device(jnp.asarray(q), n)
            return np.asarray(out)[:n]
        out = _has_kmers(jnp.asarray(q), n, self.table_kmers,
                         self.starts_tbl, self.sizes_tbl, self.modulo,
                         self.max_scan)
        return np.asarray(out)[:n]

    def _iter_device_chunks(self, read_kmers):
        """Yield (chunk u64 device array, n_valid) pieces of a
        DeviceReadKmers batch, each at most QUERY_CHUNK long, without
        fetching any kmer to host. Chunks are static slices (one
        compiled lookup shape per chunk size)."""
        import jax.numpy as jnp
        C = self.QUERY_CHUNK
        for seg, nv in read_kmers.segments:
            n = seg.shape[0]
            for off in range(0, max(nv, 1), C):
                nvc = min(nv - off, C)
                if nvc <= 0:
                    break
                chunk = seg if n <= C else seg[off:off + C]
                if chunk.shape[0] < 1024:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros(1024 - chunk.shape[0],
                                          jnp.uint64)])
                yield chunk, nvc

    def map_read_kmers(self, read_kmers, n_nodes: int) -> np.ndarray:
        """Node hit counts for a DeviceReadKmers batch: the query kmers
        never cross the device->host link (the host path pays ~16
        bytes/kmer in transfers; at this environment's ~5 MB/s tunnel
        that dwarfs the lookup itself). Ultra-deep buckets still resolve
        on host, but only those rare kmers are fetched."""
        import jax
        import jax.numpy as jnp
        packed = self._packed()
        if packed is None:
            return self.map_kmers(read_kmers.to_numpy(), n_nodes)
        total = None
        host_adjust = None

        # one-deep software pipeline: the NEXT chunk's decode is queued
        # before the current chunk's n_overflow fetch (its one device
        # sync), so the device works through chunk i+1 while the host
        # waits on chunk i. Dispatch-ahead costs no extra HBM: buffers
        # allocate when a dispatch EXECUTES, and execution stays serial.
        pend = None

        def resolve(state):
            nonlocal total, host_adjust
            counts, host_mask = self._counts_packed_finish(state)
            # accumulate across chunks in int64 (emulated but one
            # n_nodes-sized add per chunk): int32 totals wrap negative
            # past 2^31 hits/node on billion-kmer read sets, and the
            # numpy-input map_kmers path sums chunks in int64 already
            counts = counts.astype(jnp.int64)
            total = counts if total is None else total + counts
            km, mult = self._fetch_masked_kmers(state[0], host_mask)
            if len(km):
                if host_adjust is None:
                    host_adjust = np.zeros(n_nodes, dtype=np.int64)
                for _kq, m, nodes_hit in self._ultra_rows(km, mult):
                    np.add.at(host_adjust, nodes_hit.astype(np.int64), m)

        for chunk, nvc in self._iter_device_chunks(read_kmers):
            state = self._counts_packed_dispatch(chunk, nvc, n_nodes)
            if pend is not None:
                resolve(pend)
            pend = state
        if pend is not None:
            resolve(pend)
        if total is None:
            return np.zeros(n_nodes, dtype=np.int64)
        res = np.asarray(total).astype(np.int64)
        if host_adjust is not None:
            res += host_adjust
        return res

    def has_read_kmers(self, read_kmers) -> np.ndarray:
        """Membership for a DeviceReadKmers batch (order == to_numpy())."""
        import jax.numpy as jnp
        packed = self._packed()
        if packed is None:
            return self.has_kmers(read_kmers.to_numpy())
        out = []
        # one-deep software pipeline (see map_read_kmers): next chunk's
        # decode queues before this chunk's n_overflow fetch
        pend = None

        def resolve(state):
            chunk, nvc = state[0], state[1]
            hit, host_mask = self._member_packed_finish(state)
            km, mult = self._fetch_masked_kmers(chunk, host_mask)
            if len(km):
                present = {kq for kq, _m, nodes_hit in
                           self._ultra_rows(km, mult) if len(nodes_hit)}
                hit = _fixup_membership(
                    hit, host_mask, chunk,
                    jnp.asarray(_present_padded(present)))
            out.append(np.asarray(hit)[:nvc])

        for chunk, nvc in self._iter_device_chunks(read_kmers):
            state = self._member_packed_dispatch(chunk, nvc)
            if pend is not None:
                resolve(pend)
            pend = state
        if pend is not None:
            resolve(pend)
        if not out:
            return np.zeros(0, dtype=bool)
        return np.concatenate(out)

    def _map_kmers_packed_device(self, qj, n, n_nodes):
        """Packed node counts for ONE padded device batch (``qj`` may be
        sharded over a data mesh, packed tables replicated alongside)."""
        counts, host_mask = self._counts_packed_full(qj, n, n_nodes)
        res = np.asarray(counts).astype(np.int64)
        km, mult = self._fetch_masked_kmers(qj, host_mask)
        if len(km):
            for _kq, m, nodes in self._ultra_rows(km, mult):
                np.add.at(res, nodes.astype(np.int64), m)
        return res

    def map_kmers(self, kmers: np.ndarray, n_nodes: int) -> np.ndarray:
        """Node hit counts for a read-kmer batch (kmer_mapper contract).
        Fast path: one packed-record gather per query + compacted
        deep-bucket scan; ultra-deep buckets (> SCAN_CAP rows) resolve
        per unique kmer; CSR scan when the records exceed the HBM budget
        or on overflow-capacity miss. Very large batches are chunked."""
        if len(kmers) > self.QUERY_CHUNK:
            total = np.zeros(n_nodes, dtype=np.int64)
            for i in range(0, len(kmers), self.QUERY_CHUNK):
                total += self.map_kmers(kmers[i:i + self.QUERY_CHUNK],
                                        n_nodes).astype(np.int64)
            return total
        kmers = np.asarray(kmers, dtype=np.uint64)
        q, n = _pad_queries(kmers)
        packed = self._packed()
        if packed is not None:
            return self._map_kmers_packed_device(jnp.asarray(q), n,
                                                 n_nodes)
        counts = _node_counts(jnp.asarray(q), n, self.table_kmers,
                              self.table_nodes, self.starts_tbl,
                              self.sizes_tbl, self.modulo, int(n_nodes),
                              self.max_scan)
        return np.asarray(counts)

    def get_batched(self, kmers: np.ndarray, max_hits=10,
                    hit_cap=DEFAULT_HIT_CAP,
                    frequency_cap=DEFAULT_FREQUENCY_CAP):
        """(5, n_hits) uint64 matrix [node, ref_offset, query_index,
        frequency, 1000*allele_frequency], the CythonKmerIndex.get contract
        (cython_kmer_index.pyx:101-106): queries with more than ``hit_cap``
        rows in their bucket are skipped, as are rows with frequency >
        ``frequency_cap``. Unlike the Cython original, bucket-0 queries
        are NOT skipped (python-get semantics; PARITY.md). Hit compaction runs on device (prefix-sum
        scatter into a fixed-size matrix; retried bigger on overflow) so
        only the compact result transfers to host."""
        q, n = _pad_queries(kmers)
        qj = jnp.asarray(q)
        if self._bucket_tables_cheap():
            start, size = _ranges_from_tables(qj, self.starts_tbl,
                                              self.sizes_tbl, self.modulo)
        else:
            tb = self.sorted_buckets
            start, size = _ref_bucket_ranges(
                (qj % self.modulo).astype(tb.dtype), tb)
        max_total = max(1024, 4 * len(q))
        while True:
            out, n_hits = _get_batched_kernel(
                qj, n, self.table_kmers, self.table_nodes,
                self.table_ref_offsets, self.table_frequencies,
                self.table_allele_frequencies, start, size, self.max_scan,
                jnp.int32(hit_cap), jnp.int32(frequency_cap), max_total)
            n_hits = int(n_hits)
            if n_hits <= max_total:
                return np.asarray(out)[:, :n_hits]
            max_total = 2 * n_hits
