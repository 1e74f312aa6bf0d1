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


@functools.partial(jax.jit, static_argnums=(7,))
def _bucket_hits(kmers, n_valid, table_kmers, starts_tbl, sizes_tbl, modulo,
                 n_rows, max_scan):
    """Per-query bucket scan.

    Returns (row_idx, hit_mask, n_in_bucket): row indices (n_q, max_scan),
    boolean hit mask (False for padded queries), and bucket sizes."""
    bucket = (kmers % modulo).astype(jnp.int64)
    start = starts_tbl[bucket]
    n = sizes_tbl[bucket].astype(jnp.int32)
    scan = jnp.arange(max_scan, dtype=jnp.int64)
    rows = start[:, None] + scan[None, :]
    rows_c = jnp.minimum(rows, n_rows - 1)
    stored = table_kmers[rows_c]
    qvalid = jnp.arange(kmers.shape[0]) < n_valid
    mask = ((scan[None, :] < n[:, None])
            & (stored == kmers[:, None])
            & qvalid[:, None])
    return rows_c, mask, n


@functools.partial(jax.jit, static_argnums=(7, 8))
def _node_counts(kmers, n_valid, table_kmers, table_nodes, starts_tbl,
                 sizes_tbl, modulo, n_nodes, max_scan):
    rows, mask, _ = _bucket_hits(kmers, n_valid, table_kmers, starts_tbl,
                                 sizes_tbl, modulo, table_kmers.shape[0],
                                 max_scan)
    nodes = table_nodes[rows]
    counts = jnp.zeros(n_nodes, dtype=jnp.int32)
    return counts.at[nodes.reshape(-1)].add(mask.reshape(-1).astype(jnp.int32))


# -- 2-lane dense bucket layout --------------------------------------------
#
# XLA's random gather rate (~60-70M elem/s on v5e at these table sizes)
# bounds the bucket-scan lookup; the CSR scan pays 2 + 2*max_scan gathers
# per query. The dense layout stores each bucket's first two rows in
# modulo-sized lanes so the common case (bucket size <= 2 — virtually all
# buckets at sane load factors) costs 5 random ops per query. Queries in
# deeper buckets are COMPACTED (prefix-sum scatter) to a fixed-capacity
# side batch that goes through the CSR scan; the kernel returns the
# overflow count so the caller can retry with the full path in the
# (pathological) case the capacity is exceeded.

_LANE_SENTINEL = (1 << 64) - 1


@jax.jit
def build_dense_lanes(table_kmers, table_nodes, starts_tbl, sizes_tbl):
    """(k0, n0, k1, n1) modulo-sized lanes; empty slots hold a sentinel
    kmer that can never match a query (hashes are < 4^31)."""
    n_rows = table_kmers.shape[0]

    def lane(j):
        rows = jnp.minimum(starts_tbl + j, n_rows - 1)
        valid = sizes_tbl > j
        k = jnp.where(valid, table_kmers[rows], jnp.uint64(_LANE_SENTINEL))
        nd = jnp.where(valid, table_nodes[rows], 0)
        return k, nd

    k0, n0 = lane(0)
    k1, n1 = lane(1)
    return k0, n0, k1, n1


@functools.partial(jax.jit, static_argnums=(11, 12))
def _node_counts_dense(kmers, n_valid, k0, n0, k1, n1, table_kmers,
                       table_nodes, starts_tbl, sizes_tbl, modulo, n_nodes,
                       max_scan):
    """Node counts via the dense lanes + compacted overflow scan.
    Returns (counts, n_overflow_dropped): nonzero drop count means the
    caller must retry with _node_counts."""
    n_q = kmers.shape[0]
    overflow_cap = max(1024, n_q // 32)
    qvalid = jnp.arange(n_q) < n_valid
    bucket = (kmers % modulo).astype(jnp.int64)

    if max_scan <= 2:  # static: no bucket deeper than the lanes
        h0 = (k0[bucket] == kmers) & qvalid
        h1 = (k1[bucket] == kmers) & qvalid
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        counts = counts.at[n0[bucket]].add(h0.astype(jnp.int32))
        counts = counts.at[n1[bucket]].add(h1.astype(jnp.int32))
        return counts, jnp.int32(0)

    sz = sizes_tbl[bucket]
    simple = (sz <= 2) & qvalid

    h0 = (k0[bucket] == kmers) & simple
    h1 = (k1[bucket] == kmers) & simple
    counts = jnp.zeros(n_nodes, dtype=jnp.int32)
    counts = counts.at[n0[bucket]].add(h0.astype(jnp.int32))
    counts = counts.at[n1[bucket]].add(h1.astype(jnp.int32))

    # compact overflow queries (bucket deeper than 2)
    overflow = (sz > 2) & qvalid
    pos = jnp.cumsum(overflow.astype(jnp.int32)) - 1
    n_overflow = pos[-1] + 1
    out_idx = jnp.where(overflow, pos, overflow_cap)
    oq = jnp.zeros(overflow_cap + 1, dtype=kmers.dtype).at[out_idx].set(
        kmers, mode="drop")[:overflow_cap]
    o_counts = _node_counts(oq, jnp.minimum(n_overflow, overflow_cap),
                            table_kmers, table_nodes, starts_tbl, sizes_tbl,
                            modulo, n_nodes, max_scan)
    counts = counts + o_counts
    return counts, jnp.maximum(0, n_overflow - overflow_cap)


@functools.partial(jax.jit, static_argnums=(8,))
def _has_kmers_dense(kmers, n_valid, k0, k1, table_kmers, starts_tbl,
                     sizes_tbl, modulo, max_scan):
    n_q = kmers.shape[0]
    qvalid = jnp.arange(n_q) < n_valid
    bucket = (kmers % modulo).astype(jnp.int64)
    sz = sizes_tbl[bucket]
    simple = (sz <= 2) & qvalid
    hit = ((k0[bucket] == kmers) | (k1[bucket] == kmers)) & simple
    overflow = (sz > 2) & qvalid

    def with_scan(_):
        _, mask, _ = _bucket_hits(kmers, n_valid, table_kmers, starts_tbl,
                                  sizes_tbl, modulo, table_kmers.shape[0],
                                  max_scan)
        return hit | (jnp.any(mask, axis=1) & overflow)

    return jax.lax.cond(jnp.any(overflow), with_scan, lambda _: hit, 0)


@functools.partial(jax.jit, static_argnums=(6,))
def _has_kmers(kmers, n_valid, table_kmers, starts_tbl, sizes_tbl, modulo,
               max_scan):
    _, mask, _ = _bucket_hits(kmers, n_valid, table_kmers, starts_tbl,
                              sizes_tbl, modulo, table_kmers.shape[0],
                              max_scan)
    return jnp.any(mask, axis=1)


@functools.partial(jax.jit, static_argnums=(10, 13))
def _get_batched_kernel(kmers, n_valid, table_kmers, table_nodes,
                        table_ref_offsets, table_frequencies,
                        table_allele_frequencies, starts_tbl, sizes_tbl,
                        modulo, max_scan, hit_cap, freq_cap, max_total):
    """Fully on-device batched get with compaction: hits scatter into a
    fixed (5, max_total) matrix by prefix-sum position; returns the
    matrix + true hit count (caller re-runs with a bigger max_total on
    overflow). Replaces the Cython two-pass scan
    (cython_kmer_index.pyx:57-107)."""
    rows, mask, n_bucket = _bucket_hits(kmers, n_valid, table_kmers,
                                        starts_tbl, sizes_tbl, modulo,
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
    """Device-resident view of a CollisionFreeKmerIndex."""

    def __init__(self, table_kmers, table_nodes, table_ref_offsets,
                 table_frequencies, table_allele_frequencies,
                 starts_tbl, sizes_tbl, modulo, max_scan):
        self.table_kmers = table_kmers
        self.table_nodes = table_nodes
        self.table_ref_offsets = table_ref_offsets
        self.table_frequencies = table_frequencies
        self.table_allele_frequencies = table_allele_frequencies
        self.starts_tbl = starts_tbl
        self.sizes_tbl = sizes_tbl
        self.modulo = modulo
        self.max_scan = max_scan

    @classmethod
    def from_host_index(cls, index):
        """Device view; index arrays may be numpy (transferred once) or
        already-device jax arrays (zero copy — the device-build path
        leaves the modulo-sized bucket tables in HBM)."""
        sizes = jnp.asarray(index._n_kmers).astype(jnp.int32)
        max_scan = max(1, int(jnp.max(sizes))) if sizes.shape[0] else 1
        n = len(index._kmers)
        freqs = index._frequencies
        if np.ndim(freqs) == 0 or np.shape(freqs)[0] != n:
            freqs = np.zeros(n, dtype=np.uint16)
        af = index._allele_frequencies
        if af is None or np.ndim(af) == 0 or np.shape(af)[0] != n:
            af = np.zeros(n, dtype=np.float32)
        return cls(
            jnp.asarray(index._kmers).astype(jnp.uint64),
            jnp.asarray(index._nodes).astype(jnp.int32),
            jnp.asarray(index._ref_offsets).astype(jnp.int64),
            jnp.asarray(freqs).astype(jnp.int32),
            jnp.asarray(af).astype(jnp.float32),
            jnp.asarray(index._hashes_to_index).astype(jnp.int32),
            sizes,
            jnp.uint64(index._modulo),
            max_scan,
        )

    # dense lanes cost modulo * 24 bytes of HBM on top of the base
    # tables; above this budget the CSR scan path is used instead
    LANES_BYTE_BUDGET = 2 << 30

    def _lanes(self):
        if getattr(self, "_dense_lanes", None) is None:
            modulo_size = int(self.starts_tbl.shape[0])
            if modulo_size * 24 > self.LANES_BYTE_BUDGET:
                self._dense_lanes = False
            else:
                self._dense_lanes = build_dense_lanes(
                    self.table_kmers, self.table_nodes, self.starts_tbl,
                    self.sizes_tbl)
        return self._dense_lanes or None

    # queries per device dispatch; bounds the (chunk, max_scan) working set
    QUERY_CHUNK = 1 << 22

    def has_kmers(self, kmers: np.ndarray) -> np.ndarray:
        if len(kmers) > self.QUERY_CHUNK:
            return np.concatenate(
                [self.has_kmers(kmers[i:i + self.QUERY_CHUNK])
                 for i in range(0, len(kmers), self.QUERY_CHUNK)])
        q, n = _pad_queries(kmers)
        lanes = self._lanes() if self.max_scan <= 2 else None
        if lanes is not None:
            k0, n0, k1, n1 = lanes
            out = _has_kmers_dense(jnp.asarray(q), n, k0, k1,
                                   self.table_kmers, self.starts_tbl,
                                   self.sizes_tbl, self.modulo,
                                   self.max_scan)
        else:
            out = _has_kmers(jnp.asarray(q), n, self.table_kmers,
                             self.starts_tbl, self.sizes_tbl, self.modulo,
                             self.max_scan)
        return np.asarray(out)[:n]

    def map_kmers(self, kmers: np.ndarray, n_nodes: int) -> np.ndarray:
        """Node hit counts for a read-kmer batch (kmer_mapper contract).
        Fast path: 2-lane dense bucket lookup with compacted overflow
        scan; CSR scan when the lanes exceed the HBM budget or on
        overflow-capacity miss. Very large batches are chunked."""
        if len(kmers) > self.QUERY_CHUNK:
            total = np.zeros(n_nodes, dtype=np.int64)
            for i in range(0, len(kmers), self.QUERY_CHUNK):
                total += self.map_kmers(kmers[i:i + self.QUERY_CHUNK],
                                        n_nodes).astype(np.int64)
            return total
        q, n = _pad_queries(kmers)
        lanes = self._lanes()
        if lanes is not None:
            k0, n0, k1, n1 = lanes
            counts, dropped = _node_counts_dense(
                jnp.asarray(q), n, k0, n0, k1, n1, self.table_kmers,
                self.table_nodes, self.starts_tbl, self.sizes_tbl,
                self.modulo, int(n_nodes), self.max_scan)
            if int(dropped) == 0:
                return np.asarray(counts)
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
        ``frequency_cap``. Hit compaction runs on device (prefix-sum
        scatter into a fixed-size matrix; retried bigger on overflow) so
        only the compact result transfers to host."""
        q, n = _pad_queries(kmers)
        max_total = max(1024, 4 * len(q))
        while True:
            out, n_hits = _get_batched_kernel(
                jnp.asarray(q), n, self.table_kmers, self.table_nodes,
                self.table_ref_offsets, self.table_frequencies,
                self.table_allele_frequencies, self.starts_tbl,
                self.sizes_tbl, self.modulo, self.max_scan,
                jnp.int32(hit_cap), jnp.int32(frequency_cap), max_total)
            n_hits = int(n_hits)
            if n_hits <= max_total:
                return np.asarray(out)[:, :n_hits]
            max_total = 2 * n_hits
