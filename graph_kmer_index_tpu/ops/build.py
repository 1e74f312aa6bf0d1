"""Device-side index construction: sort + segment ops on TPU.

The collision-free index build is a sort by bucket followed by segment
boundary extraction and scatters (reference
collision_free_kmer_index.py:433-457 does this with np.argsort/ediff1d on
host). On device it is jax.lax.sort_key_val + vectorized diff/scatter —
O(n log n) on-chip, no host round-trip for the row arrays, and the
frequency computation (distinct ref-offsets per kmer, the reference's
slow python loop at :267-293) becomes two more sorted-segment passes.

All outputs are bit-identical to the host build except row order WITHIN a
bucket for equal keys: lax.sort is stable, matching numpy's stable
argsort, so order is identical too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def _sort_rows(kmers, row_ids, modulo):
    """Stable sort of (bucket, original_row) pairs; returns permutation.
    Bucket keys use int32 when the modulo fits (int64 is emulated on
    this TPU and sorts ~2x slower)."""
    buckets = kmers % jnp.uint64(modulo)
    buckets = (buckets.astype(jnp.int32) if modulo < 2**31
               else buckets.astype(jnp.int64))
    _, perm = jax.lax.sort_key_val(buckets, row_ids, is_stable=True)
    return perm


@functools.partial(jax.jit, static_argnums=(1,))
def _sort_and_gather(kmers, modulo, *row_arrays):
    """Sort + sorted-bucket column + row reorders, ONE compile unit.

    These were previously one jit (the sort) plus six eager dispatches
    (bucket recompute, dtype cast, four permutation gathers); on this
    sandbox every eager kernel is its own remote compile, which
    dominated the measured build wall time at production scale. Fused,
    the whole n-sized stage is one program — the modulo-sized bucket
    tables stay a separate stage (see _bucket_tables) so their
    temporaries never coexist with the sort's."""
    n = kmers.shape[0]
    buckets = kmers % jnp.uint64(modulo)
    buckets = (buckets.astype(jnp.int32) if modulo < 2**31
               else buckets.astype(jnp.int64))
    sorted_buckets, perm = jax.lax.sort_key_val(
        buckets, jnp.arange(n, dtype=jnp.int32), is_stable=True)
    return (perm, sorted_buckets) + tuple(a[perm] for a in row_arrays)


@functools.partial(jax.jit, static_argnums=(1,))
def _bucket_tables(sorted_buckets, modulo):
    """starts[modulo], sizes[modulo] from the sorted bucket column.

    Both tables are int32: row counts are < 2^31 everywhere (the
    reference caps kmer counts below 2^32, reference_kmer_index.py:89),
    and int64 is X64-emulated on this TPU — an int64 starts table made
    this scatter pair ~20x slower AND doubles the dominant HBM cost of
    the modulo-sized tables."""
    n = sorted_buckets.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones(1, bool), sorted_buckets[1:] != sorted_buckets[:-1]])
    # scatter each bucket's first row index; non-first rows aim at an
    # out-of-range slot and are dropped
    starts = jnp.zeros(modulo, jnp.int32).at[
        jnp.where(is_first, sorted_buckets, modulo)].set(idx, mode="drop")
    sizes = jnp.zeros(modulo, jnp.int32).at[sorted_buckets].add(
        1, mode="drop")
    return starts, sizes


def build_modulo_layout_device(hashes: np.ndarray, modulo: int, row_arrays):
    """Device equivalent of models.kmer_index._build_modulo_layout.

    Returns (lookup_starts int32[modulo], sizes int32[modulo],
    [row arrays sorted by bucket], permutation). The modulo-sized bucket
    tables are returned as DEVICE (jax) arrays — at production modulo
    (452930477 buckets, ~3.6 GB as int32 pairs) materializing them
    host-side costs more than the whole build; they live in HBM where
    the lookup kernels read them anyway. Row arrays stay host-side
    (numpy).
    """
    n = len(hashes)
    if n == 0:
        return (np.zeros(modulo, np.int32), np.zeros(modulo, np.uint32),
                [np.asarray(a) for a in row_arrays], np.zeros(0, np.int64))
    if isinstance(hashes, jnp.ndarray):
        kmers_j = hashes.astype(jnp.uint64)  # device input: zero-copy
    else:
        kmers_j = jnp.asarray(np.asarray(hashes, dtype=np.uint64))
    # one fused program: sort + bucket column + row reorders (the rows
    # are headed for HBM anyway — a host round-trip of the permutation
    # costs more than the whole build at scale)
    perm, sorted_buckets, *rows = _sort_and_gather(
        kmers_j, int(modulo), *[jnp.asarray(a) for a in row_arrays])
    jax.block_until_ready(perm)  # stage boundary: free sort temporaries
    starts, sizes = _bucket_tables(sorted_buckets, int(modulo))
    return starts, sizes, rows, perm


@functools.partial(jax.jit, static_argnums=(2,))
def _frequencies_full_device(kmers, ref_offsets, wide_offsets=False):
    """Fully on-device per-row frequencies: lexicographic sort by
    (kmer, ref_offset), segment distinct-pair count, scatter back.
    frequency[row] = #distinct ref offsets among rows with the same kmer
    (vectorized equivalent of reference collision_free_kmer_index.py
    :267-293).

    Sort keys are native u32 lanes (kmer hi, kmer lo, ref offset)
    instead of u64+i64: int64 keys are X64Combine-emulated on this TPU
    and sort ~25% slower. ``wide_offsets`` adds a fourth lane for the
    ref offset's high 32 bits — required when any offset reaches 2^32
    (a >4.29 Gb PositionId space), where the narrow key would alias
    distinct offsets congruent mod 2^32 and undercount."""
    n = kmers.shape[0]
    k_hi = (kmers >> jnp.uint64(32)).astype(jnp.uint32)
    k_lo = (kmers & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ro64 = ref_offsets.astype(jnp.uint64)
    ro = ro64.astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    if wide_offsets:
        ro_hi = (ro64 >> jnp.uint64(32)).astype(jnp.uint32)
        hi_s, lo_s, roh_s, ro_s, sidx = jax.lax.sort(
            (k_hi, k_lo, ro_hi, ro, idx), num_keys=4, is_stable=True)
        ro_changed = (ro_s[1:] != ro_s[:-1]) | (roh_s[1:] != roh_s[:-1])
    else:
        hi_s, lo_s, ro_s, sidx = jax.lax.sort(
            (k_hi, k_lo, ro, idx), num_keys=3, is_stable=True)
        ro_changed = ro_s[1:] != ro_s[:-1]
    new_kmer = jnp.concatenate(
        [jnp.ones(1, bool),
         (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
    new_pair = new_kmer | jnp.concatenate([jnp.ones(1, bool), ro_changed])
    seg_id = jnp.cumsum(new_kmer.astype(jnp.int32)) - 1
    counts = jnp.zeros(n, jnp.int32).at[seg_id].add(
        new_pair.astype(jnp.int32))
    freqs_sorted = counts[seg_id]
    return jnp.zeros(n, jnp.int32).at[sidx].set(freqs_sorted)


def frequencies_device(kmers_sorted, ref_offsets_sorted) -> np.ndarray:
    """Device path for per-row kmer frequencies (distinct ref offsets).
    Input rows in bucket order (any order within kmer); output aligned to
    input order. Accepts host or device arrays; runs entirely on device."""
    n = len(kmers_sorted)
    if n == 0:
        return np.zeros(0, dtype=np.uint16)
    ro = jnp.asarray(ref_offsets_sorted).astype(jnp.int64)
    # one scalar reduce picks the key width; offsets >= 2^32 need the
    # 4-lane sort key (see _frequencies_full_device)
    wide = bool(int(jnp.max(ro)) >= 1 << 32) if n else False
    return _frequencies_full_device(
        jnp.asarray(kmers_sorted).astype(jnp.uint64), ro,
        wide).astype(jnp.uint16)
