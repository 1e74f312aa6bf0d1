"""Device-resident span finalize: expand the finder's compact span
representation into FlatKmers row arrays entirely on device.

The DenseKmerFinder control plane emits ~O(spans) descriptors plus a
~1 byte/base tape (finder.py); the expanded rows are ~24 bytes/row and
~1.3 rows/base.  Hashing the tape and expanding rows ON DEVICE means
the host->device upload is the tape + span-level arrays — ~30x less
transfer than uploading expanded rows for the index build that follows
(the dominant cost of the end-to-end `index` pipeline on this
environment's slow host link, and a PCIe round-trip saved anywhere).

The result feeds ops.build.build_modulo_layout_device without ever
leaving HBM.  Semantics mirror finder._finalize's vectorized host path
(itself the batched equivalent of reference kmer_finder.py:128-168 row
emission); bit-equality is pinned by tests/test_device_pipeline.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .encode import sliding_hashes


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _expand(k, total_windows, total_rows, tape, ts, nw, cum_nw, s_node,
            s_off, nl, ns, span_nodes, s_af, start_ids):
    """One fused device program: sliding-window hash of the tape, then
    window- and row-index expansion via jnp.repeat with static totals.
    All index arrays are built on device from the span-level inputs —
    nothing O(windows) or O(rows) crosses the host link."""
    n_spans = nw.shape[0]
    hashes = sliding_hashes(jnp.maximum(tape, 0).astype(jnp.int32), k)
    span_ids = jnp.arange(n_spans, dtype=jnp.int32)
    win_span = jnp.repeat(span_ids, nw, total_repeat_length=total_windows)
    win_local = jnp.arange(total_windows, dtype=jnp.int32) - cum_nw[win_span]
    win_kmer = hashes[ts[win_span] + win_local]
    rpw = nl[win_span]                     # rows per window
    cum_rpw = jnp.cumsum(rpw) - rpw
    row_win = jnp.repeat(jnp.arange(total_windows, dtype=jnp.int32), rpw,
                         total_repeat_length=total_rows)
    row_local = jnp.arange(total_rows, dtype=jnp.int32) - cum_rpw[row_win]
    row_span = win_span[row_win]
    kmers = win_kmer[row_win]
    nodes = span_nodes[ns[row_span] + row_local]
    start_nodes = s_node[row_span]
    start_offsets = s_off[row_span] + win_local[row_win]
    # FlatKmers v="1" ref offsets: PositionId.get(start_nodes,
    # start_offsets) (graph.py:351-354) as a device gather
    ref_offsets = (start_ids[start_nodes].astype(jnp.uint64)
                   + start_offsets.astype(jnp.uint64))
    af = s_af[row_span]
    return kmers, nodes, ref_offsets, af


def expand_spans_device(tape, ts, nw, s_node, s_off, nl, ns, span_nodes,
                        s_af, position_start_ids, k):
    """Expand merged span arrays to device-resident FlatKmers columns.

    Inputs are host numpy (span-level, small; plus the int8 tape);
    returns (hashes u64, nodes i32, ref_offsets u64, allele_freqs f32)
    as JAX device arrays in finder emission order.
    """
    nw = np.asarray(nw, dtype=np.int64)
    nl = np.asarray(nl, dtype=np.int64)
    total_windows = int(nw.sum())
    total_rows = int((nw * nl).sum())
    if total_rows == 0 or total_windows == 0:
        z = jnp.zeros(0, jnp.uint64)
        return (z, jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.uint64),
                jnp.zeros(0, jnp.float32))
    assert len(tape) < 2**31 and total_rows < 2**31, \
        "int32 device index space exceeded; chunk the build"
    cum_nw = np.concatenate([[0], np.cumsum(nw)[:-1]])
    return _expand(
        int(k), total_windows, total_rows,
        jnp.asarray(np.asarray(tape, dtype=np.int8)),
        jnp.asarray(np.asarray(ts, dtype=np.int32)),
        jnp.asarray(nw.astype(np.int32)),
        jnp.asarray(cum_nw.astype(np.int32)),
        jnp.asarray(np.asarray(s_node, dtype=np.int32)),
        jnp.asarray(np.asarray(s_off, dtype=np.int32)),
        jnp.asarray(nl.astype(np.int32)),
        jnp.asarray(np.asarray(ns, dtype=np.int32)),
        jnp.asarray(np.asarray(span_nodes, dtype=np.int32)),
        jnp.asarray(np.asarray(s_af, dtype=np.float32)),
        jnp.asarray(np.asarray(position_start_ids, dtype=np.int64)))
