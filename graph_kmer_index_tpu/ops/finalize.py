"""Device-resident span finalize: expand the finder's compact span
representation into FlatKmers row arrays entirely on device.

The DenseKmerFinder control plane emits ~O(spans) descriptors plus a
~1 byte/base tape (finder.py); the expanded rows are ~24 bytes/row and
~1.3 rows/base.  Hashing the tape and expanding rows ON DEVICE means
the host->device upload is the tape + span-level arrays — ~30x less
transfer than uploading expanded rows for the index build that follows
(the dominant cost of the end-to-end `index` pipeline on this
environment's slow host link, and a PCIe round-trip saved anywhere).

Transfer diet (round 3): the tape crosses the link 2-bit-packed (4
bases/byte — tape values are raw graph sequence digits 0..3, dummy
nodes contribute nothing, finder.py _emit_span), and the two exclusive-
start columns (span tape starts, span node-list starts) are derived on
device as cumsums of the lengths instead of being uploaded — span tape
slices are emitted consecutively (walker emit_span appends exactly
n_windows + k - 1 bases per span), so the starts are pure prefix sums.

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

from .encode import combine_u32_pair, sliding_hashes_u32


def _pack_tape(tape: np.ndarray) -> np.ndarray:
    """Host-side 2-bit packing, base j of byte i at bits [2j, 2j+2).

    Negative values clamp to base 0 BEFORE packing — the same
    ``np.maximum(tape, 0)`` the host finalize paths apply (finder.py
    _finalize), so a foreign graph with a negative sentinel hashes
    identically on both paths. Codes > 3 violate the 2-bit sequence
    contract everywhere (our builders never produce them; the host path
    would hash them as garbage digits) and pack to base 0 here."""
    tape = np.maximum(np.asarray(tape, dtype=np.int16), 0)
    tape = np.where(tape > 3, 0, tape).astype(np.uint8)
    pad = (-len(tape)) % 4
    if pad:
        tape = np.concatenate([tape, np.zeros(pad, np.uint8)])
    q = tape.reshape(-1, 4)
    return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
            | (q[:, 3] << 6)).astype(np.uint8)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _expand(k, total_tape, total_windows, total_rows, tape_packed, nw,
            s_node, s_off, nl, span_nodes, s_af, start_ids):
    """One fused device program: 2-bit tape unpack, sliding-window hash,
    then window- and row-index expansion via jnp.repeat with static
    totals. All index arrays are built on device from the span-level
    inputs — nothing O(windows) or O(rows) crosses the host link.

    The unpack stays strictly 1-D (repeat + iota shift): any 2-D
    intermediate with a narrow minor dim would be (8,128)-tile-padded
    on this TPU (see ops/lookup.py layout notes)."""
    n_spans = nw.shape[0]
    rep = jnp.repeat(tape_packed, 4)  # byte b at positions 4b..4b+3
    shift = (jnp.arange(rep.shape[0], dtype=jnp.uint8) & jnp.uint8(3)) \
        * jnp.uint8(2)
    tape = ((rep >> shift) & jnp.uint8(3))[:total_tape].astype(jnp.int32)
    # u32-lane ladder + one combine: the u64 ladder is emulated on this
    # TPU (~2x per op, ~20 u64 intermediates of HBM traffic)
    hashes = combine_u32_pair(*sliding_hashes_u32(tape, k))
    # exclusive prefix sums: spans own consecutive tape slices of
    # exactly nw + k - 1 bases and consecutive node-list slices of nl
    tlen = nw + jnp.int32(k - 1)
    ts = jnp.cumsum(tlen) - tlen
    ns = jnp.cumsum(nl) - nl
    cum_nw = jnp.cumsum(nw) - nw
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


def _rung(n: int, ratio: float, base: int) -> int:
    """Smallest ladder value >= n from the geometric series
    ``base * ratio^i``. Streamed chunk groups pad their array dims to
    rungs so the jit-compile key set stays bounded within (and across)
    runs — each fresh shape is a 30-120 s remote compile on this
    sandbox's TPU path."""
    if n <= base:
        return base
    import math
    steps = math.ceil(math.log(n / base) / math.log(ratio))
    r = int(math.ceil(base * ratio ** steps))
    while r < n:  # float rounding guard
        r = int(math.ceil(r * ratio))
    return r


def _pad_to(a: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros(size, dtype=a.dtype)
    out[:len(a)] = a
    return out


def expand_spans_device_padded(tape, nw, s_node, s_off, nl, span_nodes,
                               s_af, position_start_ids, k):
    """Ladder-padded :func:`expand_spans_device` for STREAMED chunk
    groups: returns (hashes, nodes, ref_offsets, af, n_real_rows) where
    the device arrays are rung-sized and only the first ``n_real_rows``
    entries are real — jnp.repeat with a padded total_repeat_length
    fills the tail by repeating its last element, and every real row
    occupies its exact slot ``cum_rows[span] + local`` (a contiguous
    prefix), so the tail is garbage-but-bounded and simply never read
    (:func:`assemble_group_columns` slices it off). Bit-equality of the
    prefix with the exact-shape path is pinned by
    tests/test_device_pipeline.py.

    Ladder ratios: the tape crosses the host->device link (~5 MB/s
    here), so its rung is tight (1.05, <=5% transfer waste); windows
    and rows are device-only compute/memory (1.25); span-level dims are
    tiny (pow2).
    """
    nw = np.asarray(nw, dtype=np.int64)
    nl64 = np.asarray(nl, dtype=np.int64)
    total_windows = int(nw.sum())
    total_rows = int((nw * nl64).sum())
    assert len(tape) < 2**31 and total_rows < 2**31, \
        "int32 device index space exceeded; chunk the build"
    tape_rung = _rung(len(tape), 1.05, 1 << 16)
    spans_rung = _rung(len(nw), 2.0, 1 << 10)
    nodes_rung = _rung(len(span_nodes), 2.0, 1 << 10)
    win_rung = _rung(max(total_windows, 1), 1.25, 1 << 16)
    row_rung = _rung(max(total_rows, 1), 1.25, 1 << 16)
    packed = _pad_to(_pack_tape(tape), (tape_rung + 3) // 4)
    out = _expand(
        int(k), tape_rung, win_rung, row_rung,
        jnp.asarray(packed),
        jnp.asarray(_pad_to(nw.astype(np.int32), spans_rung)),
        jnp.asarray(_pad_to(np.asarray(s_node, np.int32), spans_rung)),
        jnp.asarray(_pad_to(np.asarray(s_off, np.int32), spans_rung)),
        jnp.asarray(_pad_to(nl64.astype(np.int32), spans_rung)),
        jnp.asarray(_pad_to(np.asarray(span_nodes, np.int32), nodes_rung)),
        jnp.asarray(_pad_to(np.asarray(s_af, np.float32), nodes_rung)),
        jnp.asarray(np.asarray(position_start_ids, dtype=np.int64)))
    return (*out, total_rows)


@functools.partial(jax.jit, static_argnums=(0,))
def _assemble(lens, *cols):
    """ONE fused slice+concatenate over all group columns (eager per-
    group slices would each be their own remote compile here)."""
    n_groups = len(lens)
    out = []
    for c in range(4):
        parts = [cols[c * n_groups + g][:lens[g]] for g in range(n_groups)]
        out.append(jnp.concatenate(parts) if len(parts) > 1 else parts[0])
    return tuple(out)


def assemble_group_columns(groups):
    """Concatenate streamed groups' valid prefixes in group order.

    ``groups``: list of (hashes, nodes, ref_offsets, af, n_real) from
    :func:`expand_spans_device_padded`. Returns the four exact-length
    device columns, identical to a single exact-shape expansion over the
    concatenated spans.
    """
    lens = tuple(int(g[4]) for g in groups)
    flat = []
    for c in range(4):
        flat.extend(g[c] for g in groups)
    return _assemble(lens, *flat)


def expand_spans_device(tape, nw, s_node, s_off, nl, span_nodes,
                        s_af, position_start_ids, k):
    """Expand merged span arrays to device-resident FlatKmers columns.

    Inputs are host numpy (span-level, small; plus the int8 tape, which
    is 2-bit-packed before crossing the link); returns (hashes u64,
    nodes i32, ref_offsets u64, allele_freqs f32) as JAX device arrays
    in finder emission order. Span tape slices must be consecutive in
    ``tape`` (each exactly ``nw[i] + k - 1`` bases) and node lists
    consecutive in ``span_nodes`` (each ``nl[i]`` entries) — the
    emission invariant of finder._emit_span / walker emit_span.
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
    return _expand(
        int(k), int(len(tape)), total_windows, total_rows,
        jnp.asarray(_pack_tape(tape)),
        jnp.asarray(nw.astype(np.int32)),
        jnp.asarray(np.asarray(s_node, dtype=np.int32)),
        jnp.asarray(np.asarray(s_off, dtype=np.int32)),
        jnp.asarray(nl.astype(np.int32)),
        jnp.asarray(np.asarray(span_nodes, dtype=np.int32)),
        jnp.asarray(np.asarray(s_af, dtype=np.float32)),
        jnp.asarray(np.asarray(position_start_ids, dtype=np.int64)))
