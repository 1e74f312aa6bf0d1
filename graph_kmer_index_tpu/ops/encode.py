"""Device k-mer hashing kernels.

The hash convention (first base = least-significant 2-bit digit, see
hashing.py and reference kmer_hashing.py:8-9) makes a k-mer hash the
little-endian 2-bit packing of its bases:

    hash(i) = sum_j seq[i+j] << (2*j)

so sliding-window hashing — the reference's ``np.convolve(seq,
power_array(k))`` hot path (read_kmers.py:68-70, kmer_finder.py:350-352) —
is pure bit-packing. On TPU we compute it with a log-doubling shift/or
ladder (O(log k) vector ops per element) in XLA, or with an explicit
Pallas kernel operating on 2 x uint32 lanes.

All functions are shape-polymorphic only in the leading dimension and use
static k, so they jit cleanly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U64 = jnp.uint64
U32 = jnp.uint32


def encode_ascii(raw: jax.Array) -> jax.Array:
    """ASCII bytes -> 2-bit codes (a/A=0, c/C=1, g/G=2, t/T=3, other=0).

    Same mapping as hashing.letter_sequence_to_numeric (reference
    flat_kmers.py:134-145) but arithmetic (3 compares) instead of a
    gather, which vectorizes on the VPU.
    """
    x = (raw.astype(jnp.int32) | 32)  # lowercase
    return (
        (x == ord("c")) * 1 + (x == ord("g")) * 2 + (x == ord("t")) * 3
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def sliding_hashes(seq: jax.Array, k: int) -> jax.Array:
    """uint64 hashes of ALL windows (including the k-1 ragged tail ones).

    ``out[i] = hash(seq[i:i+k])`` for i in [0, len(seq)); windows running
    past the end are computed as if the sequence were zero-padded. Callers
    slice ``out[:n-k+1]`` for valid windows. Returning full length keeps the
    shape independent of k, which matters for jit cache reuse.

    Log-doubling: P_l[i] packs 2^l bases starting at i; combining by the
    binary decomposition of k gives each window in O(log k) shift/or ops.
    """
    assert 1 <= k <= 31
    n = seq.shape[0]
    x = seq.astype(U64)
    # pad so every slice below is in bounds
    pad = 1 << max(0, (k - 1).bit_length())
    x = jnp.concatenate([x, jnp.zeros(pad, U64)])

    levels = [x]  # levels[l][i] packs 2^l bases at i
    span = 1
    while span < k:
        p = levels[-1]
        levels.append(p | (jnp.roll(p, -span) << U64(2 * span)))
        span *= 2

    acc = jnp.zeros_like(x)
    offset = 0
    remaining = k
    lvl = len(levels) - 1
    while remaining > 0:
        size = 1 << lvl
        if remaining >= size:
            acc = acc | (jnp.roll(levels[lvl], -offset) << U64(2 * offset))
            offset += size
            remaining -= size
        lvl -= 1
    return acc[:n]


def _pack_u32(x: jax.Array, m: int) -> jax.Array:
    """P_m[i] = sum_{t<m} x[i+t] << 2t as uint32 (m <= 16), log-doubling."""
    assert 1 <= m <= 16
    levels = [x]
    span = 1
    while span < m:
        p = levels[-1]
        levels.append(p | (jnp.roll(p, -span) << U32(2 * span)))
        span *= 2
    acc = jnp.zeros_like(x)
    offset, remaining, lvl = 0, m, len(levels) - 1
    while remaining > 0:
        size = 1 << lvl
        if remaining >= size:
            acc = acc | (jnp.roll(levels[lvl], -offset) << U32(2 * offset))
            offset += size
            remaining -= size
        lvl -= 1
    return acc


@functools.partial(jax.jit, static_argnums=(1,))
def sliding_hashes_u32(seq: jax.Array, k: int):
    """(lo, hi) uint32 lanes of every window hash: hash = lo | hi << 32.

    TPU-native formulation — 64-bit integers are emulated on TPU, so the
    u64 ladder of :func:`sliding_hashes` costs ~2x per op plus ~20
    intermediate arrays of HBM traffic. Here the 62-bit hash is built from
    ONE shared u32 packing: lo[i] = P16[i] (bases i..i+15) and
    hi[i] = P16[i+16] masked to k-16 bases — 4 log-doubling rounds of
    native u32 ops total. Tail windows read zero padding.
    """
    assert 1 <= k <= 31
    n = seq.shape[0]
    x = seq.astype(U32)
    pad = 32
    x = jnp.concatenate([x, jnp.zeros(pad, U32)])
    if k <= 16:
        lo = _pack_u32(x, k)
        return lo[:n], jnp.zeros(n, U32)
    p16 = _pack_u32(x, 16)
    lo = p16
    hi = jnp.roll(p16, -16) & U32((1 << (2 * (k - 16))) - 1)
    return lo[:n], hi[:n]


# ---------------------------------------------------------------------------
# Pallas kernel: sliding hashes over a halo-chunked layout.
# ---------------------------------------------------------------------------

def _hash_kernel(seq_ref, lo_ref, hi_ref, *, k: int, chunk: int, halo: int):
    """seq_ref: (ROWS, chunk + halo) int32; lo/hi: (ROWS, chunk) uint32.

    Log-doubling shift/or ladder with ``pltpu.roll`` lane rotations (no
    unaligned lane slices — Mosaic-friendly): P_{2s}[c] = P_s[c] |
    P_s[c+s] << 2s. Circular wrap only corrupts the top ``halo`` columns,
    which are never emitted (the final [:, :chunk] slice is lane-aligned).
    lo packs bases [c, c+16); hi packs bases [c+16, c+k).
    """
    from jax.experimental.pallas import tpu as pltpu

    width = chunk + halo
    p = seq_ref[:].astype(U32)
    m = min(k, 16)
    # ladder up to P_m via binary decomposition
    levels = {1: p}
    span = 1
    while span * 2 <= m:
        prev = levels[span]
        levels[span * 2] = prev | (
            pltpu.roll(prev, shift=jnp.int32((-span) % width), axis=1) << U32(2 * span))
        span *= 2
    # combine decomposition of m
    acc = None
    offset = 0
    for bit in sorted(levels.keys(), reverse=True):
        if offset + bit <= m:
            part = levels[bit]
            shifted = (part if offset == 0 else
                       pltpu.roll(part, shift=jnp.int32((-offset) % width), axis=1)
                       << U32(2 * offset))
            acc = shifted if acc is None else (acc | shifted)
            offset += bit
    p16 = acc  # packs min(k,16) bases at each column
    lo_ref[:] = p16[:, :chunk]
    if k > 16:
        hi = (pltpu.roll(p16, shift=jnp.int32((-16) % width), axis=1)
              & U32((1 << (2 * (k - 16))) - 1))
        hi_ref[:] = hi[:, :chunk]
    else:
        hi_ref[:] = jnp.zeros((p16.shape[0], chunk), U32)


def sliding_hashes_pallas(seq: jax.Array, k: int, *, chunk: int = 2048,
                          rows_per_block: int = 8, interpret: bool = False):
    """Pallas TPU version of :func:`sliding_hashes`.

    Returns (lo, hi) uint32 arrays of length len(seq): the 62-bit hash is
    ``lo + hi * 2**32``. Tail windows (crossing the end) are computed over
    zero padding, like :func:`sliding_hashes`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert 1 <= k <= 31
    n = seq.shape[0]
    halo = 128  # >= k and lane-aligned, keeps block width a lane multiple
    n_chunks = max(1, -(-n // chunk))
    padded = (n_chunks + 1) * chunk
    x = jnp.zeros(padded, jnp.int32).at[:n].set(seq.astype(jnp.int32))
    # overlapping rows, built with reshapes (no gather): row i covers
    # [i*chunk, i*chunk + chunk + halo)
    base = x[: n_chunks * chunk].reshape(n_chunks, chunk)
    nxt = x[chunk: (n_chunks + 1) * chunk].reshape(n_chunks, chunk)[:, :halo]
    rows = jnp.concatenate([base, nxt], axis=1)  # (n_chunks, chunk+halo)

    grid = (-(-n_chunks // rows_per_block),)
    rows = jnp.pad(rows, ((0, grid[0] * rows_per_block - n_chunks), (0, 0)))

    # NB: index maps must return same-typed indices and must not capture
    # constants; with x64 enabled a bare literal 0 traces as i64 while
    # program ids are i32, which fails Mosaic lowering
    # ("func.return (i32, i64)") — hence the computed i32 zero ``i - i``.
    lo, hi = pl.pallas_call(
        functools.partial(_hash_kernel, k=k, chunk=chunk, halo=halo),
        grid=grid,
        in_specs=[pl.BlockSpec((rows_per_block, chunk + halo),
                               lambda i: (i, i - i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rows_per_block, chunk), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, chunk), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0] * rows_per_block, chunk), U32),
            jax.ShapeDtypeStruct((grid[0] * rows_per_block, chunk), U32),
        ),
        interpret=interpret,
    )(rows)
    return lo.reshape(-1)[:n], hi.reshape(-1)[:n]


def combine_u32_pair(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(lo, hi) uint32 lanes -> uint64 hash (requires x64)."""
    return lo.astype(U64) | (hi.astype(U64) << U64(32))


# ---------------------------------------------------------------------------
# Roofline variant: emit only P16 (the 16-base packing) per position.
#
# hash(i) = P16[i] | (P16[i+16] & mask) << 32 for k > 16, so the full
# 62-bit hash stream is derivable from ONE u32 per position with a slice
# + mask that XLA fuses into the consumer. With int8 input this drops
# kernel traffic from 12 to 5 bytes/base (in 1B + out 4B), moving the
# HBM-bandwidth speed-of-light from ~68G to ~160G kmers/s/chip.
# ---------------------------------------------------------------------------

def _pack_kernel(seq_ref, out_ref, *, m: int, chunk: int, halo: int):
    """seq_ref: (ROWS, chunk + halo) int8; out_ref: (ROWS, chunk) packing
    ``m`` bases per column. Compute stays in u32 lanes (the VPU's native
    width); the store narrows to out_ref's dtype (u32 for P16, u16 for
    P8)."""
    from jax.experimental.pallas import tpu as pltpu

    width = chunk + halo
    p = seq_ref[:].astype(U32)
    levels = {1: p}
    span = 1
    while span * 2 <= m:
        prev = levels[span]
        levels[span * 2] = prev | (
            pltpu.roll(prev, shift=jnp.int32((-span) % width), axis=1)
            << U32(2 * span))
        span *= 2
    acc = None
    offset = 0
    for bit in sorted(levels.keys(), reverse=True):
        if offset + bit <= m:
            part = levels[bit]
            shifted = (part if offset == 0 else
                       pltpu.roll(part, shift=jnp.int32((-offset) % width),
                                  axis=1) << U32(2 * offset))
            acc = shifted if acc is None else (acc | shifted)
            offset += bit
    out_ref[:] = acc[:, :chunk].astype(out_ref.dtype)


def _sliding_pack_pallas(seq: jax.Array, k: int, m_cap: int, out_dtype,
                         *, chunk: int = 2048, rows_per_block: int = 32,
                         interpret: bool = False):
    """P_{min(k, m_cap)}[i] for every position (int8 input path): the
    shared halo-chunked wrapper behind the P16 (u32) and P8 (u16)
    roofline kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert 1 <= k <= 31
    m = min(k, m_cap)
    n = seq.shape[0]
    halo = 128
    n_chunks = max(1, -(-n // chunk))
    padded = (n_chunks + 1) * chunk
    x = jnp.zeros(padded, jnp.int8).at[:n].set(seq.astype(jnp.int8))
    base = x[: n_chunks * chunk].reshape(n_chunks, chunk)
    nxt = x[chunk: (n_chunks + 1) * chunk].reshape(n_chunks, chunk)[:, :halo]
    rows = jnp.concatenate([base, nxt], axis=1)

    grid = (-(-n_chunks // rows_per_block),)
    rows = jnp.pad(rows, ((0, grid[0] * rows_per_block - n_chunks), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pack_kernel, m=m, chunk=chunk, halo=halo),
        grid=grid,
        in_specs=[pl.BlockSpec((rows_per_block, chunk + halo),
                               lambda i: (i, i - i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_block, chunk), lambda i: (i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * rows_per_block, chunk),
                                       out_dtype),
        interpret=interpret,
    )(rows)
    return out.reshape(-1)[:n]


def sliding_p16_pallas(seq: jax.Array, k: int, **kw):
    """P_{min(k,16)}[i] for every position, as uint32 (int8 input path)."""
    return _sliding_pack_pallas(seq, k, 16, U32, **kw)


def p16_to_lanes(p16: jax.Array, k: int):
    """Derive the (lo, hi) u32 hash lanes from the P16 stream (fused into
    the consumer by XLA; the kernel itself only materializes P16)."""
    n = p16.shape[0]
    if k <= 16:
        return p16, jnp.zeros(n, U32)
    ext = jnp.concatenate([p16, jnp.zeros(16, U32)])
    hi = ext[16:16 + n] & U32((1 << (2 * (k - 16))) - 1)
    return p16, hi


def sliding_hashes_pallas_p16(seq: jax.Array, k: int, **kw):
    """(lo, hi) lanes via the P16 kernel + fused derivation — same
    contract as :func:`sliding_hashes_pallas`."""
    return p16_to_lanes(sliding_p16_pallas(seq, k, **kw), k)


# ---------------------------------------------------------------------------
# P8 roofline variant: emit only the 8-base packing per position, as
# uint16 — 3 bytes/base of kernel traffic (in 1B + out 2B) vs P16's 5.
# hash(i) = P8[i] | P8[i+8]<<16 | P8[i+16]<<32 | P8[i+24]<<48 (masked to
# 2k bits), so the full hash stream derives from FOUR u16 loads per
# position — all sequential slices XLA fuses into the consumer. If the
# measured-130-GB/s bandwidth ceiling is real, this moves the hashing
# speed-of-light another ~1.67x past P16.
# ---------------------------------------------------------------------------

def sliding_p8_pallas(seq: jax.Array, k: int, **kw):
    """P_{min(k,8)}[i] for every position, as uint16 (int8 input path)."""
    return _sliding_pack_pallas(seq, k, 8, jnp.uint16, **kw)


def p8_to_lanes(p8: jax.Array, k: int):
    """Derive the (lo, hi) u32 hash lanes from the P8 stream (sequential
    slices + shifts, fused into the consumer by XLA). Bit-identical to
    p16_to_lanes(sliding_p16_pallas(...))."""
    n = p8.shape[0]
    if k <= 8:
        return p8.astype(U32), jnp.zeros(n, U32)
    ext = jnp.concatenate([p8, jnp.zeros(24, jnp.uint16)]).astype(U32)
    lo = ext[:n] | (ext[8:8 + n] << U32(16))
    if k < 16:
        # P16 packs only m = k bases when k < 16: mask the extras so the
        # lo lane matches the P16 kernel's exactly
        lo = lo & U32((1 << (2 * k)) - 1)
        return lo, jnp.zeros(n, U32)
    hi = ext[16:16 + n] | (ext[24:24 + n] << U32(16))
    hi = hi & U32((1 << (2 * (k - 16))) - 1) if k > 16 else jnp.zeros(n, U32)
    return lo, hi


def sliding_hashes_pallas_p8(seq: jax.Array, k: int, **kw):
    """(lo, hi) lanes via the P8 kernel + fused derivation — same
    contract as :func:`sliding_hashes_pallas`."""
    return p8_to_lanes(sliding_p8_pallas(seq, k, **kw), k)


def revcomp_hashes(hashes: jax.Array, k: int) -> jax.Array:
    """Reverse complement in hash space, on device — the packed
    XOR + 2-bit-group bit-reversal formulation of
    hashing.kmer_hashes_to_reverse_complement_hash (itself the batched
    equivalent of reference kmer_hashing.py:24-28)."""
    assert k <= 31
    x = hashes.astype(U64) ^ U64((1 << (2 * k)) - 1)
    m2 = U64(0x3333333333333333)
    m4 = U64(0x0F0F0F0F0F0F0F0F)
    m8 = U64(0x00FF00FF00FF00FF)
    m16 = U64(0x0000FFFF0000FFFF)
    x = ((x >> U64(2)) & m2) | ((x & m2) << U64(2))
    x = ((x >> U64(4)) & m4) | ((x & m4) << U64(4))
    x = ((x >> U64(8)) & m8) | ((x & m8) << U64(8))
    x = ((x >> U64(16)) & m16) | ((x & m16) << U64(16))
    x = (x >> U64(32)) | (x << U64(32))
    return x >> U64(64 - 2 * k)


@functools.partial(jax.jit, static_argnums=(4,))
def read_tape_hashes(flat, starts, lens, n_real, k):
    """Window hashes of a concatenated read tape, valid windows
    compacted to the front ON DEVICE.

    ``flat`` is the (ladder-padded) int8 2-bit tape of all reads
    back-to-back; ``starts``/``lens`` the (ladder-padded, pad rows
    start=N len=0) per-read extents.  A window is valid iff it lies
    fully inside one read (reference read_kmers.py:68-70 semantics).
    The valid mask is built with two n_reads-sized scatters + a cumsum
    (no per-window searchsorted), and valid windows float to the front
    in read order via one stable sort — nothing O(n) touches the host.

    ``n_real`` is the unpadded tape length (device scalar ok): windows
    at or past it are padding and forced invalid.

    Returns (hashes_sorted, n_valid): uint64 window hashes with the
    valid ones first, and their count (device scalar).
    """
    n = flat.shape[0]
    # u32-lane ladder + one combine: the u64 ladder is emulated on this
    # TPU (~2x per op, ~20 u64 intermediates of HBM traffic)
    hashes = combine_u32_pair(*sliding_hashes_u32(flat.astype(jnp.int32),
                                                  k))
    ends = (starts + lens).astype(jnp.int32)
    inv_start = jnp.maximum(starts.astype(jnp.int32),
                            ends - jnp.int32(k - 1))
    d = jnp.zeros(n + 1, jnp.int32)
    d = d.at[inv_start].add(1, mode="drop")
    d = d.at[ends].add(-1, mode="drop")
    # everything past the real tape end is padding -> invalid
    d = d.at[jnp.int32(n_real)].add(1, mode="drop")
    invalid = jnp.cumsum(d[:n]) > 0
    n_valid = jnp.sum(~invalid, dtype=jnp.int32)
    _, hashes_sorted = jax.lax.sort_key_val(
        invalid.astype(jnp.int32), hashes, is_stable=True)
    return hashes_sorted, n_valid
