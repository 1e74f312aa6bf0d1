"""TPU primitive-rate microbenchmarks driving the lookup-kernel design.

Measures the building blocks every candidate lookup design is made of:

- XLA random gather (8B and 16B contiguous records) from an HBM table
- XLA scatter-add into a counts array
- jax.lax.sort throughput (u32 and u64 keys + payload)
- Pallas scalar-loop dynamic gather / read-modify-write within VMEM
- Pallas scalar-broadcast compare rate (queries x table-tile all-pairs)

Each kernel runs in its own subprocess with a hard timeout (a pathological
Mosaic compile must not hang the session) and uses chained-differenced
timing: time a jitted data-dependent fori_loop chain at two lengths and
difference — the only trustworthy sync on this backend is a scalar fetch.

Usage: python benchmarks/bench_primitives.py [--only NAME]
"""
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

_INTERPRET = bool(os.environ.get("GKI_PALLAS_INTERPRET"))
_SMALL = bool(os.environ.get("GKI_BENCH_SMALL"))  # smoke-test sizes
KERNEL_TIMEOUT_S = 420
REPS = 8


def _chain_rate(apply, x0, n_items, consts=(), reps=REPS):
    """Items/s for one application of `apply` via chained differencing.

    `apply(x, *consts)` must return a same-shaped array with a data
    dependence on x. Large arrays must go through `consts` — closing
    over them would embed them as constants in the compile request,
    which this backend's remote-compile helper rejects (HTTP 413).
    """
    import jax

    @jax.jit
    def chain(x, r, *cs):
        return jax.lax.fori_loop(0, r, lambda i, v: apply(v, *cs), x).sum()

    int(chain(x0, 2, *consts))
    int(chain(x0, 2 + reps, *consts))
    t0 = time.perf_counter()
    int(chain(x0, 2, *consts))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(chain(x0, 2 + reps, *consts))
    t_long = time.perf_counter() - t0
    per = max(1e-9, (t_long - t_short) / reps)
    return n_items / per


def k_gather8():
    import jax.numpy as jnp
    n_t, n_q = (1 << 26, 1 << 22) if not _SMALL else (1 << 16, 1 << 12)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 62, n_t).astype(np.uint64))
    idx0 = jnp.asarray(rng.integers(0, n_t, n_q).astype(np.int32))

    def apply(idx, table):
        v = table[idx]
        return (idx + v.astype(jnp.int32)) % n_t
    return _chain_rate(apply, idx0, n_q, consts=(table,))


def k_gather16():
    import jax.numpy as jnp
    n_t, n_q = (1 << 25, 1 << 22) if not _SMALL else (1 << 16, 1 << 12)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 62, (n_t, 2)).astype(np.uint64))

    idx0 = jnp.asarray(rng.integers(0, n_t, n_q).astype(np.int32))

    def apply(idx, table):
        v = table[idx]  # (n_q, 2) contiguous 16B records
        return (idx + (v[:, 0] ^ v[:, 1]).astype(jnp.int32)) % n_t
    return _chain_rate(apply, idx0, n_q, consts=(table,))


def k_scatter_add():
    import jax.numpy as jnp
    n_c, n_q = (1 << 21, 1 << 22) if not _SMALL else (1 << 12, 1 << 12)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_c, n_q).astype(np.int32))

    def apply(idx):
        counts = jnp.zeros(n_c, jnp.int32).at[idx].add(1)
        return (idx + counts[idx % n_c]) % n_c
    return _chain_rate(apply, idx0, n_q)


def k_scatter_add_small():
    """Scatter-add into a tiny (64K) counts array — tests whether the
    destination working-set size changes the rate."""
    import jax.numpy as jnp
    n_c, n_q = (1 << 16, 1 << 22) if not _SMALL else (1 << 10, 1 << 12)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_c, n_q).astype(np.int32))

    def apply(idx):
        counts = jnp.zeros(n_c, jnp.int32).at[idx].add(1)
        return (idx + counts[idx % n_c]) % n_c
    return _chain_rate(apply, idx0, n_q)


def k_sort_u32():
    import jax
    import jax.numpy as jnp
    n = (1 << 22) if not _SMALL else (1 << 12)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
    payload = jnp.asarray(np.arange(n, dtype=np.uint32))

    def apply(k, payload):
        sk, sp = jax.lax.sort((k, payload), num_keys=1)
        return sk ^ sp
    return _chain_rate(apply, k0, n, consts=(payload,))


def k_sort_u64():
    import jax
    import jax.numpy as jnp
    n = (1 << 22) if not _SMALL else (1 << 12)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 62, n).astype(np.uint64))
    payload = jnp.asarray(np.arange(n, dtype=np.uint32))

    def apply(k, payload):
        sk, sp = jax.lax.sort((k, payload), num_keys=1)
        return sk ^ sp.astype(jnp.uint64)
    return _chain_rate(apply, k0, n, consts=(payload,))


def k_pallas_gather_loop():
    """Scalar fori_loop of dynamic-index VMEM reads: the feasible rate of
    'true gather' inside a Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_t = 1 << 12          # table rows (sublane dim)
    n_q = (1 << 22) if not _SMALL else (1 << 12)
    block_q = (1 << 13) if not _SMALL else (1 << 10)  # per grid step, SMEM-resident
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, (n_t, 128)).astype(np.int32))
    idx0 = jnp.asarray(rng.integers(0, n_t, n_q).astype(np.int32))

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, acc):
            j = idx_ref[i]
            return acc + table_ref[j, 0]
        out_ref[0] = jax.lax.fori_loop(0, block_q, body, jnp.int32(0))

    @jax.jit
    def run(idx, table):
        out = pl.pallas_call(
            kernel,
            grid=(n_q // block_q,),
            in_specs=[
                pl.BlockSpec((block_q,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_t, 128), lambda i: (i - i, i - i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1,), lambda i: (i,),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_q // block_q,), jnp.int32),
            interpret=_INTERPRET,
        )(idx, table)
        return (idx + out[(idx % (n_q // block_q))]) % n_t

    return _chain_rate(run, idx0, n_q, consts=(table,))


def k_pallas_rmw_loop():
    """Scalar fori_loop of dynamic-index VMEM read-modify-writes: feasible
    rate of 'true scatter-add' (e.g. node counts) inside a Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_c = 1 << 12
    n_q = (1 << 22) if not _SMALL else (1 << 12)
    block_q = (1 << 13) if not _SMALL else (1 << 10)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_c, n_q).astype(np.int32))

    def kernel(idx_ref, counts_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_ref[...] = jnp.zeros_like(counts_ref)

        def body(i, _):
            j = idx_ref[i]
            counts_ref[j, 0] = counts_ref[j, 0] + 1
            return 0
        jax.lax.fori_loop(0, block_q, body, jnp.int32(0))

    @jax.jit
    def run(idx):
        counts = pl.pallas_call(
            kernel,
            grid=(n_q // block_q,),
            in_specs=[pl.BlockSpec((block_q,), lambda i: (i,),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((n_c, 128), lambda i: (i - i, i - i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_c, 128), jnp.int32),
            interpret=_INTERPRET,
        )(idx)
        return (idx + counts[idx % n_c, 0]) % n_c

    return _chain_rate(run, idx0, n_q)


def k_pallas_bcast_cmp():
    """Scalar-broadcast all-pairs compare: q-tile (QS,128) vs TILE_T table
    elements read from SMEM, 2x u32 compare + hit accumulate. The feasible
    rate of the partition-compare stage of a sort-and-stream lookup."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    QS = 256 if not _SMALL else 8   # query sublanes -> QS*128 queries per tile
    TILE_T = 512 if not _SMALL else 32  # table elements compared per query tile
    n_q = (1 << 21) if not _SMALL else (8 * 128 * 2)
    n_tiles = n_q // (QS * 128)
    rng = np.random.default_rng(0)
    qlo0 = jnp.asarray(rng.integers(0, 1 << 31, (n_q // 128, 128)).astype(np.int32))
    qhi = jnp.asarray(rng.integers(0, 1 << 30, (n_q // 128, 128)).astype(np.int32))
    tlo = jnp.asarray(rng.integers(0, 1 << 31, TILE_T).astype(np.int32))
    thi = jnp.asarray(rng.integers(0, 1 << 30, TILE_T).astype(np.int32))
    tnode = jnp.asarray(rng.integers(0, 1 << 20, TILE_T).astype(np.int32))

    def kernel(tlo_ref, thi_ref, tnode_ref, qlo_ref, qhi_ref,
               node_ref, cnt_ref):
        qlo = qlo_ref[:]
        qhi = qhi_ref[:]

        def body(j, carry):
            node, cnt = carry
            m = (qlo == tlo_ref[j]) & (qhi == thi_ref[j])
            node = jnp.where(m & (cnt == 0), tnode_ref[j], node)
            cnt = cnt + m.astype(jnp.int32)
            return node, cnt

        node, cnt = jax.lax.fori_loop(
            0, TILE_T, body,
            (jnp.zeros((QS, 128), jnp.int32), jnp.zeros((QS, 128), jnp.int32)))
        node_ref[:] = node
        cnt_ref[:] = cnt

    @jax.jit
    def run(qlo, qhi, tlo, thi, tnode):
        node, cnt = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_T,), lambda i: (i - i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE_T,), lambda i: (i - i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE_T,), lambda i: (i - i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((QS, 128), lambda i: (i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QS, 128), lambda i: (i, i - i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((QS, 128), lambda i: (i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QS, 128), lambda i: (i, i - i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_q // 128, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_q // 128, 128), jnp.int32),
            ),
            interpret=_INTERPRET,
        )(tlo, thi, tnode, qlo, qhi)
        return qlo ^ node ^ cnt

    return _chain_rate(run, qlo0, n_q, consts=(qhi, tlo, thi, tnode))


def k_gather32():
    import jax.numpy as jnp
    n_t, n_q = (1 << 24, 1 << 22) if not _SMALL else (1 << 14, 1 << 12)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 62, (n_t, 4)).astype(np.uint64))
    idx0 = jnp.asarray(rng.integers(0, n_t, n_q).astype(np.int32))

    def apply(idx, table):
        v = table[idx]  # (n_q, 4) contiguous 32B records
        return (idx + (v[:, 0] ^ v[:, 1] ^ v[:, 2] ^ v[:, 3]).astype(
            jnp.int32)) % n_t
    return _chain_rate(apply, idx0, n_q, consts=(table,))


def k_scatter_add_sorted():
    """Scatter-add with monotonically sorted indices + the
    indices_are_sorted hint — does XLA exploit it?"""
    import jax.numpy as jnp
    n_c, n_q = (1 << 21, 1 << 22) if not _SMALL else (1 << 12, 1 << 12)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(np.sort(rng.integers(0, n_c, n_q)).astype(np.int32))

    def apply(idx):
        counts = jnp.zeros(n_c, jnp.int32).at[idx].add(
            1, indices_are_sorted=True)
        return (idx + counts[jnp.clip(idx, 0, n_c - 1)]) % n_c
    return _chain_rate(apply, idx0, n_q)


def k_pallas_stream_copy():
    """HBM bandwidth CONTROL: a pure Pallas stream copy (read n bytes,
    write n bytes, zero compute). Returns BYTES moved per second
    (read + write). This is the achievable-ceiling measurement the
    hashing kernel's roofline claim is judged against: if this measures
    far above the P16 kernel's effective GB/s, the kernel has headroom;
    if both plateau together, the environment (not the kernel) is the
    ceiling."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = (1 << 20) if not _SMALL else (1 << 10)   # x 128 f32 = 512 MB
    block = (1 << 12) if not _SMALL else (1 << 7)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n_rows, 128)).astype(np.float32))

    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(n_rows // block,),
            in_specs=[pl.BlockSpec((block, 128), lambda i: (i, i - i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, 128), lambda i: (i, i - i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            interpret=_INTERPRET,
        )(x)

    # semantic self-check: the control is only a control if it really
    # copies (device-side compare; one scalar crosses the link)
    mism = int(jnp.sum(run(x0) != x0))
    if mism:
        raise ValueError(f"stream_copy kernel corrupted {mism} lanes")
    print(json.dumps({"verified": "stream_copy"}), file=sys.stderr,
          flush=True)
    return _chain_rate(run, x0, 2 * n_rows * 128 * 4)  # bytes/s


def k_pallas_stream_sum():
    """HBM read bandwidth CONTROL: a read-only Pallas stream sum (read n
    bytes, write one scalar per block). Returns BYTES READ per second —
    the read-only sibling of stream_copy; together they bracket the
    bytes/base-limited hashing kernel's achievable ceiling. The chain's
    data dependence enters through an SMEM scalar so XLA cannot hoist
    the constant-table read out of the timing loop."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = (1 << 20) if not _SMALL else (1 << 10)   # x 128 f32 = 512 MB
    block = (1 << 12) if not _SMALL else (1 << 7)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n_rows, 128)).astype(np.float32))
    x0 = jnp.asarray(rng.integers(1, 100, 1024).astype(np.int32))

    def kernel(seed_ref, in_ref, out_ref):
        out_ref[0] = jnp.sum(in_ref[:]) + seed_ref[0].astype(jnp.float32)

    n_blocks = n_rows // block

    @jax.jit
    def block_sums(x, table):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (i - i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((block, 128), lambda i: (i, i - i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1,), lambda i: (i,),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks,), jnp.float32),
            interpret=_INTERPRET,
        )(x[:1], table)

    def run(x, table):
        # fold the sums back into the (tiny) carried vector
        return (x + jnp.sum(block_sums(x, table)).astype(jnp.int32)) \
            % 1000 + 1

    # semantic self-check: block sums must reduce to the table's sum
    # (f64 accumulation of the f32 block sums; ordering slack only)
    import math
    got = float(jnp.sum(block_sums(x0, table).astype(jnp.float64)))
    want = float(jnp.sum(table.astype(jnp.float64)))
    want += n_blocks * float(x0[0])
    if not math.isclose(got, want, rel_tol=1e-4):
        raise ValueError(f"stream_sum kernel wrong: {got} vs {want}")
    print(json.dumps({"verified": "stream_sum"}), file=sys.stderr,
          flush=True)
    return _chain_rate(run, x0, n_rows * 128 * 4, consts=(table,))


def k_xla_stream_scale():
    """XLA elementwise stream (y = x * c): what plain XLA achieves on
    the same read-n/write-n pattern as stream_copy. Returns bytes/s."""
    import jax.numpy as jnp
    n_rows = (1 << 20) if not _SMALL else (1 << 10)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n_rows, 128)).astype(np.float32) + 0.5)

    def apply(x):
        return x * jnp.float32(1.0000001)

    return _chain_rate(apply, x0, 2 * n_rows * 128 * 4)


KERNELS = {
    "stream_copy": k_pallas_stream_copy,
    "stream_sum": k_pallas_stream_sum,
    "xla_stream_scale": k_xla_stream_scale,
    "gather8": k_gather8,
    "gather32": k_gather32,
    "scatter_add_sorted": k_scatter_add_sorted,
    "gather16": k_gather16,
    "scatter_add": k_scatter_add,
    "scatter_add_small": k_scatter_add_small,
    "sort_u32": k_sort_u32,
    "sort_u64": k_sort_u64,
    "pallas_gather_loop": k_pallas_gather_loop,
    "pallas_rmw_loop": k_pallas_rmw_loop,
    "pallas_bcast_cmp": k_pallas_bcast_cmp,
}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        rate = KERNELS[sys.argv[2]]()
        print(json.dumps({"kernel": sys.argv[2], "rate": rate}), flush=True)
        return

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(KERNELS)
    for name in names:
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--only", name],
                capture_output=True, text=True, timeout=KERNEL_TIMEOUT_S)
            rate = None
            for line in reversed(out.stdout.strip().splitlines()):
                try:
                    rate = json.loads(line)["rate"]
                    break
                except (ValueError, KeyError):
                    continue
            if rate is None:
                print(f"{name}: FAILED\n{out.stderr[-2000:]}", flush=True)
            else:
                print(f"{name}: {rate/1e6:.1f} M items/s "
                      f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT after {KERNEL_TIMEOUT_S}s", flush=True)


if __name__ == "__main__":
    main()
