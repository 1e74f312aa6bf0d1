"""Serving-path benchmark: the map_reads --table-shards hot loop.

Measures the from_kmers mesh steps (counts + membership) on a
device-built sharded table — rows are synthesized ON DEVICE so the
sandbox's ~5 MB/s tunnel is excluded from the build, and every step
call syncs on its own scalar (the dropped-overflow fetch), so plain
wall-clock over calls is a true rate on this backend.

With --ckpt it also times checkpoint save/load through the host
(disk + host<->device transfer — meaningful on CPU hosts; on the axon
sandbox this measures the tunnel, so it is off by default).

Usage: python benchmarks/bench_serve.py [n_rows] [n_queries] [n_table]
       [--ckpt]
"""
import os
import sys
import tempfile
import time

import numpy as np


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(pos[0]) if len(pos) > 0 else 16_000_000
    n_q = int(pos[1]) if len(pos) > 1 else 1 << 22
    do_ckpt = "--ckpt" in sys.argv

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graph_kmer_index_tpu.parallel.checkpoint import (
        load_shards, save_shards)
    from graph_kmer_index_tpu.parallel.sharded import (
        KMER_PAD, build_packed_shards_sharded, make_count_step_packed,
        make_member_step_packed)

    n_dev = len(jax.devices())
    n_table = min(int(pos[2]) if len(pos) > 2 else n_dev, n_dev)
    if n_dev % n_table:
        raise SystemExit(f"n_table={n_table} does not divide the "
                         f"{n_dev}-device mesh")
    n_data = n_dev // n_table
    n_nodes = 1 << 20

    # rows born on device (tunnel-free): uniform 62-bit hashes
    key = jax.random.PRNGKey(0)
    kmers = jax.random.bits(key, (n_rows,), jnp.uint64) >> jnp.uint64(2)
    nodes = (jax.random.bits(jax.random.PRNGKey(1), (n_rows,), jnp.uint32)
             % jnp.uint32(n_nodes - 1)) + jnp.uint32(1)

    t = time.perf_counter()
    built, counts_per = build_packed_shards_sharded(
        kmers, nodes, n_table, return_device=True)
    n0 = int(np.asarray(counts_per)[0])  # scalar fetch = true sync
    print(f"sharded build ({n_table} shards, {n_rows} rows): "
          f"{time.perf_counter()-t:.2f}s (shard0 rows {n0})", flush=True)

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_data, n_table),
                ("data", "table"))
    shards = built
    if do_ckpt:
        td = tempfile.mkdtemp()
        prefix = os.path.join(td, "serve")
        t = time.perf_counter()
        save_shards(shards, prefix)
        print(f"checkpoint save: {time.perf_counter()-t:.2f}s", flush=True)
        t = time.perf_counter()
        shards = load_shards(prefix, mesh=mesh)
        shards.row_kmers.block_until_ready()
        print(f"checkpoint load->mesh: {time.perf_counter()-t:.2f}s",
              flush=True)
    else:
        # re-place the build outputs for the serving mesh shape —
        # device-to-device (a host round-trip would pull ~GBs through
        # this sandbox's ~5 MB/s tunnel)
        specs = {"records": P("table", None, None),
                 "row_kmers": P("table", None),
                 "row_nodes": P("table", None)}
        for name, spec in specs.items():
            setattr(shards, name, jax.device_put(
                getattr(shards, name), NamedSharding(mesh, spec)))

    # half-hit query batch, KMER_PAD-padded to the data axis
    rng = np.random.default_rng(2)
    hit = np.asarray(kmers[jnp.asarray(
        rng.integers(0, n_rows, n_q // 2))])
    miss = rng.integers(0, 1 << 62, n_q - n_q // 2).astype(np.uint64)
    q = np.concatenate([hit, miss])
    rng.shuffle(q)
    total = -(-len(q) // n_data) * n_data
    qp = np.full(total, KMER_PAD, dtype=np.uint64)
    qp[:len(q)] = q
    q_dev = jax.device_put(jnp.asarray(qp),
                           NamedSharding(mesh, P("data")))
    targs = (shards.records, shards.row_kmers, shards.row_nodes)

    for name, maker in (
            ("counts", lambda: make_count_step_packed(
                mesh, shards, n_nodes, 31, from_kmers=True)),
            ("membership", lambda: make_member_step_packed(
                mesh, shards, 31, from_kmers=True))):
        step = maker()
        # both steps sync internally on the dropped-overflow scalar;
        # fetching element 0 of the result is a second, harmless sync
        run = lambda: int(np.asarray(step(q_dev, *targs)[0]))  # noqa
        run(); run()  # compile + warm
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        dt = time.perf_counter() - t0
        print(f"serve {name}: {n_q*reps/dt/1e6:.1f} M q/s "
              f"({dt/reps*1e3:.1f} ms / {n_q>>20}Mi batch, "
              f"{n_data}x{n_table} mesh)", flush=True)


if __name__ == "__main__":
    main()
