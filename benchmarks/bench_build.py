"""Device-only index-build rates: rows are SYNTHESIZED ON DEVICE so the
sandbox's ~5 MB/s host->device tunnel (which dominates any wall-clock
build measurement here) is out of the picture. Measures the three build
stages of ops/build.py plus the packed-record build of ops/lookup.py:

  1. sort rows by reference bucket        (_sort_rows + row reorder)
  2. bucket starts/sizes scatter          (_bucket_tables)
  3. per-row frequencies                  (_frequencies_full_device)
  4. packed-record table                  (_build_packed staged jits)

Usage: python benchmarks/bench_build.py [n_rows] [modulo]
"""
import sys
import time


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    modulo = int(sys.argv[2]) if len(sys.argv) > 2 else 452930477

    import jax
    import jax.numpy as jnp
    import numpy as np
    from graph_kmer_index_tpu.ops.build import (
        _sort_rows, _bucket_tables, _frequencies_full_device)
    from graph_kmer_index_tpu.ops import lookup as lk

    key = jax.random.PRNGKey(0)

    @jax.jit
    def synth(key):
        k1, k2, k3 = jax.random.split(key, 3)
        kmers = jax.random.randint(
            k1, (n_rows,), 0, 1 << 62, dtype=jnp.int64).astype(jnp.uint64)
        nodes = jax.random.randint(k2, (n_rows,), 1, 1 << 20,
                                   dtype=jnp.int32)
        offs = jax.random.randint(k3, (n_rows,), 0, 1 << 30,
                                  dtype=jnp.int64)
        return kmers, nodes, offs

    kmers, nodes, offs = synth(key)

    @jax.jit
    def digest(*arrays):
        acc = jnp.uint64(0)
        for a in arrays:
            f = a.reshape(-1)
            acc = acc + f[-1].astype(jnp.uint64) + f[0].astype(jnp.uint64)
        return acc

    def sync(out):
        # block_until_ready does NOT reliably block on this backend; the
        # only trustworthy sync is a scalar fetch
        if not isinstance(out, tuple):
            out = (out,)
        return int(digest(*out))

    sync((kmers, nodes, offs))
    print(f"synth: {n_rows} rows on device", flush=True)

    def stage(name, fn):
        out = fn()
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        sync(fn())
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
            sync(out)
        dt = (time.perf_counter() - t0) / 3
        dt = min(dt, t_one)
        print(f"{name}: {dt*1e3:.1f} ms -> {n_rows/dt/1e6:.0f} M rows/s",
              flush=True)
        return out

    row_ids = jnp.arange(n_rows, dtype=jnp.int32)  # matches production
    perm = stage("1 sort+perm", lambda: _sort_rows(kmers, row_ids, modulo))
    kmers_s = kmers[perm]
    offs_s = offs[perm]
    sorted_buckets = (kmers_s % jnp.uint64(modulo)).astype(
        jnp.int32 if modulo < 2**31 else jnp.int64)  # matches production
    sync((kmers_s, offs_s, sorted_buckets))
    stage("2 bucket tables", lambda: _bucket_tables(sorted_buckets, modulo))
    stage("3 frequencies", lambda: _frequencies_full_device(kmers_s, offs_s))

    nodes_s = nodes[perm].astype(jnp.uint32)
    sync((nodes_s,))
    modulo2 = lk.internal_modulo(n_rows)
    t0 = time.perf_counter()
    rec, ks, ns, max_sz, _df = lk._build_packed(kmers_s, nodes_s, modulo2)
    sync((rec, ks))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec, ks, ns, max_sz, _df = lk._build_packed(kmers_s, nodes_s, modulo2)
    sync((rec, ks))
    dt = time.perf_counter() - t0
    print(f"4 packed records (modulo2={modulo2}, max bucket={max_sz}): "
          f"{dt*1e3:.1f} ms warm ({t_first:.1f}s cold) -> "
          f"{n_rows/dt/1e6:.0f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
