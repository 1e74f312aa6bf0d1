"""Probe: convert the u32 flat record buffer to the u8/u16 (groups, 128)
gather layout via bitcast_convert_type + reshape — if this lowers to a
single relayout copy, production can keep the 5-scatter u32 build and
pay one cheap pass for the narrow-lane decode table.

Chained-differenced timing against a CONTROL chain (the fold reduction
alone), since block_until_ready is unreliable on this backend: the
conversion cost is (convert-chain − control-chain) per iteration.

Usage: python benchmarks/bench_bitcast.py [n_u32]
"""
import functools
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 28  # 1 GB u32

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    host = rng.integers(0, 1 << 32, 1 << 20, dtype=np.uint64).astype(np.uint32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def synth(x, n):
        return jnp.tile(x, n // x.shape[0])

    w0 = synth(jnp.asarray(host), n)

    def make_chain(dt):
        @jax.jit
        def chain(w, reps):
            def body(i, w):
                if dt is not None:
                    b = jax.lax.bitcast_convert_type(w, dt)
                    r = b.reshape(-1, 128)
                    s = r.astype(jnp.uint32).sum()
                else:
                    s = w.sum()  # control: the fold reduction alone
                return w ^ s
            return jax.lax.fori_loop(0, reps, body, w).sum()
        return chain

    results = {}
    for name, dt in (("control", None), ("u8", jnp.uint8),
                     ("u16", jnp.uint16)):
        chain = make_chain(dt)
        int(chain(w0, 2))
        t0 = time.perf_counter()
        int(chain(w0, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(w0, 10))
        t10 = time.perf_counter() - t0
        per = (t10 - t2) / 8
        results[name] = per
        print(f"{name:8s} {per*1e3:8.2f} ms/iter", flush=True)
    for name in ("u8", "u16"):
        d = results[name] - results["control"]
        print(f"{name} convert cost: {d*1e3:.1f} ms for {4*n/2**30:.2f} GB "
              f"({4*n/max(d,1e-9)/2**30:.0f} GB/s)", flush=True)

    # correctness: little-endian byte order must match the decode's
    # (w >> 8j) & 0xFF expectation
    w_small = jnp.asarray(host[:512])
    b8 = np.asarray(jax.lax.bitcast_convert_type(w_small, jnp.uint8))
    ref = np.stack([(host[:512] >> (8 * j)) & 0xFF for j in range(4)], 1)
    print("u8 byte order little-endian:", np.array_equal(b8, ref), flush=True)
    b16 = np.asarray(jax.lax.bitcast_convert_type(w_small, jnp.uint16))
    ref16 = np.stack([(host[:512] >> (16 * j)) & 0xFFFF for j in range(2)], 1)
    print("u16 order little-endian:", np.array_equal(b16, ref16), flush=True)


if __name__ == "__main__":
    main()
