"""Sharded (multi-chip) query and count kernels.

The reference's concurrency model is fork() + POSIX shared memory +
worklist splits with a final host concatenate (shared_mem.py:123-176,
collision_free_kmer_index.py:222-232). The TPU-native equivalents:

- membership / lookup: shard the query batch over the mesh ``data`` axis;
  the table is replicated (or bucket-sharded on the ``table`` axis for
  very large indexes); results gather back.
- node counts / count-min sketch: each device scatter-adds its local
  counts; merging is a pure ``psum`` over the data axis (SURVEY.md §5.8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import data_mesh
from ..ops.lookup import _has_kmers, _node_counts


def _shard_pad(kmers: np.ndarray, n_shards: int):
    n = len(kmers)
    per = -(-max(n, 1) // n_shards)
    out = np.zeros(per * n_shards, dtype=np.uint64)
    out[:n] = kmers
    return out, n


def has_kmers_sharded(index, kmers: np.ndarray, n_shards: int | None = None):
    """Data-parallel membership query (reference has_kmers_parallel)."""
    dev = index._device()
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    q = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    out = _has_kmers(q, n, dev.table_kmers, dev.starts_tbl, dev.sizes_tbl,
                     dev.modulo, dev.max_scan)
    return np.asarray(out)[:n]


def map_kmers_sharded(index, kmers: np.ndarray, n_nodes: int,
                      n_shards: int | None = None):
    """Sharded node-count mapping: each device counts its query shard into
    a node-count vector; the scatter-add result is an implicit psum."""
    dev = index._device()
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    q = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    counts = _node_counts(q, n, dev.table_kmers, dev.table_nodes,
                          dev.starts_tbl, dev.sizes_tbl, dev.modulo,
                          int(n_nodes), dev.max_scan)
    return np.asarray(counts)


def count_min_sketch_sharded(kmers: np.ndarray, modulos,
                             n_shards: int | None = None,
                             dtype=jnp.int32):
    """Count-min sketch over a sharded kmer batch; rows are bincounts per
    modulo, merged across devices by psum (reference
    count_min_sketch_kmer_counter.py:25-29 is the single-host loop)."""
    from jax.experimental.shard_map import shard_map

    modulos = np.asarray(modulos, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(modulos)[:-1]])
    total = int(np.sum(modulos))
    n_devices = len(jax.devices())
    n_shards = min(n_shards or n_devices, n_devices)
    mesh = data_mesh(n_shards)
    q, n = _shard_pad(kmers, n_shards)
    valid_len = n

    modulos_j = jnp.asarray(modulos.astype(np.uint64))
    offsets_j = jnp.asarray(offsets.astype(np.int64))

    def local_count(shard):
        # shard: (per,) local kmers; build local sketch then psum
        sketch = jnp.zeros(total, dtype=dtype)
        idx_in_shard = jax.lax.axis_index("data")
        per = shard.shape[0]
        global_pos = idx_in_shard * per + jnp.arange(per)
        valid = (global_pos < valid_len).astype(dtype)
        for r in range(len(modulos)):
            pos = (shard % modulos_j[r]).astype(jnp.int64) + offsets_j[r]
            sketch = sketch.at[pos].add(valid)
        return jax.lax.psum(sketch, "data")

    fn = shard_map(local_count, mesh=mesh, in_specs=P("data"),
                   out_specs=P())
    return np.asarray(fn(jnp.asarray(q)))


def run_sharded_function(func, n_shards, array_args):
    """Generic data-parallel map over the leading axis of array args with a
    host concatenate — drop-in for the reference's
    run_numpy_based_function_in_parallel (shared_mem.py:123-176). ``func``
    must be a jax-traceable function of the sliced args."""
    lengths = {len(a) for a in array_args if isinstance(a, np.ndarray)}
    assert len(lengths) == 1, "array args must share leading length"
    n = lengths.pop()
    bounds = np.linspace(0, n, n_shards + 1).astype(int)
    outs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        sliced = [x[a:b] if isinstance(x, np.ndarray) else x
                  for x in array_args]
        outs.append(np.asarray(func(*sliced)))
    return np.concatenate(outs)
