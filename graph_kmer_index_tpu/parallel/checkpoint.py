"""Sharded index checkpoints: per-shard npz files + a manifest.

The reference checkpoints every index as one whole-array npz
(collision_free_kmer_index.py:393-420) and has no sharded storage at
all — its L7 parallelism is fork+shm inside one host (shared_mem.py).
For the multi-chip layouts here (:class:`~.sharded.TableShards` /
:class:`~.sharded.PackedTableShards`) a single whole-table file is the
wrong shape twice over: a multi-process build holds each shard on a
different host (the full array is never addressable anywhere), and a
serving fleet wants each host to read ONLY its own shards. So a shard
set checkpoints as

    {prefix}.manifest.npz                   layout + shapes + version
    {prefix}.shard-TTTTT-of-NNNNN.npz       one file per table shard

with deterministic shard IDs (SURVEY.md §5.4's "orbax-style array
checkpoints + deterministic chunk IDs" — hand-rolled npz rather than
orbax so files stay plain, inspectable, and loadable with numpy alone).

Save works from host-numpy shard containers and from device-resident
ones (e.g. ``build_packed_shards_sharded(..., return_device=True)``);
in a multi-process ``jax.distributed`` run each process writes only the
shards it can address and process 0 writes the manifest. Load can
target the host (full numpy container) or a mesh (each process reads
only the shard files backing its addressable devices, via
``jax.make_array_from_callback``).
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharded import PackedTableShards, TableShards
from ..utils.hugepages import hp_empty, hp_zeros

_VERSION = 1

# per-kind column schema: name -> (per-shard ndim, dtype)
_SCHEMAS = {
    "packed": {"records": (2, np.uint32), "row_kmers": (1, np.uint64),
               "row_nodes": (1, np.int32)},
    "csr": {"starts": (1, np.int64), "sizes": (1, np.int32),
            "row_kmers": (1, np.uint64), "row_nodes": (1, np.int32)},
}


def manifest_path(prefix: str) -> str:
    return f"{prefix}.manifest.npz"


def shard_path(prefix: str, t: int, n_table: int) -> str:
    return f"{prefix}.shard-{t:05d}-of-{n_table:05d}.npz"


def _atomic_savez(path: str, **arrays) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _local_shard_slices(arr, n_table: int):
    """Yield ``(t, slice_without_leading_axis)`` for every locally
    addressable shard of a ``(n_table, ...)``-stacked column. Host numpy
    arrays are fully addressable; jax Arrays may be split across
    processes (and a replicated spec may present the same shard on
    several devices — deduplicated here)."""
    if isinstance(arr, jax.Array):
        seen = set()
        for sh in arr.addressable_shards:
            t0 = sh.index[0].start
            t0 = 0 if t0 is None else int(t0)
            data = np.asarray(sh.data)
            # only the LEADING (table) axis may be sharded: a piece
            # split along a trailing axis would silently checkpoint a
            # fragment as the whole shard
            assert data.shape[1:] == arr.shape[1:], \
                (f"column sharded along a trailing axis "
                 f"({data.shape} piece of {arr.shape}); shard "
                 f"checkpoints require P('table', None, ...) layouts")
            for i in range(data.shape[0]):
                if t0 + i not in seen:
                    seen.add(t0 + i)
                    yield t0 + i, data[i]
    else:
        a = np.asarray(arr)
        assert a.shape[0] == n_table, (a.shape, n_table)
        for t in range(n_table):
            yield t, a[t]


def save_shards(shards, prefix: str) -> list[str]:
    """Checkpoint a shard container to ``{prefix}.*`` files.

    Returns the paths written BY THIS PROCESS (in a multi-process run
    that is only the locally addressable shards, plus the manifest on
    process 0). Writes are atomic (tmp + rename), so a crashed save
    never leaves a torn shard file behind.
    """
    if isinstance(shards, PackedTableShards):
        kind = "packed"
        cols = {"records": shards.records, "row_kmers": shards.row_kmers,
                "row_nodes": shards.row_nodes}
        meta = dict(kind=kind, version=_VERSION, n_table=shards.n_table,
                    m2_local=shards.m2_local, modulo2=shards.modulo2,
                    max_scan=shards.max_scan, has_dup=int(shards.has_dup))
    elif isinstance(shards, TableShards):
        kind = "csr"
        cols = {"starts": shards.starts, "sizes": shards.sizes,
                "row_kmers": shards.row_kmers, "row_nodes": shards.row_nodes}
        meta = dict(kind=kind, version=_VERSION, n_table=shards.n_table,
                    m_local=shards.m_local, modulo=shards.modulo,
                    max_scan=shards.max_scan)
    else:
        raise TypeError(f"not a shard container: {type(shards).__name__}")

    n_table = int(shards.n_table)
    schema = _SCHEMAS[kind]
    local: dict[int, dict[str, np.ndarray]] = {}
    shapes = {}
    any_device = any(isinstance(a, jax.Array) for a in cols.values())
    if not isinstance(shards.row_nodes, jax.Array):
        # serving-time n_nodes hint, free when the full column is host-
        # addressable (a device-backed multi-process save would need a
        # collective — loaders fall back to a device max then)
        a = np.asarray(shards.row_nodes)
        meta["max_node"] = int(a.max()) if a.size else 0
    for name, arr in cols.items():
        shapes[f"shape_{name}"] = np.asarray(arr.shape[1:], dtype=np.int64)
        for t, sl in _local_shard_slices(arr, n_table):
            ndim, dtype = schema[name]
            assert sl.ndim == ndim, (name, sl.shape)
            local.setdefault(t, {})[name] = np.ascontiguousarray(
                sl.astype(dtype, copy=False))

    written = []
    for t in sorted(local):
        missing = set(schema) - set(local[t])
        assert not missing, f"shard {t} missing columns {missing}"
        path = shard_path(prefix, t, n_table)
        _atomic_savez(path, **local[t])
        written.append(path)
    # process_index() initializes the default backend — never force
    # that for a pure host-numpy save (on this sandbox the axon backend
    # hangs when the relay is down, and a live accelerator backend
    # disables the host fork pool); all-numpy saves are single-process
    # by construction
    if not any_device or jax.process_index() == 0:
        path = manifest_path(prefix)
        _atomic_savez(path, **meta, **shapes)
        written.append(path)
    return written


def _read_manifest(prefix: str):
    with np.load(manifest_path(prefix)) as z:
        meta = {k: z[k] for k in z.files}
    version = int(meta["version"])
    if version > _VERSION:
        raise ValueError(f"shard checkpoint version {version} is newer "
                         f"than this library understands ({_VERSION})")
    kind = str(meta["kind"])
    if kind not in _SCHEMAS:
        raise ValueError(f"unknown shard checkpoint kind {kind!r}")
    return kind, meta


def manifest_info(prefix: str) -> dict:
    """Layout metadata of a checkpoint without reading any shard file:
    ``{"kind", "n_table", "max_scan", and the layout's modulo fields}``."""
    kind, meta = _read_manifest(prefix)
    info = {"kind": kind, "n_table": int(meta["n_table"]),
            "max_scan": int(meta["max_scan"])}
    if "max_node" in meta:
        info["max_node"] = int(meta["max_node"])
    if kind == "packed":
        info.update(m2_local=int(meta["m2_local"]),
                    modulo2=int(meta["modulo2"]),
                    has_dup=bool(int(meta["has_dup"])))
    else:
        info.update(m_local=int(meta["m_local"]),
                    modulo=int(meta["modulo"]))
    return info


def load_shards(prefix: str, mesh=None, axis: str = "table"):
    """Load a shard checkpoint written by :func:`save_shards`.

    With ``mesh=None`` returns a host-numpy container (all shard files
    read and stacked). With a mesh, the columns come back as jax Arrays
    sharded ``P(axis, None, ...)`` over ``mesh``; the mesh's ``axis``
    size must equal the checkpoint's ``n_table``, and each process reads
    only the shard files backing its own devices — the multi-host
    serving path never materializes the whole table anywhere.
    """
    kind, meta = _read_manifest(prefix)
    schema = _SCHEMAS[kind]
    n_table = int(meta["n_table"])
    shapes = {name: tuple(int(d) for d in meta[f"shape_{name}"])
              for name in schema}

    def read_col(t: int, name: str, z) -> np.ndarray:
        a = z[name]
        ndim, dtype = schema[name]
        if a.ndim != ndim or a.dtype != dtype \
                or any(g > m for g, m in zip(a.shape, shapes[name])):
            raise ValueError(
                f"shard {t} column {name}: got {a.dtype}{a.shape}, "
                f"manifest says {np.dtype(dtype)}{shapes[name]}")
        if a.shape != shapes[name]:
            # ONLY the 1-D row_* slabs may be stored UNPADDED
            # (out-of-core builders write exact lengths so per-shard
            # builds never need the global max) — bucket tables and
            # packed records must match exactly: zero-padding them
            # would fabricate size-0/occupied-by-kmer-0 buckets
            if not name.startswith("row_") or ndim != 1:
                raise ValueError(
                    f"shard {t} column {name}: got {a.shape}, "
                    f"manifest says {shapes[name]} (only row_* columns "
                    f"may be stored short)")
            out = hp_zeros(shapes[name], dtype, populate=True)
            out[: a.shape[0]] = a
            return out
        return a

    if mesh is None:
        cols = {name: hp_empty((n_table,) + shapes[name], dtype)
                for name, (_, dtype) in schema.items()}
        for t in range(n_table):
            with np.load(shard_path(prefix, t, n_table)) as z:
                for name in schema:
                    cols[name][t] = read_col(t, name, z)
    else:
        if mesh.shape[axis] != n_table:
            raise ValueError(
                f"mesh axis {axis!r} has {mesh.shape[axis]} devices but "
                f"the checkpoint has {n_table} shards")

        def make(name):
            ndim, dtype = schema[name]
            gshape = (n_table,) + shapes[name]
            sharding = NamedSharding(mesh, P(axis, *([None] * ndim)))

            def cb(idx):
                t0 = idx[0].start
                t0 = 0 if t0 is None else int(t0)
                t1 = idx[0].stop
                t1 = n_table if t1 is None else int(t1)
                parts = []
                for t in range(t0, t1):
                    with np.load(shard_path(prefix, t, n_table)) as z:
                        parts.append(read_col(t, name, z))
                return np.stack(parts).astype(dtype, copy=False)

            return jax.make_array_from_callback(gshape, sharding, cb)

        cols = {name: make(name) for name in schema}

    if kind == "packed":
        return PackedTableShards(
            cols["records"], cols["row_kmers"], cols["row_nodes"],
            m2_local=int(meta["m2_local"]), modulo2=int(meta["modulo2"]),
            max_scan=int(meta["max_scan"]), n_table=n_table,
            has_dup=bool(int(meta["has_dup"])))
    return TableShards(
        cols["starts"], cols["sizes"], cols["row_kmers"],
        cols["row_nodes"], m_local=int(meta["m_local"]),
        modulo=int(meta["modulo"]), max_scan=int(meta["max_scan"]),
        n_table=n_table)
