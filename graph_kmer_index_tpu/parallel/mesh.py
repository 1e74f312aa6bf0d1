"""Device mesh helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over up to n_devices for data-parallel sharding of query /
    window batches. Index tables are replicated; counts merge with psum."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def build_mesh(n_data: int | None = None, n_table: int = 1,
               data_axis: str = "data", table_axis: str = "table") -> Mesh:
    """2-D mesh: ``data`` shards read/window batches, ``table`` shards
    bucket ranges of the kmer table (for indexes too big for one chip)."""
    devices = np.asarray(jax.devices())
    if n_data is None:
        n_data = len(devices) // n_table
    devices = devices[: n_data * n_table].reshape(n_data, n_table)
    return Mesh(devices, (data_axis, table_axis))
