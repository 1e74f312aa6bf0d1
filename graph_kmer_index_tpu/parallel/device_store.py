"""Device-resident object store — the TPU-native replacement for the
reference's POSIX shared-memory object store (shared_mem.py:37-120:
``to_shared_memory(obj, name)`` / ``from_shared_memory(cls, name)``).

The reference serializes every array in ``obj.properties`` into named
SharedArray segments so forked workers can attach zero-copy. On TPU the
equivalent residency is HBM: ``to_device_memory`` moves each property
array onto device (optionally with a NamedSharding so one logical object
spans the mesh) and registers it under a name; ``from_device_memory``
rebuilds the object class around the same device buffers with zero copy.
"""
from __future__ import annotations

import numpy as np

_REGISTRY: dict = {}


class SingleSharedArray:
    """Wrapper that lets a bare array travel through the object store
    (reference shared_mem.py:11-18: the same trick for SharedArray
    segments)."""

    properties = ["array"]

    def __init__(self, array=None):
        self.array = array


def to_device_memory(obj, name: str, sharding=None) -> str:
    """Put every array in ``obj.properties`` on device; register by name."""
    import jax

    arrays = {}
    for prop in obj.properties:
        value = getattr(obj, prop)
        if isinstance(value, np.ndarray):
            arrays[prop] = (jax.device_put(value, sharding)
                            if sharding is not None else jax.device_put(value))
        else:
            arrays[prop] = value
    _REGISTRY[name] = (type(obj), arrays)
    return name


def from_device_memory(cls, name: str):
    """Rebuild the object around the registered device buffers (no copy)."""
    stored_cls, arrays = _REGISTRY[name]
    assert issubclass(stored_cls, cls) or stored_cls is cls, \
        f"{name} holds a {stored_cls.__name__}, not {cls.__name__}"
    obj = cls.__new__(cls)
    # construct via __init__ when the signature is the property dict,
    # else set attributes directly (covers both styles used in models/)
    try:
        obj.__init__(**arrays)
    except TypeError:
        for prop, value in arrays.items():
            setattr(obj, prop, value)
    return obj


def free(name: str) -> None:
    _REGISTRY.pop(name, None)


def free_all() -> None:
    """Reference remove_shared_memory_in_session equivalent
    (shared_mem.py:99-120)."""
    _REGISTRY.clear()
