"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
logic (graph_kmer_index_tpu.parallel) is exercised without TPU hardware.
Mirrors the reference's test strategy of tiny in-memory graphs
(/root/reference/tests/*, e.g. test_kmer_finder.py:12-16) plus
N-way-parallel == serial equality checks (test_shared_memory.py:22-27).
"""
import os

# Must be set before jax import (anywhere) in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
