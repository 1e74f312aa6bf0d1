"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
logic (graph_kmer_index_tpu.parallel) is exercised without TPU hardware.
Mirrors the reference's test strategy of tiny in-memory graphs
(/root/reference/tests/*, e.g. test_kmer_finder.py:12-16) plus
N-way-parallel == serial equality checks (test_shared_memory.py:22-27).
"""
import os

# Must be set before jax import (anywhere) in the test process. The image's
# sitecustomize registers a hardware backend when PALLAS_AXON_POOL_IPS is
# set and JAX_PLATFORMS=axon is preset in the environment — override both
# so tests deterministically get the 8-device CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize may have already imported jax and pinned the hardware
# platform; the config update below wins as long as no backend has been
# initialized yet (conftest runs before any test imports trigger one).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
