"""Device-side (JAX/XLA/Pallas) compute kernels."""
from . import encode  # noqa: F401
