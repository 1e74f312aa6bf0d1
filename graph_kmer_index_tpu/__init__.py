"""graph_kmer_index_tpu — TPU-native graph k-mer indexing engine.

A from-scratch JAX/XLA/Pallas re-design of the capability stack of
``ivargr/graph_kmer_index`` (the k-mer indexing backend of the KAGE
genotyper): batched path-window enumeration over pangenome variant
graphs, 2-bit rolling-hash k-mer encoding, collision-free multi-value
hash indexes, counters/sketches, and reference/reverse k-mer indexes —
with device-resident build/lookup kernels and pjit/shard_map scaling
over TPU meshes.

k-mer hashes need 62 bits (k <= 31), so the package enables jax x64 at
import; hot Pallas kernels internally use exact 2 x uint32 arithmetic.
"""
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: on this class of backend a single jit
# costs 30-120 s through a remote compile helper and every PROCESS pays
# it again (CLI invocations, bench subprocesses). The cache is keyed by
# HLO+platform, so correctness is unaffected; backends that cannot
# serialize executables silently skip it. GKI_COMPILE_CACHE= (empty)
# disables; min-compile-time 5 s keeps the thousands of sub-second CPU
# test compiles out of it.
_cache_dir = _os.environ.get(
    "GKI_COMPILE_CACHE", _os.path.expanduser("~/.cache/gki_jax_cache"))
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           5.0)
    except Exception:  # older jax without the knobs: not fatal
        pass

from .hashing import (  # noqa: E402,F401
    power_array,
    reverse_power_array,
    letter_sequence_to_numeric,
    numeric_to_letter_sequence,
    kmer_to_hash_fast,
    update_hash,
    sequence_to_kmer_hash,
    kmer_hash_to_sequence,
    kmer_hashes_to_bases,
    kmer_hashes_to_complement_hashes,
    kmer_hashes_to_reverse_complement_hash,
    kmer_hash_to_reverse_complement_hash,
)
from .flat_kmers import FlatKmers, FlatKmers2  # noqa: E402,F401
from .graph import Graph, PositionId, VariantToNodes  # noqa: E402,F401
from .critical_paths import CriticalGraphPaths  # noqa: E402,F401
from .finder import DenseKmerFinder  # noqa: E402,F401
from .snp_finder import SnpKmerFinder, IndelKmerFinder  # noqa: E402,F401
from .bionumpy_wrapper import bionumpy_hash  # noqa: E402,F401
from .read_kmers import ReadKmers, DeviceReadKmers  # noqa: E402,F401
from .models.kmer_index import (  # noqa: E402,F401
    CollisionFreeKmerIndex,
    CollisionFreeKmerIndex as KmerIndex,
    MinimalKmerIndex,
    KmerIndex2,
    CounterKmerIndex,
)
from .models.reverse_index import ReverseKmerIndex  # noqa: E402,F401
from .models.reference_index import ReferenceKmerIndex  # noqa: E402,F401
from .models.unique_index import UniqueKmerIndex  # noqa: E402,F401
from .models.variant_nodes_index import VariantNodesIndex  # noqa: E402,F401
from .models.counters import (  # noqa: E402,F401
    KmerCounter,
    CountMinSketchKmerCounter,
    KmerFrequencyIndex,
)
from .variants import VcfVariant, VcfVariants  # noqa: E402,F401
from .graph_builder import (  # noqa: E402,F401
    build_graph_from_vcf, build_graph_from_files,
)
from .unique_variant_kmers import UniqueVariantKmersFinder  # noqa: E402,F401
from .structural_variants import (  # noqa: E402,F401
    sample_kmers_from_structural_variants,
)
from .models.bundle import IndexBundle  # noqa: E402,F401
