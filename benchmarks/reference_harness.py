"""Load and run the ACTUAL reference implementation (/root/reference)
in-process, for head-to-head benchmarks and behavior-parity checks.

The reference's external dependencies are stubbed with API-compatible
pieces of this package:

- ``obgraph`` -> our array-backed Graph / PositionId / VariantToNodes
  (graph.py was designed against the obgraph interface the reference
  uses, and obgraph is numpy-array-backed too, so graph-accessor cost is
  comparable — the reference's own compute is untouched);
- ``Bio.Seq.Seq`` -> a minimal reverse-complement shim;
- ``npstructures`` HashTable/Counter -> our containers (same API).

Only the reference's pure-python/numpy modules are loaded (the compute
core being benchmarked); its CLI / multiprocess / external-native layers
(pathos, SharedArray, kmer_mapper, shared_memory_wrapper) are not.

Nothing from /root/reference is copied — modules are symlinked into a
temp package at load time.
"""
from __future__ import annotations

import os
import sys
import tempfile
import types

REF = "/root/reference"

_MODULES = [
    "kmer_finder.py", "critical_graph_paths.py", "flat_kmers.py",
    "nplist.py", "kmer_hashing.py", "snp_kmer_finder.py",
    "collision_free_kmer_index.py", "multi_value_hashtable.py",
    "logn_hash_map.py", "npset.py", "reverse_kmer_index.py",
    "kmer_counter.py", "count_min_sketch_kmer_counter.py",
    "kmer_frequency_index.py", "unique_variant_kmers.py",
    "read_kmers.py", "indel_kmer_finder.py", "structural_variants.py",
]

_INIT = """\
from .flat_kmers import letter_sequence_to_numeric, numeric_to_letter_sequence
from .snp_kmer_finder import kmer_to_hash_fast, sequence_to_kmer_hash, \
    kmer_hash_to_sequence
from .snp_kmer_finder import SnpKmerFinder
from .flat_kmers import FlatKmers
from .reverse_kmer_index import ReverseKmerIndex
from .collision_free_kmer_index import CollisionFreeKmerIndex
from .collision_free_kmer_index import CollisionFreeKmerIndex as KmerIndex
from .collision_free_kmer_index import KmerIndex2, CounterKmerIndex
from .read_kmers import ReadKmers
from .kmer_finder import DenseKmerFinder
from .critical_graph_paths import CriticalGraphPaths
from . import unique_variant_kmers
"""


class _Seq(str):
    _COMP = str.maketrans("acgtACGT", "tgcaTGCA")

    def reverse_complement(self):
        return _Seq(self.translate(self._COMP)[::-1])


def _install_stubs():
    from graph_kmer_index_tpu.graph import Graph, PositionId, VariantToNodes
    from graph_kmer_index_tpu import containers

    ob = types.ModuleType("obgraph")
    ob.Graph = Graph

    class VariantNotFoundException(Exception):
        pass

    ob.VariantNotFoundException = VariantNotFoundException
    pid = types.ModuleType("obgraph.position_id")
    pid.PositionId = PositionId
    v2n = types.ModuleType("obgraph.variant_to_nodes")
    v2n.VariantToNodes = VariantToNodes
    ob.position_id = pid
    ob.variant_to_nodes = v2n

    bio = types.ModuleType("Bio")
    bio_seq = types.ModuleType("Bio.Seq")
    bio_seq.Seq = _Seq
    bio.Seq = bio_seq

    nps = types.ModuleType("npstructures")
    nps.HashTable = containers.HashTable
    nps.Counter = containers.Counter
    nps_ht = types.ModuleType("npstructures.hashtable")
    nps_ht.HashTable = containers.HashTable
    nps.hashtable = nps_ht

    for name, mod in (("obgraph", ob), ("obgraph.position_id", pid),
                      ("obgraph.variant_to_nodes", v2n), ("Bio", bio),
                      ("Bio.Seq", bio_seq), ("npstructures", nps),
                      ("npstructures.hashtable", nps_ht)):
        sys.modules.setdefault(name, mod)


def load_reference():
    """Import and return the reference ``graph_kmer_index`` package."""
    if "graph_kmer_index" in sys.modules:
        return sys.modules["graph_kmer_index"]
    _install_stubs()
    d = tempfile.mkdtemp(prefix="gki_ref_")
    pkg = os.path.join(d, "graph_kmer_index")
    os.makedirs(pkg)
    for mod in _MODULES:
        os.symlink(os.path.join(REF, "graph_kmer_index", mod),
                   os.path.join(pkg, mod))
    # the reference's bionumpy_wrapper shells out to the external
    # bionumpy package (unavailable); back it with our own window-hash
    # kernel, which is bit-equal (tests/test_hashing.py) — this lets
    # ref.structural_variants run its own sampling algorithm unmodified
    with open(os.path.join(pkg, "bionumpy_wrapper.py"), "w") as f:
        f.write("from graph_kmer_index_tpu.bionumpy_wrapper "
                "import bionumpy_hash\n")
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(_INIT)
    sys.path.insert(0, d)
    import graph_kmer_index
    return graph_kmer_index


if __name__ == "__main__":
    ref = load_reference()
    print("reference loaded:", ref.__file__)
