"""Host-side native (C++) lookup front-end — API equivalent of the
reference's CythonKmerIndex (cython_kmer_index.pyx:22-109) and of the
external ``kmer_mapper`` package's entry points
(map_kmers_to_graph_index / in_graph_index, used at reference
collision_free_kmer_index.py:210-232).

The TPU device kernel (ops.lookup.DeviceKmerIndex) is the production
path; this class serves host-resident pipelines and acts as the exact
behavioral spec for the device kernel (tests assert equality).
"""
from __future__ import annotations

import numpy as np

from .. import native


class NativeKmerIndex:
    """Wraps a CollisionFreeKmerIndex's arrays for native batched lookup."""

    def __init__(self, index):
        self._index = index
        freqs = index._frequencies
        n = len(index._kmers)
        if np.ndim(freqs) == 0 or len(np.atleast_1d(freqs)) != n:
            freqs = np.zeros(n, dtype=np.uint16)
        af = index._allele_frequencies
        if af is None or np.ndim(af) == 0 or len(np.atleast_1d(af)) != n:
            af = np.zeros(n, dtype=np.float32)
        self.table_kmers = np.ascontiguousarray(index._kmers, np.uint64)
        self.table_nodes = np.ascontiguousarray(index._nodes, np.uint32)
        self.table_ref_offsets = np.ascontiguousarray(
            np.asarray(index._ref_offsets).astype(np.uint64))
        self.table_frequencies = np.ascontiguousarray(freqs, np.uint16)
        self.table_allele_frequencies = np.ascontiguousarray(af, np.float32)
        self.starts_tbl = np.ascontiguousarray(index._hashes_to_index,
                                               np.int64)
        self.sizes_tbl = np.ascontiguousarray(index._n_kmers, np.uint32)
        self.modulo = int(index._modulo)

    @staticmethod
    def available() -> bool:
        return native.available()

    def get(self, kmers, hit_cap=10000, freq_cap=20):
        """(5, n_hits) uint64 [node, ref_offset, query_index, frequency,
        1000*allele_frequency] (cython_kmer_index.pyx:101-106)."""
        return native.bucket_lookup(
            kmers, self.table_kmers, self.table_nodes,
            self.table_ref_offsets, self.table_frequencies,
            self.table_allele_frequencies, self.starts_tbl, self.sizes_tbl,
            self.modulo, hit_cap=hit_cap, freq_cap=freq_cap)

    def map_kmers(self, kmers, n_nodes):
        return native.map_kmers(kmers, self.table_kmers, self.table_nodes,
                                self.starts_tbl, self.sizes_tbl, self.modulo,
                                int(n_nodes))

    def has_kmers(self, kmers):
        return native.has_kmers(kmers, self.table_kmers, self.starts_tbl,
                                self.sizes_tbl, self.modulo)
