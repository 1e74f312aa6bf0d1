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
        ro = np.asarray(index._ref_offsets)
        if np.ndim(ro) == 0 or len(ro) != n:
            # remove_ref_offsets() leaves a 1-element placeholder; the
            # C++ kernel would read past it (UB) — substitute zeros like
            # the frequency guard above (the reference python get()
            # raises IndexError here; map/has paths never read offsets)
            ro = np.zeros(n, dtype=np.uint64)
        self.table_kmers = np.ascontiguousarray(index._kmers, np.uint64)
        self.table_nodes = np.ascontiguousarray(index._nodes, np.uint32)
        self.table_ref_offsets = np.ascontiguousarray(ro.astype(np.uint64))
        self.table_frequencies = np.ascontiguousarray(freqs, np.uint16)
        self.table_allele_frequencies = np.ascontiguousarray(af, np.float32)
        self.starts_tbl = np.ascontiguousarray(index._hashes_to_index,
                                               np.int64)
        self.sizes_tbl = np.ascontiguousarray(index._n_kmers, np.uint32)
        self.modulo = int(index._modulo)

    @staticmethod
    def available() -> bool:
        return native.available()

    def _table_ptrs(self):
        """ctypes pointers for the (immutable) table arrays, built once —
        per-call marshaling otherwise dominates small-batch lookups."""
        if getattr(self, "_ptrs", None) is None:
            import ctypes
            p = native._ptr
            self._ptrs = (
                p(self.table_kmers, ctypes.c_uint64),
                p(self.table_nodes, ctypes.c_uint32),
                p(self.table_ref_offsets, ctypes.c_uint64),
                p(self.table_frequencies, ctypes.c_uint16),
                p(self.table_allele_frequencies, ctypes.c_float),
                p(self.starts_tbl, ctypes.c_int64),
                p(self.sizes_tbl, ctypes.c_uint32),
            )
        return self._ptrs

    def get(self, kmers, hit_cap=10000, freq_cap=20):
        """(5, n_hits) uint64 [node, ref_offset, query_index, frequency,
        1000*allele_frequency] (cython_kmer_index.pyx:101-106)."""
        import ctypes
        lib = native.get_lib()
        if lib is None:
            return None
        kmers = np.ascontiguousarray(kmers, dtype=np.uint64)
        args = (native._ptr(kmers, ctypes.c_uint64), len(kmers),
                *self._table_ptrs(), int(self.modulo), int(hit_cap),
                int(freq_cap))
        n_hits = lib.gki_bucket_lookup(*args, 1, None, 0)
        out = np.zeros((5, max(1, n_hits)), dtype=np.uint64)
        if n_hits > 0:
            lib.gki_bucket_lookup(*args, 0,
                                  native._ptr(out, ctypes.c_uint64), n_hits)
        return out[:, :n_hits]

    # host records cost 64B/row; above this budget keep the bucket chase
    PACKED_BYTE_BUDGET = 16 << 30

    def _packed(self):
        """Host packed-record tables (same layout as ops/lookup.py): one
        cache miss per query plus a prefetch pipeline, ~2-3x the
        bucket-pointer chase."""
        if getattr(self, "_packed_np", None) is None:
            from ..ops.lookup import internal_modulo
            n = len(self.table_kmers)
            modulo2 = internal_modulo(n)
            if modulo2 * 32 > self.PACKED_BYTE_BUDGET:
                self._packed_np = False
            else:
                built = native.build_packed(self.table_kmers,
                                            self.table_nodes, modulo2)
                self._packed_np = (False if built is None
                                   else (*built, modulo2))
        return self._packed_np or None

    def map_kmers(self, kmers, n_nodes):
        p = self._packed()
        if p is not None:
            rec, rows_k, rows_n, modulo2 = p
            return native.packed_map_kmers(kmers, rec, rows_k, rows_n,
                                           modulo2, int(n_nodes))
        return native.map_kmers(kmers, self.table_kmers, self.table_nodes,
                                self.starts_tbl, self.sizes_tbl, self.modulo,
                                int(n_nodes))

    def has_kmers(self, kmers):
        p = self._packed()
        if p is not None:
            rec, rows_k, rows_n, modulo2 = p
            return native.packed_has_kmers(kmers, rec, rows_k, modulo2)
        return native.has_kmers(kmers, self.table_kmers, self.starts_tbl,
                                self.sizes_tbl, self.modulo)
