"""Collision-free k-mer indexes — the central lookup structures.

Layout (identical on disk to the reference, collision_free_kmer_index.py
:163-490, so files round-trip): rows sorted by ``hash = kmer % modulo``;
``_hashes_to_index[modulo]`` = start row per bucket; ``_n_kmers[modulo]`` =
bucket size; rows carry (kmers, nodes, ref_offsets, frequencies,
allele_frequencies). Collisions are resolved at query time by comparing
the stored full kmer.

Build runs as sort + segment ops (device via ops.segment when large,
numpy otherwise); the per-unique-kmer Python loops of the reference
(set_frequencies, collision_free_kmer_index.py:267-293) are replaced by
vectorized segment reductions with identical results. Batched lookup
(the Cython ``CythonKmerIndex.get`` / external kmer_mapper hot path) is
ops.lookup on device.
"""
from __future__ import annotations

import logging
import time

import numpy as np

from ..utils.hugepages import hp_empty, hp_zeros

from ..containers import Counter, MultiValueHashTable, HashTable
from ..flat_kmers import FlatKmers
from ..hashing import kmer_hash_to_sequence, sequence_to_kmer_hash, \
    kmer_hashes_to_reverse_complement_hash


def _is_device_array(a):
    """True for a JAX device array (duck-typed: no jax import needed)."""
    return not isinstance(a, np.ndarray) and hasattr(a, "devices")


def _host_reachable(a):
    """True when np.asarray(a) is cheap: host numpy, or a CPU-backend jax
    array (zero-copy view). A real-accelerator array must never be
    pulled host-side implicitly — the axon tunnel moves ~5 MB/s."""
    if isinstance(a, np.ndarray):
        return True
    if _is_device_array(a):
        try:
            return all(d.platform == "cpu" for d in a.devices())
        except Exception:
            return False
    return True  # lists / memmaps: host data


def _build_modulo_layout(hashes, modulo, row_arrays):
    """Sort rows by bucket and scatter bucket starts/sizes.

    Same construction as reference collision_free_kmer_index.py:433-457
    (argsort + ediff1d segment boundaries), expressed once for all index
    variants."""
    sorting = np.argsort(hashes, kind="stable")
    # reorders + the modulo-sized tables go through hugepage-advised
    # buffers: at production modulo the two tables alone are ~5GB and
    # this host faults fresh 4KB pages at ~22 MB/s (utils/hugepages.py)
    def take(a):
        out = hp_empty(len(a), a.dtype)
        np.take(a, sorting, out=out)
        return out
    hashes = take(hashes)
    rows = [take(a) for a in row_arrays]
    # NB ediff1d on an EMPTY array still emits the to_begin element,
    # which would fabricate a bucket start at row 0 of a 0-row table
    diffs = (np.ediff1d(hashes, to_begin=hashes.dtype.type(1))
             if len(hashes) else np.zeros(0, np.int64))
    starts = np.nonzero(diffs)[0]
    unique_hashes = hashes[starts].astype(np.int64)
    # int32 row starts whenever they fit (always, in practice): the
    # modulo-sized table is the build's dominant allocation and this
    # host provisions fresh pages at ~22 MB/s — an int64 build plus a
    # downcast copy would cost 3x the footprint for nothing
    idx_dtype = np.int32 if len(hashes) < 2**31 else np.int64
    # populate=True: the bucket scatters touch ~every 2MB page of the
    # tables in random order; lazily-faulted huge pages cost ~27ms each
    # under heap fragmentation (utils/hugepages.py) vs one bulk populate
    lookup = hp_zeros(modulo, idx_dtype, populate=True)
    lookup[unique_hashes] = starts
    n_entries = np.ediff1d(starts, to_end=len(hashes) - starts[-1]) \
        if len(starts) else np.zeros(0, dtype=np.int64)
    n_kmers = hp_zeros(modulo, np.uint32, populate=True)
    n_kmers[unique_hashes] = n_entries
    return lookup, n_kmers, rows, sorting


def _frequencies_by_distinct_ref_offsets(kmers_sorted, ref_offsets_sorted):
    """frequency[row] = number of DISTINCT ref offsets among rows with the
    same kmer (reference set_frequencies semantics,
    collision_free_kmer_index.py:267-293), vectorized: lexsort by
    (kmer, ref_offset), count unique pairs per kmer segment."""
    n = len(kmers_sorted)
    if n == 0:
        return np.zeros(0, dtype=np.uint16)
    order = np.lexsort((ref_offsets_sorted, kmers_sorted))
    km = kmers_sorted[order]
    ro = ref_offsets_sorted[order]
    new_kmer = np.ediff1d(km, to_begin=km.dtype.type(1)) != 0
    new_pair = new_kmer | (np.ediff1d(ro, to_begin=ro.dtype.type(1)) != 0)
    # distinct pairs per kmer segment
    seg_id = np.cumsum(new_kmer) - 1
    counts = np.bincount(seg_id, weights=new_pair.astype(np.int64)).astype(np.int64)
    freqs = np.zeros(n, dtype=np.uint16)
    freqs[order] = counts[seg_id]
    return freqs


class CollisionFreeKmerIndex:
    properties = {
        "_hashes_to_index", "_n_kmers", "_nodes", "_ref_offsets", "_kmers",
        "_modulo", "_frequencies", "_allele_frequencies",
    }

    def __init__(self, _hashes_to_index=None, _n_kmers=None, _nodes=None,
                 _ref_offsets=None, _kmers=None, _modulo=452930477,
                 _frequencies=None, _allele_frequencies=None):
        self._hashes_to_index = _hashes_to_index
        self._n_kmers = _n_kmers
        self._nodes = _nodes
        self._ref_offsets = _ref_offsets
        self._kmers = _kmers
        self._modulo = int(_modulo)
        self._frequencies = 0 if _frequencies is None else _frequencies
        self._allele_frequencies = _allele_frequencies
        self._device_index = None

    # -- construction -----------------------------------------------------

    # above this row count the sort/scatter build runs on the accelerator
    DEVICE_BUILD_THRESHOLD = 1 << 22

    @classmethod
    def from_flat_kmers(cls, flat_kmers, modulo=452930477,
                        skip_frequencies=False, skip_singletons=False,
                        use_device=None):
        if skip_singletons:
            flat_kmers = flat_kmers.get_new_without_singletons()

        if _is_device_array(flat_kmers._hashes):
            # device-resident FlatKmers (e.g. find_kmers_parallel_device):
            # zero-copy into the device build — no host round-trip
            import jax.numpy as jnp
            kmers = jnp.asarray(flat_kmers._hashes, dtype=jnp.uint64)
            row_arrays = [kmers, jnp.asarray(flat_kmers._nodes),
                          jnp.asarray(flat_kmers._ref_offsets),
                          jnp.asarray(flat_kmers._allele_frequencies)]
            if use_device is None:
                use_device = True
        else:
            kmers = np.asarray(flat_kmers._hashes, dtype=np.uint64)
            row_arrays = [kmers, np.asarray(flat_kmers._nodes),
                          np.asarray(flat_kmers._ref_offsets),
                          np.asarray(flat_kmers._allele_frequencies)]
        if use_device is None:
            # the modulo-sized bucket tables dominate build cost; above a
            # few million buckets they should be built (and stay) in HBM
            use_device = (len(kmers) >= cls.DEVICE_BUILD_THRESHOLD
                          or modulo >= (1 << 24))
        if use_device:
            from ..ops.build import build_modulo_layout_device
            lookup, n_kmers, rows, _ = build_modulo_layout_device(
                kmers, modulo, row_arrays)
        else:
            hashes = kmers % np.uint64(modulo)
            lookup, n_kmers, rows, _ = _build_modulo_layout(
                hashes, modulo, row_arrays)
        kmers_s, nodes_s, ref_offsets_s, af_s = rows

        obj = cls(lookup, n_kmers, nodes_s, ref_offsets_s,
                  kmers_s, modulo, _allele_frequencies=af_s)
        obj.set_frequencies(skip_frequencies, use_device=use_device)
        if skip_singletons:
            obj._frequencies += 1
        return obj

    def set_frequencies(self, skip=False, use_device=False):
        self._invalidate_query_caches()
        self._frequencies = np.zeros(len(self._kmers), dtype=np.uint16)
        if skip:
            return
        ro = self._ref_offsets
        # bucket-ordered native fast path: rows are stored bucket-sorted
        # (class invariant, and the C++ pass VERIFIES while scanning —
        # None on violation falls through to the sorting paths below).
        # Equal kmers always share a bucket, so this is a parallel
        # linear pass with tiny per-bucket sorts instead of a global
        # n-log-n sort (~400 s single-threaded XLA-CPU sort at 241 M
        # rows). Taken only when the rows are host-reachable without a
        # device fetch; on a real accelerator the device sort stays.
        from .. import native
        if (native.available() and int(self._modulo) > 0
                and np.ndim(ro) == 1
                and np.shape(ro)[0] == len(self._kmers)
                and _host_reachable(self._kmers) and _host_reachable(ro)):
            freqs = native.frequencies_bucket_ordered(
                np.asarray(self._kmers), np.asarray(ro), self._modulo)
            if freqs is not None:
                self._frequencies = freqs
                return
        if use_device:
            from ..ops.build import frequencies_device
            self._frequencies = frequencies_device(self._kmers,
                                                   self._ref_offsets)
        else:
            self._frequencies = _frequencies_by_distinct_ref_offsets(
                self._kmers, self._ref_offsets)

    def set_frequencies_using_other_index(self, other, multiplier=1,
                                          min_frequency=1):
        """(reference collision_free_kmer_index.py:252-265, vectorized)"""
        self._invalidate_query_caches()
        unique = np.unique(self._kmers)
        freqs = np.asarray(other.get_frequencies(unique), dtype=np.int64)
        idx = np.searchsorted(unique, self._kmers)
        self._frequencies = np.maximum(
            min_frequency, freqs[idx] * multiplier).astype(
                np.asarray(self._frequencies).dtype
                if np.ndim(self._frequencies) else np.uint16)

    def set_allele_frequencies(self, frequencies):
        pass  # reference no-op (collision_free_kmer_index.py:234-235)

    # -- maintenance --------------------------------------------------------

    def _invalidate_query_caches(self):
        """Drop cached device/native views after any table mutation so
        later batched queries never read stale frequency/dtype arrays."""
        self._device_index = None
        self._native_index = None

    def copy(self):
        return CollisionFreeKmerIndex(
            self._hashes_to_index.copy(), self._n_kmers.copy(),
            self._nodes.copy(), self._ref_offsets.copy(), self._kmers.copy(),
            self._modulo,
            self._frequencies.copy() if np.ndim(self._frequencies) else self._frequencies,
            self._allele_frequencies.copy())

    def clear(self):
        self._hashes_to_index = None
        self._n_kmers = None
        self._nodes = None
        self._kmers = None
        self._modulo = None

    def max_node_id(self):
        return int(np.max(self._nodes))

    def convert_to_int32(self):
        self._invalidate_query_caches()
        self._hashes_to_index = self._hashes_to_index.astype(np.int32)
        self._nodes = self._nodes.astype(np.int32)
        self._n_kmers = self._n_kmers.astype(np.int32)
        self._modulo = np.uint64(self._modulo)

    def remove_ref_offsets(self):
        self._invalidate_query_caches()
        self._ref_offsets = np.array([0])

    def remove_frequencies(self):
        self._invalidate_query_caches()
        self._frequencies = np.array([0])

    def get_kmers(self):
        return self._kmers

    # -- scalar queries (API parity) ------------------------------------------

    def get(self, kmer, max_hits=10):
        h = int(kmer) % self._modulo
        position = int(self._hashes_to_index[h])
        n_hits = int(self._n_kmers[h])
        hit_positions = np.where(
            self._kmers[position:position + n_hits] == kmer)[0]
        frequencies = self._frequencies[hit_positions + position]
        allele_frequencies = self._allele_frequencies[hit_positions + position]
        if len(hit_positions) == 0 or frequencies[0] > max_hits:
            return None, None, None, None
        return (self._nodes[hit_positions + position],
                self._ref_offsets[hit_positions + position],
                frequencies, allele_frequencies)

    def __contains__(self, item):
        return self.get(int(item), 100000000000)[0] is not None

    def get_nodes(self, kmer, max_hits=10):
        return self.get(kmer, max_hits)[0]

    def get_grouped_nodes(self, kmer, max_hits=10):
        hits = self.get(kmer, max_hits)
        if hits[0] is None:
            return None
        nodes, ref_offsets = hits[0], hits[1]
        sorting = np.argsort(ref_offsets, kind="stable")
        ref_offsets = ref_offsets[sorting]
        nodes = nodes[sorting]
        _, starts = np.unique(ref_offsets, return_index=True)
        bounds = list(starts) + [len(ref_offsets)]
        return [nodes[a:b] for a, b in zip(bounds[:-1], bounds[1:])]

    def get_frequency(self, kmer, include_reverse_complement=True, k=31):
        hits = self.get(kmer, max_hits=10**15)
        f = 0 if hits[0] is None else int(hits[2][0])
        if include_reverse_complement:
            rev = int(kmer_hashes_to_reverse_complement_hash(
                np.array([kmer], dtype=np.uint64), k)[0])
            rhits = self.get(rev, max_hits=10**15)
            if rhits[0] is not None:
                f += int(rhits[2][0])
        return f

    def get_frequencies(self, kmers, include_reverse_complement=True, k=31):
        """Vectorized get_frequency over a kmer batch (same semantics:
        first-hit frequency, plus the revcomp's, computed with the same
        k=31 default quirk as the scalar path). Native C++ lookup when
        available, scalar fallback otherwise."""
        kmers = np.asarray(kmers, dtype=np.uint64)
        nk = self._native()
        if nk is None or len(kmers) == 0:
            return np.array([self.get_frequency(
                int(h), include_reverse_complement, k) for h in kmers],
                dtype=np.int64)

        big = 1 << 60

        def first_freqs(qs):
            hits = nk.get(qs, hit_cap=big, freq_cap=big)
            out = np.zeros(len(qs), dtype=np.int64)
            qi = hits[2].astype(np.int64)
            # reversed write: the FIRST hit per query wins
            out[qi[::-1]] = hits[3][::-1].astype(np.int64)
            return out

        freqs = first_freqs(kmers)
        if include_reverse_complement:
            freqs = freqs + first_freqs(
                kmer_hashes_to_reverse_complement_hash(kmers, k))
        return freqs

    # below this batch size the scalar loop beats a device dispatch
    _BATCH_QUERY_THRESHOLD = 32

    def get_nodes_and_ref_offsets_from_multiple_kmers(self, kmers, max_hits=10):
        """Batched ``get`` over many kmers (reference
        collision_free_kmer_index.py:354-376). Backed by the device
        ``get_batched`` kernel for real batches; python-get semantics are
        preserved exactly (a query is dropped entirely when its FIRST
        hit's frequency exceeds ``max_hits``; no caps on other rows)."""
        kmers = np.asarray(kmers, dtype=np.uint64)
        if len(kmers) < self._BATCH_QUERY_THRESHOLD:
            return self._get_from_multiple_kmers_scalar(kmers, max_hits)
        big = (1 << 31) - 1  # caps are device int32; this disables them
        out = self._device().get_batched(kmers, hit_cap=big,
                                         frequency_cap=big)
        nodes, offs, qi, freqs = (out[0], out[1], out[2].astype(np.int64),
                                  out[3])
        if len(qi) == 0:
            return (np.array([]),) * 4
        # rows arrive grouped by query in query order; first row of each
        # group carries the frequency that gates the whole query
        first = np.ediff1d(qi, to_begin=1) != 0
        keep_query = np.zeros(len(kmers), dtype=bool)
        keep_query[qi[first]] = freqs[first] <= max_hits
        keep = keep_query[qi]
        freq_dtype = (np.asarray(self._frequencies).dtype
                      if np.ndim(self._frequencies) else np.uint16)
        return (nodes[keep].astype(np.asarray(self._nodes).dtype),
                offs[keep].astype(np.asarray(self._ref_offsets).dtype),
                qi[keep].astype(np.float64),
                freqs[keep].astype(freq_dtype))

    def _get_from_multiple_kmers_scalar(self, kmers, max_hits):
        all_nodes, all_offsets, all_read_offsets, all_freqs = [], [], [], []
        for i, h in enumerate(kmers):
            nodes, offs, freqs, _ = self.get(h, max_hits=max_hits)
            if nodes is None:
                continue
            all_nodes.append(nodes)
            all_offsets.append(offs)
            all_read_offsets.append(np.zeros(len(nodes)) + i)
            all_freqs.append(freqs)
        if not all_nodes:
            return (np.array([]),) * 4
        return (np.concatenate(all_nodes), np.concatenate(all_offsets),
                np.concatenate(all_read_offsets), np.concatenate(all_freqs))

    def get_nodes_from_multiple_kmers(self, kmers, max_hits=10):
        kmers = np.asarray(kmers, dtype=np.uint64)
        if len(kmers) >= self._BATCH_QUERY_THRESHOLD:
            return self.get_nodes_and_ref_offsets_from_multiple_kmers(
                kmers, max_hits=max_hits)[0]
        out = [self.get(h, max_hits=max_hits)[0] for h in kmers]
        out = [o for o in out if o is not None]
        return np.concatenate(out) if out else np.array([])

    # -- batched device queries -------------------------------------------------

    def _device(self):
        if self._device_index is None:
            from ..ops.lookup import DeviceKmerIndex
            self._device_index = DeviceKmerIndex.from_host_index(self)
        return self._device_index

    def _native(self):
        if getattr(self, "_native_index", None) is None:
            from .native_index import NativeKmerIndex
            self._native_index = (NativeKmerIndex(self)
                                  if NativeKmerIndex.available() else False)
        return self._native_index or None

    def map_kmers(self, kmers, n_nodes, backend="device"):
        """kmers -> node hit counts (replaces external
        kmer_mapper.map_kmers_to_graph_index, used in the KAGE mapping hot
        loop; reference collision_free_kmer_index.py:210-212). ``backend``:
        'device' (TPU kernel) or 'native' (host C++)."""
        from ..read_kmers import DeviceReadKmers
        if isinstance(kmers, DeviceReadKmers):
            if backend == "native" and self._native() is not None:
                return self._native().map_kmers(kmers.to_numpy(), n_nodes)
            return self._device().map_read_kmers(kmers, n_nodes)
        kmers = np.asarray(kmers, dtype=np.uint64)
        if backend == "native" and self._native() is not None:
            return self._native().map_kmers(kmers, n_nodes)
        return self._device().map_kmers(kmers, n_nodes)

    def has_kmers(self, kmers, backend="device"):
        from ..read_kmers import DeviceReadKmers
        if isinstance(kmers, DeviceReadKmers):
            if backend == "native" and self._native() is not None:
                return self._native().has_kmers(kmers.to_numpy())
            return self._device().has_read_kmers(kmers)
        kmers = np.asarray(kmers, dtype=np.uint64)
        if backend == "native" and self._native() is not None:
            return self._native().has_kmers(kmers)
        return self._device().has_kmers(kmers)

    def has_kmers_parallel(self, kmers, n_threads):
        """Sharded membership query; on TPU the 'threads' are mesh devices
        (reference collision_free_kmer_index.py:222-232 forked processes)."""
        from ..parallel.sharded import has_kmers_sharded
        return has_kmers_sharded(self, np.asarray(kmers, dtype=np.uint64),
                                 n_shards=n_threads)

    def get_batched(self, kmers, max_hits=10):
        """Batched ``get``: (5, n_hits) matrix [node, ref_offset,
        query_index, frequency, 1000*allele_frequency] — the
        CythonKmerIndex.get contract (cython_kmer_index.pyx:101-106),
        EXCEPT the Cython path's bucket-0 skip (pyx:60-61): bucket-0
        kmers are looked up like any other, matching this class's python
        ``get`` (deliberate divergence, see PARITY.md)."""
        return self._device().get_batched(
            np.asarray(kmers, dtype=np.uint64), max_hits=max_hits)

    # -- serialization ------------------------------------------------------------

    def to_file(self, file_name):
        np.savez(file_name, hashes_to_index=self._hashes_to_index,
                 n_kmers=self._n_kmers, nodes=self._nodes,
                 ref_offsets=self._ref_offsets, kmers=self._kmers,
                 modulo=self._modulo, frequencies=self._frequencies,
                 allele_frequencies=self._allele_frequencies)

    @classmethod
    def from_file(cls, file_name):
        t = time.perf_counter()
        try:
            data = np.load(str(file_name) + ".npz")
        except FileNotFoundError:
            data = np.load(file_name)
        af = (data["allele_frequencies"] if "allele_frequencies" in data
              else np.zeros(len(data["ref_offsets"])))
        logging.info("Read kmer index in %.4fs", time.perf_counter() - t)
        return cls(data["hashes_to_index"], data["n_kmers"], data["nodes"],
                   data["ref_offsets"], data["kmers"], data["modulo"],
                   data["frequencies"], af)

    def convert_kmers_to_complement(self, k=31, skip_frequencies=True):
        from ..hashing import kmer_hashes_to_complement_hashes
        chunks = np.array_split(self._kmers,
                                max(1, len(self._kmers) // 10000000))
        new_kmers = np.concatenate(
            [kmer_hashes_to_complement_hashes(c, k) for c in chunks])
        return CollisionFreeKmerIndex.from_flat_kmers(
            FlatKmers(new_kmers, self._nodes, self._ref_offsets,
                      self._allele_frequencies),
            modulo=self._modulo, skip_frequencies=skip_frequencies)


class MinimalKmerIndex:
    """Modulo layout minus ref_offsets/frequencies (reference
    collision_free_kmer_index.py:44-106)."""

    def __init__(self, hashes_to_index, n_kmers, nodes, kmers, modulo):
        self._hashes_to_index = hashes_to_index.astype(np.int64)
        self._n_kmers = n_kmers.astype(np.uint32)
        self._nodes = nodes.astype(np.uint32)
        self._kmers = kmers
        self._modulo = np.int64(modulo)

    def max_node_id(self):
        return int(np.max(self._nodes))

    def to_file(self, file_name):
        np.savez(file_name, hashes_to_index=self._hashes_to_index,
                 n_kmers=self._n_kmers, nodes=self._nodes, kmers=self._kmers,
                 modulo=self._modulo)

    @classmethod
    def from_file(cls, file_name):
        try:
            data = np.load(str(file_name) + ".npz")
        except FileNotFoundError:
            data = np.load(file_name)
        return cls(data["hashes_to_index"], data["n_kmers"], data["nodes"],
                   data["kmers"], data["modulo"])

    @classmethod
    def from_flat_kmers(cls, flat_kmers, modulo=452930477):
        kmers = np.asarray(flat_kmers._hashes, dtype=np.uint64)
        hashes = kmers % np.uint64(modulo)
        lookup, n_kmers, rows, _ = _build_modulo_layout(
            hashes, modulo, [kmers, np.asarray(flat_kmers._nodes)])
        kmers_s, nodes_s = rows
        return cls(lookup, n_kmers, nodes_s, kmers_s, modulo)


class KmerIndex2:
    """kmer -> {nodes, start_nodes, start_offsets, allele_frequencies}
    multi-map (reference collision_free_kmer_index.py:110-158); frequency =
    number of unique (start_node, start_offset) pairs per kmer."""

    def __init__(self, data, frequencies=None):
        self._data = data
        self._frequencies = frequencies

    def get_start_nodes(self, kmer):
        return self._data[kmer]["start_nodes"]

    def get_start_offsets(self, kmer):
        return self._data[kmer]["start_offsets"]

    def get_nodes(self, kmer):
        return self._data[kmer]["nodes"]

    def get_all_kmers(self):
        return self._data.get_all_keys()

    def get_kmer_frequency(self, kmer):
        assert self._frequencies is not None, "Frequencies not set"
        return self._frequencies[kmer]

    @classmethod
    def from_flat_kmers(cls, flat_kmers, modulo=None, skip_frequencies=False):
        table = MultiValueHashTable.from_keys_and_values(
            np.asarray(flat_kmers._hashes),
            {"nodes": np.asarray(flat_kmers._nodes),
             "start_nodes": np.asarray(flat_kmers._start_nodes),
             "start_offsets": np.asarray(flat_kmers._start_offsets),
             "allele_frequencies": np.asarray(flat_kmers._allele_frequencies)},
            mod=modulo)
        index = cls(table)
        if not skip_frequencies:
            index.count_unique_kmer_occurences()
        return index

    def count_unique_kmer_occurences(self):
        """Vectorized: distinct (start_node, start_offset) pairs per kmer.
        NB keys must come from row_keys() — get_all_keys() returns the
        hash-sorted layout, which would pair scrambled rows against the
        insertion-ordered value arrays and miscount."""
        kmers = self._data.row_keys()
        if len(np.asarray(kmers)) == 0:
            # ediff1d on empty arrays still emits to_begin: guard like
            # _build_modulo_layout
            self._frequencies = HashTable(np.zeros(0, np.int64),
                                          np.zeros(0, np.int64))
            return
        sn = self._data._values["start_nodes"]
        so = self._data._values["start_offsets"]
        order = np.lexsort((np.asarray(so), np.asarray(sn), np.asarray(kmers)))
        km, s1, s2 = (np.asarray(kmers)[order], np.asarray(sn)[order],
                      np.asarray(so)[order])
        new_kmer = np.ediff1d(km, to_begin=km.dtype.type(1)) != 0
        new_pair = new_kmer | (np.ediff1d(s1, to_begin=s1.dtype.type(1)) != 0) | \
            (np.ediff1d(s2, to_begin=s2.dtype.type(1)) != 0)
        seg = np.cumsum(new_kmer) - 1
        counts = np.bincount(seg, weights=new_pair.astype(np.int64)).astype(
            np.int64)
        self._frequencies = HashTable(km[new_kmer], counts)


class CounterKmerIndex:
    """Counter over index kmers; get_node_counts = bincount(nodes,
    counter[kmers]) — the genotyping node-count kernel (reference
    collision_free_kmer_index.py:14-40). Device path:
    ops.lookup.node_counts / parallel.sharded."""

    def __init__(self, kmers, nodes, counter):
        self.kmers = kmers
        self.nodes = nodes
        self.counter = counter

    @classmethod
    def from_kmer_index(cls, kmer_index, modulo=None):
        kmers = kmer_index._kmers.astype(np.int64)
        nodes = kmer_index._nodes
        unique_kmers = np.unique(kmers)
        counter = Counter(unique_kmers, 0,
                          mod=modulo if modulo else kmer_index._modulo,
                          value_dtype=np.uint16)
        return cls(kmers, nodes, counter)

    def count_kmers(self, kmers, update_counter=True):
        if not update_counter:
            self.counter._counts[:] = 0
        self.counter.count(np.asarray(kmers).astype(np.int64))

    def get_node_counts(self, min_nodes=0):
        return np.bincount(self.nodes, self.counter[self.kmers],
                           minlength=min_nodes)
