"""ReadKmers: per-read window hashing + FASTA streaming (reference
read_kmers.py:9-89). The hashing itself is the sliding-window kernel
(hashing.sliding_window_hashes host / ops.encode.sliding_hashes device);
this module is the read-streaming front end.
"""
from __future__ import annotations

import itertools
import logging

import numpy as np

from .hashing import (letter_sequence_to_numeric, sliding_window_hashes,
                      kmer_to_hash_fast, power_array)

_COMP = str.maketrans("acgtACGT", "tgcaTGCA")


def reverse_complement_string(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def _iter_record_blocks(path: str, block_bytes: int):
    """Yield whole-record byte blocks of a FASTA/FASTQ file, each
    ~<= ``block_bytes`` (a single oversize record may exceed it).

    Blocks cut only at record headers so each block parses standalone.
    The line state machine mirrors ReadKmers._encode_block exactly:
    blank lines do NOT consume the FASTQ quality state, and a quality
    line may begin with '>'/'@'/'+' without being a header."""
    buf = bytearray()
    skip_quality = False
    with open(path, "rb") as f:
        for line in f:
            s = line.strip()
            if s:
                if skip_quality:
                    skip_quality = False
                elif s.startswith(b"+"):
                    skip_quality = True
                elif s[:1] in (b">", b"@") and len(buf) >= block_bytes:
                    yield bytes(buf)
                    buf = bytearray()
            buf += line
    if buf:
        yield bytes(buf)


class DeviceReadKmers:
    """Device-resident read kmers: segments of (hashes u64 jax array,
    n_valid) with the valid kmers compacted to the front of each segment.

    Produced by ``ReadKmers.hash_fasta_file(..., keep_on_device=True)``;
    consumed zero-copy by ``CollisionFreeKmerIndex.map_kmers`` /
    ``has_kmers`` so the full query batch never crosses the host<->device
    link (~8 bytes/kmer each way otherwise — the dominant cost of the
    read-mapping pipeline on slow links). ``to_numpy()`` materializes the
    same array the host path returns.
    """

    def __init__(self, segments, k):
        self.segments = segments  # list[(jax.Array, int n_valid)]
        self.k = k

    def __len__(self):
        return sum(nv for _, nv in self.segments)

    def to_numpy(self) -> np.ndarray:
        if not self.segments:
            return np.zeros(0, dtype=np.uint64)
        return np.concatenate(
            [np.asarray(a[:nv]) for a, nv in self.segments])


class ReadKmers:
    # device read-hashing processes the concatenated read tape in
    # segments of at most this many bases (~13 bytes/base of HBM
    # transients through hash + compaction sort)
    SEGMENT_BASES = 1 << 28

    def __init__(self, kmers):
        self.kmers = kmers
        self._power_vector = None

    @classmethod
    def from_fasta_file(cls, fasta_file_name, k, small_k=None, smallest_k=8):
        with open(fasta_file_name) as f:
            lines = [l.strip() for l in f.readlines() if not l.startswith(">")]
        logging.info("Number of lines: %d", len(lines))
        power_vector = power_array(k)
        if small_k is None:
            kmers = itertools.chain(
                (ReadKmers.get_kmers_from_read_dynamic(line, power_vector)
                 for line in lines),
                (ReadKmers.get_kmers_from_read_dynamic(
                    reverse_complement_string(line), power_vector)
                 for line in lines))
        else:
            pv_small = power_array(small_k)
            pv_smallest = power_array(smallest_k)
            kmers = zip(
                (itertools.chain(
                    ReadKmers.get_kmers_from_read_dynamic(line, power_vector),
                    ReadKmers.get_kmers_from_read_dynamic(
                        reverse_complement_string(line), power_vector))
                 for line in lines),
                (itertools.chain(
                    ReadKmers.get_kmers_from_read_dynamic(line, pv_small),
                    ReadKmers.get_kmers_from_read_dynamic(
                        reverse_complement_string(line), pv_small))
                 for line in lines),
                (itertools.chain(
                    ReadKmers.get_kmers_from_read_dynamic(line, pv_smallest),
                    ReadKmers.get_kmers_from_read_dynamic(
                        reverse_complement_string(line), pv_smallest))
                 for line in lines))
        return cls(kmers)

    @classmethod
    def from_list_of_string_kmers(cls, string_kmers):
        kmers = [
            [kmer_to_hash_fast(letter_sequence_to_numeric(k), len(k))
             for k in read_kmers]
            for read_kmers in string_kmers]
        return cls(kmers)

    @staticmethod
    def get_kmers_from_read(read, k):
        return [
            kmer_to_hash_fast(letter_sequence_to_numeric(read[i:i + k]), k)
            for i in range(len(read) - k)]

    @staticmethod
    def get_kmers_from_read_dynamic(read, power_vector):
        """All window hashes of a read; ``power_vector`` carries k
        (reference read_kmers.py:68-70 np.convolve equivalent)."""
        k = len(power_vector)
        numeric = letter_sequence_to_numeric(read)
        return sliding_window_hashes(numeric, k)

    # -- batched production streaming (TPU path) -----------------------------

    # hash_fasta_file processes the file in whole-record blocks of about
    # this many bytes: host memory stays bounded (~2 blocks of text +
    # tape) regardless of read-set size. 128 MB measured as fast as or
    # faster than 1 GB blocks on this host (cache locality of the
    # n-sized passes) while bounding memory 8x tighter.
    BLOCK_BYTES = 1 << 27

    @staticmethod
    def _encode_block(text: bytes):
        """(flat int8 tape, starts, lens) of one FASTA/FASTQ text block —
        native C++ parser when available, python fallback otherwise."""
        from . import native
        encoded = native.fasta_encode(text)
        if encoded is not None:
            return encoded
        lines = []
        skip_quality = False  # FASTQ: line after '+' is quality data
        for l in text.decode().splitlines():
            l = l.strip()
            if not l:
                continue
            if skip_quality:
                skip_quality = False
            elif l.startswith("+"):
                skip_quality = True
            elif not l.startswith((">", "@")):
                lines.append(l)
        arrays = [letter_sequence_to_numeric(l).astype(np.int8)
                  for l in lines]
        flat = (np.concatenate(arrays) if arrays
                else np.zeros(0, np.int8))
        starts = np.cumsum([0] + [len(a) for a in arrays[:-1]]) \
            if arrays else np.zeros(0, np.int64)
        lens = np.array([len(a) for a in arrays], dtype=np.int64)
        return flat, starts, lens

    @staticmethod
    def hash_fasta_file(fasta_file_name, k, include_reverse_complements=False,
                        use_device=None, keep_on_device=False,
                        block_bytes=None):
        """All window hashes of all reads in a FASTA/FASTQ file, flat, in
        read order — the production read-streaming front end. Parsing +
        2-bit encoding runs in the native C++ layer when available
        (native.fasta_encode); hashing runs through the sliding-window
        kernel over the concatenated read tape with cross-read windows
        masked out.

        The file streams in whole-record blocks of ~``block_bytes``
        (default BLOCK_BYTES = 1 GB), so host memory stays bounded at a
        couple of blocks however large the read set — files below one
        block behave exactly as a whole-file parse."""
        from .hashing import kmer_hashes_to_reverse_complement_hash

        block_bytes = block_bytes or ReadKmers.BLOCK_BYTES
        blocks = _iter_record_blocks(fasta_file_name, block_bytes)

        if keep_on_device:
            import jax.numpy as jnp
            from .ops.encode import read_tape_hashes, revcomp_hashes

            def ladder(m, base=1024):
                p = base
                while p < m:
                    p = -(-(p * 5) // (4 * base)) * base
                return p

            # bounded-lookahead pipeline: dispatch up to LOOKAHEAD
            # segments ahead of the nv scalar fetch, so host-side buffer
            # prep + the tape upload of segment i+1 overlap the device's
            # hash/compaction of segment i (the fetch is the only sync;
            # fetching eagerly serialized host and device end to end).
            # The lookahead bound caps pending input tapes in HBM.
            LOOKAHEAD = 2
            fw, rc = [], []
            pending: list = []

            def drain(limit):
                while len(pending) > limit:
                    hashes_p, nv_p, rc_p = pending.pop(0)
                    nv_i = int(nv_p)  # one scalar fetch per segment
                    fw.append((hashes_p, nv_i))
                    if rc_p is not None:
                        rc.append((rc_p, nv_i))

            seg_bound = ReadKmers.SEGMENT_BASES
            for text in blocks:
                flat, starts, lens = ReadKmers._encode_block(text)
                if len(flat) == 0:
                    continue
                # bound HBM: split the tape at read boundaries into
                # segments of <= SEGMENT_BASES (each costs ~13
                # bytes/base of HBM transients through hash + sort)
                ends_all = starts + lens
                cut_reads = [0]
                while True:
                    nxt = int(np.searchsorted(
                        ends_all, starts[cut_reads[-1]] + seg_bound,
                        side="right"))
                    nxt = max(nxt, cut_reads[-1] + 1)  # oversize read
                    if nxt >= len(starts):
                        break
                    cut_reads.append(nxt)
                cut_reads.append(len(starts))

                for r0, r1 in zip(cut_reads[:-1], cut_reads[1:]):
                    base = int(starts[r0])
                    seg_n = int(ends_all[r1 - 1]) - base
                    N = ladder(seg_n)
                    flatp = np.zeros(N, np.int8)
                    flatp[:seg_n] = flat[base:base + seg_n]
                    R = ladder(r1 - r0, 64)
                    sp = np.full(R, N, np.int32)
                    lp = np.zeros(R, np.int32)
                    sp[:r1 - r0] = starts[r0:r1] - base
                    lp[:r1 - r0] = lens[r0:r1]
                    hashes, nv = read_tape_hashes(
                        jnp.asarray(flatp), jnp.asarray(sp),
                        jnp.asarray(lp), seg_n, k)
                    rc_h = (revcomp_hashes(hashes, k)
                            if include_reverse_complements else None)
                    pending.append((hashes, nv, rc_h))
                    drain(LOOKAHEAD)
            drain(0)
            # host order is [all forward kmers, then all revcomps]
            return DeviceReadKmers(fw + rc, k)

        parts = []
        for text in blocks:
            flat, starts, lens = ReadKmers._encode_block(text)
            n = len(flat)
            if n == 0:
                continue
            ud = use_device if use_device is not None else n >= (1 << 20)
            if ud:
                import jax.numpy as jnp
                from .ops.encode import (combine_u32_pair,
                                         sliding_hashes_u32)
                # u32-lane ladder + one combine (u64 is emulated on TPU)
                all_hashes = np.asarray(combine_u32_pair(
                    *sliding_hashes_u32(
                        jnp.asarray(flat.astype(np.int32)), k)
                )).astype(np.uint64)
            else:
                all_hashes = np.concatenate(
                    [sliding_window_hashes(flat, k),
                     np.zeros(min(k - 1, n), dtype=np.uint64)])
            # valid windows: fully inside one read — the same two
            # n_reads-sized scatters + one cumsum the device kernel
            # uses (read_tape_hashes); the n-sized searchsorted this
            # replaces cost more than the hashing itself
            ends = (starts + lens).astype(np.int64)
            inv_start = np.maximum(starts.astype(np.int64),
                                   ends - (k - 1))
            d = np.zeros(n + 1, np.int32)
            np.add.at(d, inv_start, 1)
            np.add.at(d, np.minimum(ends, n), -1)
            valid = np.cumsum(d[:n]) == 0
            parts.append(all_hashes[valid])
        kmers = (np.concatenate(parts) if parts
                 else np.zeros(0, dtype=np.uint64))
        if include_reverse_complements:
            kmers = np.concatenate(
                [kmers, kmer_hashes_to_reverse_complement_hash(kmers, k)])
        return kmers

    def __iter__(self):
        return self.kmers.__iter__()

    def __next__(self):
        return self.kmers.__next__()
