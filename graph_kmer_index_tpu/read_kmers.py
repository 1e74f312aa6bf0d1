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


class ReadKmers:
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

    def __iter__(self):
        return self.kmers.__iter__()

    def __next__(self):
        return self.kmers.__next__()
