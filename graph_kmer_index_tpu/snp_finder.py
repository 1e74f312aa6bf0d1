"""SnpKmerFinder — legacy/simple finder: for every linear-ref position
(with ``spacing`` stride), DFS over all branches collecting k-mers.

Behavioral mirror of reference snp_kmer_finder.py:29-345 including its
quirks (``_n_variant_nodes_passed`` accumulates across sibling branches of
one position search; ``max_variant_nodes`` uses >=; pruning window of 124
bp). Like DenseKmerFinder, this is host control-plane; bulk linear-
reference hashing goes through the sliding-window kernel.
"""
from __future__ import annotations

import logging
import time
from collections import defaultdict

import numpy as np

from .flat_kmers import FlatKmers
from .hashing import (letter_sequence_to_numeric, kmer_to_hash_fast,
                      sliding_window_hashes, power_array)
from .read_kmers import ReadKmers, reverse_complement_string


class SnpKmerFinder:
    """Simple kmer finder that only supports SNP graphs (+ indel dummies)."""

    def __init__(self, graph, k=15, spacing=None,
                 include_reverse_complements=False, pruning=False,
                 max_kmers_same_position=100000, max_frequency=10000,
                 max_variant_nodes=10000, only_add_variant_kmers=False,
                 whitelist=None, only_save_variant_nodes=False,
                 start_position=None, end_position=None,
                 only_store_nodes=None, skip_kmers_with_nodes=None,
                 only_save_one_node_per_kmer=False, reference=None,
                 variant_to_nodes=None, node_to_variants=None,
                 haplotype_matrix=None):
        self.graph = graph
        self.reference = reference
        self.k = k
        self._hashes = []
        self._nodes = []
        self._ref_offsets = []
        self._allele_frequencies = []
        self.kmers_found = []
        self._bases_in_search_path = []
        self._nodes_in_path = []
        self._kmers_found = 0
        self._current_ref_offset = None
        self._last_ref_pos_added = 0
        self.pruning = pruning
        self._n_kmers_skipped_low_allele_frequency = 0
        self._n_kmers_pruned = 0
        self._has_traversed_variant = False
        self._unique_kmers_added = set()
        self._max_kmers_same_position = max_kmers_same_position
        self._n_kmers_added_current_position = 0
        self._n_kmers_skipped = 0
        self._kmer_frequencies = defaultdict(int)
        self._max_frequency = max_frequency
        self._n_skipped_due_to_frequency = 0
        self._max_variant_nodes = max_variant_nodes
        self._n_skipped_due_to_max_variant_nodes = 0
        self._only_add_variant_kmers = only_add_variant_kmers
        self._whitelist = whitelist
        self._n_skipped_whitelist = 0
        self._start_position = start_position or 0
        self._end_position = end_position
        self._only_store_nodes = only_store_nodes
        self._skip_kmers_with_nodes = skip_kmers_with_nodes
        self._n_skipped_blacklist_nodes = 0
        self._only_save_one_node_per_kmer = only_save_one_node_per_kmer
        self.haplotype_matrix = haplotype_matrix
        self.variant_to_nodes = variant_to_nodes
        self.node_to_variants = node_to_variants

        self._only_save_variant_nodes = only_save_variant_nodes
        self._variant_nodes = set()
        if only_save_variant_nodes:
            # all successors of fork nodes are variant-associated
            for node in range(graph.n_nodes()):
                edges = graph.get_edges(node)
                if len(edges) > 1:
                    for nxt in edges:
                        self._variant_nodes.add(int(nxt))

        self.spacing = k if spacing is None else spacing
        self._include_reverse_complements = include_reverse_complements

    # -- kmer emission with all the filters (reference :117-203) ----------

    def has_kmer(self, kmer, nodes):
        """Test helper (reference snp_kmer_finder.py:~91). Our decoded kmer
        strings are lowercase 'acgt'; compare case-insensitively."""
        kmer = kmer.lower()
        return any(f[0] == kmer and f[1] == nodes for f in self.kmers_found)

    def _add_kmer(self, kmer, nodes):
        self._n_paths_searched += 1
        assert len(kmer) == self.k
        hash_ = kmer_to_hash_fast(letter_sequence_to_numeric(kmer), self.k)

        if self._whitelist is not None:
            if hash_ not in self._whitelist:
                rev_hash = kmer_to_hash_fast(letter_sequence_to_numeric(
                    reverse_complement_string(kmer)), self.k)
                if rev_hash not in self._whitelist:
                    self._n_skipped_whitelist += 1
                    return

        if (self._skip_kmers_with_nodes is not None
                and set(nodes).intersection(self._skip_kmers_with_nodes)):
            self._n_skipped_blacklist_nodes += 1
            return

        if not self._has_traversed_variant and self._only_add_variant_kmers:
            return

        if self._kmer_frequencies[hash_] >= self._max_frequency:
            self._n_skipped_due_to_frequency += 1
            return

        if self.pruning and hash_ not in self._unique_kmers_added:
            if (self._last_ref_pos_added != self._current_ref_offset
                    and self._last_ref_pos_added > self._current_ref_offset - 124):
                if not self._has_traversed_variant:
                    self._n_kmers_pruned += 1
                    return

        if self._n_kmers_added_current_position > self._max_kmers_same_position:
            self._n_kmers_skipped += 1
            return

        n_variant_nodes = sum(
            1 for n in nodes
            if not self.graph.is_linear_ref_node_or_linear_ref_dummy_node(n))
        if n_variant_nodes >= self._max_variant_nodes:
            self._n_skipped_due_to_max_variant_nodes += 1
            return

        if self._include_reverse_complements:
            rev_hash = kmer_to_hash_fast(letter_sequence_to_numeric(
                reverse_complement_string(kmer)), self.k)

        self._unique_kmers_added.add(hash_)
        self._kmer_frequencies[hash_] += 1

        if self.haplotype_matrix is not None:
            af = self.haplotype_matrix.get_allele_frequency_for_nodes(
                nodes, self.node_to_variants, self.variant_to_nodes)
        else:
            af = min(self.graph.get_node_allele_frequency(n) for n in nodes)

        for node in nodes:
            if self._only_save_variant_nodes and node not in self._variant_nodes:
                continue
            if (self._only_store_nodes is not None
                    and node not in self._only_store_nodes):
                continue
            self._hashes.append(hash_)
            self._nodes.append(node)
            self._ref_offsets.append(self._current_ref_offset)
            self._allele_frequencies.append(af)
            if self._include_reverse_complements:
                self._hashes.append(rev_hash)
                self._nodes.append(node)
                self._ref_offsets.append(self._current_ref_offset)
                self._allele_frequencies.append(af)
            if self._only_save_one_node_per_kmer:
                break

        self._last_ref_pos_added = self._current_ref_offset
        self._kmers_found += 1
        if len(self.kmers_found) < 500:
            self.kmers_found.append(
                (kmer, nodes, self._current_ref_offset, hash_))
        self._n_kmers_added_current_position += 1

    # -- per-position DFS (reference :205-289) ------------------------------

    def _find_all_variant_kmers_from_position(self, linear_ref_pos):
        self._n_paths_searched = 0
        self._n_variant_nodes_passed = 0
        self._current_ref_offset = linear_ref_pos
        # start one bp before to catch node beginnings
        if linear_ref_pos > 0:
            node = self.graph.get_node_at_ref_offset(linear_ref_pos - 1)
            offset = self.graph.get_node_offset_at_ref_offset(linear_ref_pos - 1) + 1
        else:
            node = self.graph.get_node_at_ref_offset(linear_ref_pos)
            offset = self.graph.get_node_offset_at_ref_offset(linear_ref_pos)
        self._bases_in_search_path = []
        self._nodes_in_path = []
        self._has_traversed_variant = False
        self._n_kmers_added_current_position = 0
        self._search_graph_from(node, offset, self.k)

    def _search_graph_from(self, node, offset, bases_left):
        if bases_left == 0:
            self._add_kmer("".join(self._bases_in_search_path).replace("-", ""),
                           set(self._nodes_in_path))
            return

        if not self.graph.is_linear_ref_node_or_linear_ref_dummy_node(node):
            self._n_variant_nodes_passed += 1

        node_size = self.graph.get_node_size(node)
        node_sequence = self.graph.get_node_subsequence(
            node, offset, min(offset + bases_left, node_size))

        if node_size == 0:
            self._bases_in_search_path.append("-")
            self._nodes_in_path.append(node)

        for node_position in range(int(offset), node_size):
            base = node_sequence[node_position - int(offset)]
            self._bases_in_search_path.append(base)
            self._nodes_in_path.append(node)
            bases_left -= 1
            if bases_left == 0:
                self._add_kmer(
                    "".join(self._bases_in_search_path).replace("-", ""),
                    set(self._nodes_in_path))
                return

        next_nodes = [int(v) for v in self.graph.get_edges(node)]
        if len(next_nodes) > 1:
            self._has_traversed_variant = True
        # linear ref arm first
        if next_nodes and not self.graph.is_linear_ref_node_or_linear_ref_dummy_node(
                next_nodes[0]):
            next_nodes = list(reversed(next_nodes))
        if len(next_nodes) > 1:
            if self._n_variant_nodes_passed >= self._max_variant_nodes:
                next_nodes = [
                    n for n in next_nodes
                    if self.graph.is_linear_ref_node_or_linear_ref_dummy_node(n)]

        bases_so_far = len(self._bases_in_search_path)
        for next_node in next_nodes:
            self._search_graph_from(next_node, 0, bases_left)
            self._bases_in_search_path = self._bases_in_search_path[:bases_so_far]
            self._nodes_in_path = self._nodes_in_path[:bases_so_far]

    def find_kmers_from_linear_ref_position(self, pos):
        self._find_all_variant_kmers_from_position(pos)

    # -- drivers -----------------------------------------------------------

    def get_flat_kmers(self, v=None):
        return FlatKmers(np.array(self._hashes, dtype=np.uint64),
                         np.array(self._nodes, np.uint32),
                         np.array(self._ref_offsets, np.uint64),
                         np.array(self._allele_frequencies, np.single))

    def find_kmers_on_linear_reference(self):
        if self._end_position is None:
            # whole reference (the reference impl crashes here when no
            # interval is given, snp_kmer_finder.py:301; evident intent)
            self._end_position = max(0, len(self.reference) - self.k)
        seq = str(self.reference[self._start_position:
                                 self._end_position + self.k])
        assert len(seq) > 0, "No reference sequence in range"
        kmers = ReadKmers.get_kmers_from_read_dynamic(seq, power_array(self.k))
        kmers = kmers[::self.spacing]
        self._hashes = kmers
        self._nodes = np.zeros(len(kmers)) + 1
        self._ref_offsets = np.arange(
            self._start_position, self._start_position + len(seq),
            self.spacing)[:len(kmers)]
        self._allele_frequencies = np.zeros(len(kmers)) + 1.0

    def find_kmers(self):
        if self.reference is not None:
            logging.warning("Finding kmers on linear reference, not graph")
            self.find_kmers_on_linear_reference()
            return self.get_flat_kmers()

        if self._end_position is None:
            self._end_position = self.graph.linear_ref_length()

        for i in range(self._start_position // self.spacing,
                       self.graph.linear_ref_length() // self.spacing):
            pos = i * self.spacing
            if self._end_position is not None and pos >= self._end_position:
                break
            self.find_kmers_from_linear_ref_position(pos)
        return self.get_flat_kmers()


class IndelKmerFinder(SnpKmerFinder):
    """Vestigial subclass kept for API parity (reference
    indel_kmer_finder.py:3-13)."""
