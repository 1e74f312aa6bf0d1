"""UniqueVariantKmersFinder — select "signature" k-mers per VCF variant
(the KAGE genotyping input). Behavioral mirror of the reference
unique_variant_kmers.py:10-269:

- candidate start positions ``[variant.position - i for i in range(2, k-2)]
  [::4][::-1]`` (reference :119);
- per candidate, run a finder (Snp- or Dense-) from that linear-ref
  position with ``only_store_nodes={ref,var} - already_found`` (:121-140);
- reject candidates where ref & var alleles share a k-mer (:165-167); the
  LAST candidate is always accepted as fallback (:170-172);
- rank surviving candidates by max k-mer frequency against a frequency
  index, pick the lowest (stable sort, :214-218);
- early-exit the candidate scan when a candidate's max frequency <= 1
  (:181-183);
- assert each node is selected at most once across variants (:232-235).

The frequency scoring — the expensive part at genome scale — is batched
through the device lookup kernel when a CollisionFreeKmerIndex is used
(ops.lookup), one batch per variant instead of one query per kmer.
"""
from __future__ import annotations

import logging

from .finder import DenseKmerFinder
from .flat_kmers import FlatKmers
from .snp_finder import SnpKmerFinder


class UniqueVariantKmersFinder:
    def __init__(self, graph, variant_to_nodes, variants, k=31,
                 max_variant_nodes=6, kmer_index_with_frequencies=None,
                 haplotype_matrix=None, node_to_variants=None,
                 do_not_choose_lowest_frequency_kmers=False,
                 use_dense_kmer_finder=False, position_id_index=None,
                 use_simple=False):
        self.graph = graph
        self.variant_to_nodes = variant_to_nodes
        self.reference_kmer_index = None
        self.variants = variants
        self.k = k
        self.flat_kmers_found = []
        self.n_failed_variants = 0
        self._max_variant_nodes = max_variant_nodes
        self._kmer_index_with_frequencies = kmer_index_with_frequencies
        self.haplotype_matrix = haplotype_matrix
        self.node_to_variants = node_to_variants
        self._use_dense_kmer_finder = use_dense_kmer_finder
        self._position_id_index = position_id_index
        self._nodes_found = set()
        self._use_simple = use_simple

        if self._use_dense_kmer_finder:
            assert self._position_id_index is not None, \
                "Position id index must be set when using dense kmer finder"

        self._choose_kmers_with_lowest_frequencies = \
            not do_not_choose_lowest_frequency_kmers

    # -- per-node search (reference :70-100) --------------------------------

    def find_kmers_over_variant_node(self, variant, node):
        start_pos = variant.position
        assert variant.type, "Variant type must be set"
        if variant.type != "SNP":
            start_pos = start_pos + 1  # indel pos is 1 base before
        start_pos -= 1  # 1-based -> 0-based

        node_sequence = self.graph.get_node_sequence(node)
        if node_sequence == "" or variant.type != "SNP":
            start_node = self.graph.get_node_at_chromosome_and_chromosome_offset(
                variant.chromosome, start_pos - 8)
            start_node_offset = \
                self.graph.get_node_offset_at_chromosome_and_chromosome_offset(
                    variant.chromosome, start_pos - 8)
        else:
            start_node = node
            start_node_offset = 0

        finder = DenseKmerFinder(
            self.graph, self.k, None, position_id=self._position_id_index,
            max_variant_nodes=self._max_variant_nodes,
            only_store_nodes={node}, only_follow_nodes={node})
        finder.find_only_kmers_starting_at_position(
            int(start_node), int(start_node_offset))
        return finder.get_flat_kmers(v="1")

    def kmer_is_unique_on_reference_position(self, kmer, reference_position,
                                             ref_start, ref_end):
        """True if ``kmer`` does not occur at any other reference position
        in [ref_start, ref_end) (reference unique_variant_kmers.py:39-47;
        requires ``self.reference_kmer_index`` to be set)."""
        reference_kmers = self.reference_kmer_index.get_between(ref_start,
                                                               ref_end)
        for i, reference_kmer in enumerate(reference_kmers):
            pos = ref_start + i
            if pos != reference_position and reference_kmer == kmer:
                return False
        return True

    def find_kmers_over_structural_variant(self, variant, ref_node,
                                           variant_node):
        """Search both allele nodes (reference unique_variant_kmers.py
        :102-105 — NB the reference discards the results too)."""
        self.find_kmers_over_variant_node(variant, ref_node)
        self.find_kmers_over_variant_node(variant, variant_node)

    def find_kmers_over_variant(self, variant, ref_node, variant_node):
        """Simple mode: kmers over both alleles, no uniqueness search
        (reference :107-111)."""
        ref_kmers = self.find_kmers_over_variant_node(variant, ref_node)
        variant_kmers = self.find_kmers_over_variant_node(variant, variant_node)
        return FlatKmers.from_multiple_flat_kmers([ref_kmers, variant_kmers])

    # -- unique search (reference :114-238) ---------------------------------

    def find_unique_kmers_over_variant(self, variant, ref_node, variant_node):
        possible_ref_positions = \
            [variant.position - i for i in range(2, self.k - 2)][::4][::-1]
        valid_positions_found = []

        for possible_ref_position in possible_ref_positions:
            possible_ref_position_adjusted = \
                self.graph.convert_chromosome_ref_offset_to_graph_ref_offset(
                    possible_ref_position, variant.chromosome)
            is_valid = True
            only_store_nodes = {n for n in (ref_node, variant_node)
                                if n not in self._nodes_found}

            if not self._use_dense_kmer_finder:
                finder = SnpKmerFinder(
                    self.graph, self.k,
                    max_variant_nodes=self._max_variant_nodes,
                    only_store_nodes=only_store_nodes,
                    haplotype_matrix=self.haplotype_matrix,
                    node_to_variants=self.node_to_variants,
                    variant_to_nodes=self.variant_to_nodes)
                finder.find_kmers_from_linear_ref_position(
                    possible_ref_position_adjusted)
            else:
                finder = DenseKmerFinder(
                    self.graph, self.k, None,
                    position_id=self._position_id_index,
                    max_variant_nodes=self._max_variant_nodes,
                    only_store_nodes=only_store_nodes)
                node = self.graph.get_node_at_ref_offset(
                    possible_ref_position_adjusted)
                offset = self.graph.get_node_offset_at_ref_offset(
                    possible_ref_position_adjusted)
                finder.find_only_kmers_starting_at_position(node, offset)

            kmers_ref, kmers_variant = set(), set()
            for _kmer, nodes, *_rest, hash_ in finder.kmers_found:
                if ref_node in nodes:
                    kmers_ref.add(hash_)
                if variant_node in nodes:
                    kmers_variant.add(hash_)

            # identical kmers on the two alleles are useless as signatures
            if kmers_ref & kmers_variant:
                is_valid = False

            # last candidate: accept anyway, better than nothing
            if possible_ref_position == possible_ref_positions[-1]:
                is_valid = True

            if is_valid:
                flat = finder.get_flat_kmers(v="1")
                assert len(set(flat._nodes)) <= 2
                valid_positions_found.append(flat)

                if flat.maximum_kmer_frequency(
                        self._kmer_index_with_frequencies) <= 1:
                    break  # all kmers already unique, stop searching

                if len(flat._nodes) == 0:
                    logging.warning(
                        "Found 0 nodes for variant %s (searched from %d)",
                        variant, possible_ref_position)

        if not valid_positions_found:
            logging.warning("Found no positions with valid kmers for "
                            "variant %s", variant)
            self.n_failed_variants += 1
            return None

        if self._choose_kmers_with_lowest_frequencies:
            valid_positions_found = sorted(
                valid_positions_found,
                key=lambda p: p.maximum_kmer_frequency(
                    self._kmer_index_with_frequencies))
        best_position = valid_positions_found[0]

        for node in set(best_position._nodes):
            assert node not in self._nodes_found, (
                "Found node %d at variant %s (nodes %d/%d), but already "
                "found for previous variant"
                % (node, variant, ref_node, variant_node))
            self._nodes_found.add(node)
        return best_position

    def find_unique_kmers(self):
        for i, variant in enumerate(self.variants):
            n_processed = len(self.flat_kmers_found)
            assert variant.vcf_line_number is not None, \
                "Variant line number must be specified"
            ref_node = self.variant_to_nodes.ref_nodes[variant.vcf_line_number]
            variant_node = self.variant_to_nodes.var_nodes[variant.vcf_line_number]
            if ref_node == 0 or variant_node == 0:
                continue

            if not self._use_simple:
                found = self.find_unique_kmers_over_variant(
                    variant, int(ref_node), int(variant_node))
            else:
                found = self.find_kmers_over_variant(
                    variant, int(ref_node), int(variant_node))
            if found is not None:
                self.flat_kmers_found.append(found)

            if len(self.flat_kmers_found) != n_processed + 1:
                logging.warning("DID NOT FIND KMERS ON %s", variant)

        logging.info("N variants with kmers found: %d",
                     len(self.flat_kmers_found))
        logging.info("Done with all variants. N that failed: %d",
                     self.n_failed_variants)
        return FlatKmers.from_multiple_flat_kmers(self.flat_kmers_found)
