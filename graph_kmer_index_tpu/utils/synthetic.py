"""Synthetic pangenome graph generators for benchmarks and scale tests.

Builds SNP/indel graphs of the same shape as the KAGE inputs: a linear
reference chopped at variant sites, with ref/alt allele node pairs
(mirrors what obgraph builds from VCF+FASTA for the reference impl).
"""
from __future__ import annotations

import numpy as np

from ..graph import Graph, VariantToNodes


def random_snp_graph(n_ref_bases: int = 100000, n_variants: int = 1000,
                     seed: int = 0, indel_fraction: float = 0.0):
    """(Graph, VariantToNodes): evenly spaced bi-allelic variants.

    Each variant: ref segment ... -> (ref_allele | alt_allele) -> ...
    Indels (when ``indel_fraction``>0) use an empty ref-allele node
    (the dummy-node case, reference kmer_finder.py:261-266).
    """
    rng = np.random.default_rng(seed)
    bases = "acgt"
    spacing = max(2, n_ref_bases // max(1, n_variants))

    node_seqs = {}
    edges = {}
    linear_ref = []
    ref_nodes_v, var_nodes_v = [], []

    nid = 1
    prev_tails = []

    def link(frm_list, to):
        for f in frm_list:
            edges.setdefault(f, []).append(to)

    pos = 0
    while pos < n_ref_bases:
        seg_len = min(spacing, n_ref_bases - pos)
        seg = "".join(rng.choice(list(bases), size=seg_len))
        node_seqs[nid] = seg
        link(prev_tails, nid)
        linear_ref.append(nid)
        seg_node = nid
        nid += 1
        pos += seg_len
        if pos >= n_ref_bases or len(ref_nodes_v) >= n_variants:
            prev_tails = [seg_node]
            continue
        is_indel = rng.random() < indel_fraction
        if is_indel:
            ref_allele, var_allele = nid, nid + 1
            node_seqs[ref_allele] = ""
            node_seqs[var_allele] = "".join(
                rng.choice(list(bases), size=int(rng.integers(1, 5))))
        else:
            ref_allele, var_allele = nid, nid + 1
            b = int(rng.integers(0, 4))
            node_seqs[ref_allele] = bases[b]
            node_seqs[var_allele] = bases[(b + 1 + int(rng.integers(0, 3))) % 4]
        nid += 2
        edges[seg_node] = [ref_allele, var_allele]
        linear_ref.append(ref_allele)
        ref_nodes_v.append(ref_allele)
        var_nodes_v.append(var_allele)
        prev_tails = [ref_allele, var_allele]

    graph = Graph.from_dicts(node_seqs, edges, linear_ref)
    v2n = VariantToNodes(np.array(ref_nodes_v, dtype=np.int32),
                         np.array(var_nodes_v, dtype=np.int32))
    return graph, v2n
