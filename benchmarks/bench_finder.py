"""DenseKmerFinder scale benchmark: synthetic SNP graph, full enumeration.

Usage: python benchmarks/bench_finder.py [n_ref_bases] [n_variants] [k]
Prints bases/s of graph traversed and rows/s emitted.
"""
import sys
import time

import numpy as np

from graph_kmer_index_tpu import CollisionFreeKmerIndex, DenseKmerFinder
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph


def main():
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_var = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 31

    t = time.perf_counter()
    graph, v2n = random_snp_graph(n_ref, n_var)
    print(f"graph build: {time.perf_counter()-t:.2f}s "
          f"({graph.n_nodes()} nodes)")

    t = time.perf_counter()
    finder = DenseKmerFinder(graph, k=k, max_variant_nodes=4)
    finder.find()
    flat = finder.get_flat_kmers(v="0")
    dt = time.perf_counter() - t
    print(f"find: {dt:.2f}s  {n_ref/dt/1e6:.2f} Mbases/s  "
          f"{len(flat._hashes)} rows  {len(flat._hashes)/dt/1e6:.2f} Mrows/s")

    t = time.perf_counter()
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=452930477)
    dt = time.perf_counter() - t
    print(f"index build (host/device auto): {dt:.2f}s  "
          f"{len(flat._hashes)/dt/1e6:.2f} Mrows/s")


if __name__ == "__main__":
    main()
