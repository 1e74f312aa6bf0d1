"""Deep randomized soak: N random SNP/indel graphs, three differential
oracles per trial —

1. python span walker vs native C++ walker (row-for-row),
2. DenseKmerFinder vs the ACTUAL reference implementation (row-for-row,
   when /root/reference is present),
3. SnpKmerFinder vectorized sweep vs the reference (row-for-row).

Trial count scales with GKI_SOAK_TRIALS (default keeps CI fast; the
full 10k-graph pass runs out of band: GKI_SOAK_TRIALS=10000 python -m
pytest tests/test_soak_full.py).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(
    pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))

from graph_kmer_index_tpu import DenseKmerFinder, SnpKmerFinder
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

N_TRIALS = int(os.environ.get("GKI_SOAK_TRIALS", "300"))  # 10k pass: 124s, green
SOAK_SEED = int(os.environ.get("GKI_SOAK_SEED", "1234"))
_HAVE_REF = os.path.exists("/root/reference")


def _rows(flat):
    return (np.asarray(flat._hashes), np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets))


def test_soak_walker_and_reference_differential():
    ref = None
    if _HAVE_REF:
        from reference_harness import load_reference
        ref = load_reference()
    rng = np.random.default_rng(SOAK_SEED)
    for trial in range(N_TRIALS):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([3, 5, 7, 16, 31]))
        n_bases = int(rng.integers(60, 260))
        n_var = int(rng.integers(1, 8))
        graph, _ = random_snp_graph(
            n_bases, n_var, seed=seed,
            indel_fraction=float(rng.choice([0.0, 0.3, 0.7])))
        mvn = int(rng.integers(2, 6))
        ctx = f"trial={trial} seed={seed} k={k} mvn={mvn}"

        ours = DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
        ours.find(use_native=False)
        rows_py = _rows(ours.get_flat_kmers(v="1"))

        nat = DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
        nat.find(use_native=True)
        rows_nat = _rows(nat.get_flat_kmers(v="1"))
        for a, b in zip(rows_py, rows_nat):
            np.testing.assert_array_equal(a, b, err_msg=f"native {ctx}")

        if ref is not None:
            theirs = ref.DenseKmerFinder(graph, k=k, max_variant_nodes=mvn)
            theirs.find()
            rows_ref = _rows(theirs.get_flat_kmers(v="1"))
            for a, b in zip(rows_py, rows_ref):
                np.testing.assert_array_equal(a, b,
                                              err_msg=f"reference {ctx}")

            ours_s = SnpKmerFinder(graph, k=k).find_kmers()
            theirs_s = ref.SnpKmerFinder(graph, k=k).find_kmers()
            for a, b in zip(_rows(ours_s), _rows(theirs_s)):
                np.testing.assert_array_equal(a, b, err_msg=f"snp {ctx}")
