"""Light randomized end-to-end soaks (full 300-500-trial versions are run
out-of-band; these keep a rotating sample in CI)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import (
    DenseKmerFinder, CollisionFreeKmerIndex, PositionId,
    UniqueVariantKmersFinder, VcfVariant, VcfVariants)
from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph


def test_walker_soak_light():
    rng = np.random.default_rng(20260817)
    for trial in range(6):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([3, 7, 15, 31]))
        graph, _ = random_snp_graph(800, 15, seed=seed,
                                    indel_fraction=float(rng.choice([0, .5])))
        outs = []
        for un in (False, True):
            f = DenseKmerFinder(graph, k=k,
                                max_variant_nodes=int(rng.integers(1, 5)))
            f.find(use_native=un)
            fl = f.get_flat_kmers(v="1")
            outs.append((np.asarray(fl._hashes), np.asarray(fl._nodes)))
        for a, b in zip(*outs):
            assert np.array_equal(a, b), (trial, seed, k)


def test_random_vcf_end_to_end_soak_light():
    rng = np.random.default_rng(42)
    for trial in range(3):
        n = int(rng.integers(250, 500))
        ref = "".join(rng.choice(list("ACGT"), size=n))
        variants, pos, line = [], 20, 0
        while pos < n - 30:
            r = ref[pos]
            a = "ACGT"[("ACGT".index(r) + 1 + int(rng.integers(0, 3))) % 4]
            variants.append(VcfVariant("1", pos + 1, r, a,
                                       vcf_line_number=line))
            line += 1
            pos += int(rng.integers(20, 60))
        vs = VcfVariants(variants)
        graph, v2n = build_graph_from_vcf({"1": ref}, vs)
        assert graph.linear_ref_length() == n
        f = DenseKmerFinder(graph, k=7, max_variant_nodes=4)
        f.find()
        idx = CollisionFreeKmerIndex.from_flat_kmers(
            f.get_flat_kmers(v="1"), modulo=40009)
        uv = UniqueVariantKmersFinder(
            graph, v2n, vs, k=7, kmer_index_with_frequencies=idx,
            use_dense_kmer_finder=True,
            position_id_index=PositionId.from_graph(graph))
        sig = uv.find_unique_kmers()
        sel = set(int(x) for x in np.asarray(sig._nodes))
        allowed = (set(int(x) for x in np.asarray(v2n.ref_nodes))
                   | set(int(x) for x in np.asarray(v2n.var_nodes)))
        assert sel <= allowed


def test_reference_differential_soak():
    """Random SNP/indel graphs: full-row bit-equality of our
    DenseKmerFinder and SnpKmerFinder against the ACTUAL reference
    implementation (loaded in-process via benchmarks/reference_harness)."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    import pathlib
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()

    rng = np.random.default_rng(99)
    for trial in range(4):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([4, 7, 31]))
        graph, _ = random_snp_graph(
            400, 10, seed=seed,
            indel_fraction=float(rng.choice([0, 0.5])))
        ours = DenseKmerFinder(graph, k=k, max_variant_nodes=4)
        ours.find()
        flat = ours.get_flat_kmers(v="1")
        theirs = ref.DenseKmerFinder(graph, k=k, max_variant_nodes=4)
        theirs.find()
        rflat = theirs.get_flat_kmers(v="1")
        for attr in ("_hashes", "_nodes", "_ref_offsets"):
            np.testing.assert_array_equal(
                np.asarray(getattr(flat, attr)),
                np.asarray(getattr(rflat, attr)),
                err_msg=f"dense trial={trial} seed={seed} k={k} {attr}")

        from graph_kmer_index_tpu import SnpKmerFinder
        ours_s = SnpKmerFinder(graph, k=k).find_kmers()
        theirs_s = ref.SnpKmerFinder(graph, k=k).find_kmers()
        for attr in ("_hashes", "_nodes", "_ref_offsets"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ours_s, attr)),
                np.asarray(getattr(theirs_s, attr)),
                err_msg=f"snp trial={trial} seed={seed} k={k} {attr}")


def test_reference_differential_flagged_configs():
    """Reference differential under NON-DEFAULT flags: whitelist,
    only_store_nodes, only_save_one_node_per_kmer, only_follow_nodes for
    DenseKmerFinder; spacing, pruning, max_frequency,
    max_kmers_same_position, skip_kmers_with_nodes, revcomp for
    SnpKmerFinder — full-row bit-equality against the in-process
    reference implementation."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    import pathlib
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    from graph_kmer_index_tpu import SnpKmerFinder
    ref = load_reference()

    rng = np.random.default_rng(123)
    for trial in range(4):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([4, 7, 15]))
        graph, _ = random_snp_graph(
            300, 8, seed=seed,
            indel_fraction=float(rng.choice([0, 0.5])))

        # seed a whitelist from the default run's kmers
        base = DenseKmerFinder(graph, k=k, max_variant_nodes=4)
        base.find()
        base_flat = base.get_flat_kmers(v="1")
        hashes = np.asarray(base_flat._hashes)
        if len(hashes) == 0:
            continue
        wl = set(int(h) for h in hashes[:: max(1, len(hashes) // 10)])
        all_nodes = sorted(set(int(n) for n in np.asarray(base_flat._nodes)))
        store = set(all_nodes[::2])
        follow = set(all_nodes)  # follow everything = same rows, but
        # exercises the only_follow_nodes machinery end-to-end

        dense_cfgs = [
            dict(whitelist=wl),
            dict(only_store_nodes=store),
            dict(only_save_one_node_per_kmer=True),
            dict(max_variant_nodes=2),
            dict(only_follow_nodes=follow, whitelist=wl),
        ]
        for cfg in dense_cfgs:
            ours = DenseKmerFinder(graph, k=k, **cfg)
            ours.find()
            flat = ours.get_flat_kmers(v="1")
            theirs = ref.DenseKmerFinder(graph, k=k, **cfg)
            theirs.find()
            rflat = theirs.get_flat_kmers(v="1")
            r_rows = {a: np.asarray(getattr(rflat, a))
                      for a in ("_hashes", "_nodes", "_ref_offsets")}
            if "only_store_nodes" in cfg:
                # documented divergence (PARITY.md): the reference's
                # long-node fast path (kmer_finder.py:349-381) skips the
                # only_store_nodes filter its DFS path applies, leaking
                # rows for long linear nodes; we filter uniformly. Our
                # output == the reference's rows restricted to the set.
                keep = np.isin(r_rows["_nodes"],
                               np.array(sorted(store)))
                r_rows = {a: v[keep] for a, v in r_rows.items()}
            if "only_follow_nodes" in cfg:
                # documented divergence (PARITY.md): the reference
                # orders filtered children by set.intersection hash
                # order (kmer_finder.py:386-387); we keep stable edge
                # order. Same rows, order-insensitive comparison.
                def _norm(rows):
                    return sorted(zip(*(v.tolist()
                                        for v in rows.values())))
                ours_rows = {a: np.asarray(getattr(flat, a))
                             for a in r_rows}
                assert _norm(ours_rows) == _norm(r_rows), \
                    f"dense {cfg} seed={seed} k={k} row multiset"
                continue
            for attr in ("_hashes", "_nodes", "_ref_offsets"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(flat, attr)), r_rows[attr],
                    err_msg=f"dense {cfg} seed={seed} k={k} {attr}")

        snp_cfgs = [
            dict(spacing=2),
            dict(pruning=True),
            dict(max_frequency=2),
            dict(max_kmers_same_position=1),
            dict(skip_kmers_with_nodes=store),
            dict(include_reverse_complements=True),
            dict(whitelist=wl),
            dict(only_save_one_node_per_kmer=True, spacing=1),
        ]
        for cfg in snp_cfgs:
            flat_s = SnpKmerFinder(graph, k=k, **cfg).find_kmers()
            rflat_s = ref.SnpKmerFinder(graph, k=k, **cfg).find_kmers()
            for attr in ("_hashes", "_nodes", "_ref_offsets"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(flat_s, attr)),
                    np.asarray(getattr(rflat_s, attr)),
                    err_msg=f"snp {cfg} seed={seed} k={k} {attr}")


def test_reference_differential_haplotype_matrix():
    """SnpKmerFinder with a haplotype matrix vs the in-process reference.

    The reference delegates per-kmer allele frequencies to
    ``haplotype_matrix.get_allele_frequency_for_nodes(nodes,
    node_to_variants, variant_to_nodes)`` when one is supplied
    (reference snp_kmer_finder.py:169-170; ours snp_finder.py:210-211).
    A stub whose result is an order-sensitive deterministic function of
    the forwarded node list pins that both implementations invoke it at
    the same emission points with the same arguments, and that the
    returned value lands on every row's allele_frequency."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    from graph_kmer_index_tpu import SnpKmerFinder
    ref = load_reference()

    class StubHaplotypeMatrix:
        """Minimal obgraph.haplotype_matrix-compatible double: answers
        get_allele_frequency_for_nodes with an order-sensitive hash of
        the node list, and records that the index structures were
        forwarded untouched."""

        def __init__(self, expected_n2v, expected_v2n):
            self._n2v = expected_n2v
            self._v2n = expected_v2n
            self.n_calls = 0

        def get_allele_frequency_for_nodes(self, nodes, node_to_variants,
                                           variant_to_nodes):
            assert node_to_variants is self._n2v
            assert variant_to_nodes is self._v2n
            self.n_calls += 1
            acc = 0
            for n in nodes:
                acc = (acc * 31 + int(n) + 1) % 997
            return acc / 997.0

    rng = np.random.default_rng(2024)
    n2v_sentinel = object()
    for trial in range(3):
        seed = int(rng.integers(0, 1 << 30))
        k = int(rng.choice([4, 7, 15]))
        graph, v2n = random_snp_graph(
            300, 8, seed=seed,
            indel_fraction=float(rng.choice([0, 0.5])))
        for extra in ({}, {"spacing": 2},
                      {"include_reverse_complements": True}):
            stub_ours = StubHaplotypeMatrix(n2v_sentinel, v2n)
            ours = SnpKmerFinder(
                graph, k=k, haplotype_matrix=stub_ours,
                variant_to_nodes=v2n, node_to_variants=n2v_sentinel,
                **extra).find_kmers()
            stub_ref = StubHaplotypeMatrix(n2v_sentinel, v2n)
            theirs = ref.SnpKmerFinder(
                graph, k=k, haplotype_matrix=stub_ref,
                variant_to_nodes=v2n, node_to_variants=n2v_sentinel,
                **extra).find_kmers()
            assert stub_ours.n_calls == stub_ref.n_calls > 0, \
                (trial, seed, k, extra)
            for attr in ("_hashes", "_nodes", "_ref_offsets",
                         "_allele_frequencies"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(ours, attr)),
                    np.asarray(getattr(theirs, attr)),
                    err_msg=f"haplo seed={seed} k={k} {extra} {attr}")


def test_reference_differential_unique_variant_kmers():
    """UniqueVariantKmersFinder vs the in-process reference: bit-equal
    signature rows on random VCF graphs, in both SnpKmerFinder mode
    (default) and DenseKmerFinder mode."""
    import os
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    import pathlib
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()

    rng = np.random.default_rng(77)
    for trial in range(3):
        n = int(rng.integers(250, 450))
        seq = "".join(rng.choice(list("ACGT"), size=n))
        variants, pos, line = [], 25, 0
        while pos < n - 30:
            r = seq[pos]
            a = "ACGT"[("ACGT".index(r) + 1) % 4]
            variants.append(VcfVariant("1", pos + 1, r, a,
                                       vcf_line_number=line))
            line += 1
            pos += int(rng.integers(25, 70))
        vs = VcfVariants(variants)
        graph, v2n = build_graph_from_vcf({"1": seq}, vs)
        k = int(rng.choice([7, 15]))
        from graph_kmer_index_tpu import (SnpKmerFinder,
                                          UniqueVariantKmersFinder)
        flat = SnpKmerFinder(graph, k=k).find_kmers()
        our_idx = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=4099)
        # the reference's ediff1d chokes on uint64 hashes under NumPy 2
        # (int to_begin is not same_kind); feed it int64 like its own
        # finders produce
        ref_flat = ref.FlatKmers(
            np.asarray(flat._hashes).astype(np.int64),
            np.asarray(flat._nodes),
            np.asarray(flat._ref_offsets),
            np.asarray(flat._allele_frequencies))
        ref_idx = ref.CollisionFreeKmerIndex.from_flat_kmers(ref_flat,
                                                             modulo=4099)
        for dense in (False, True):
            kw = dict(kmer_index_with_frequencies=None,
                      use_dense_kmer_finder=dense)
            if dense:
                kw["position_id_index"] = PositionId.from_graph(graph)
            ours = UniqueVariantKmersFinder(
                graph, v2n, vs, k=k,
                kmer_index_with_frequencies=our_idx,
                **{k2: v for k2, v in kw.items()
                   if k2 != "kmer_index_with_frequencies"})
            theirs = ref.unique_variant_kmers.UniqueVariantKmersFinder(
                graph, v2n, vs, k=k,
                kmer_index_with_frequencies=ref_idx,
                **{k2: v for k2, v in kw.items()
                   if k2 != "kmer_index_with_frequencies"})
            a = ours.find_unique_kmers()
            b = theirs.find_unique_kmers()
            for attr in ("_hashes", "_nodes", "_ref_offsets"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, attr)),
                    np.asarray(getattr(b, attr)),
                    err_msg=f"uvk trial={trial} k={k} dense={dense} {attr}")


def test_reference_differential_index_family():
    """ReverseKmerIndex, KmerIndex2 frequencies, KmerCounter,
    CountMinSketch, and KmerFrequencyIndex vs the in-process reference
    on random FlatKmers."""
    import os
    import importlib
    import pytest
    if not os.path.exists("/root/reference"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()
    ref_kc = importlib.import_module("graph_kmer_index.kmer_counter")
    ref_cms = importlib.import_module(
        "graph_kmer_index.count_min_sketch_kmer_counter")
    ref_kfi = importlib.import_module(
        "graph_kmer_index.kmer_frequency_index")

    from graph_kmer_index_tpu import (FlatKmers, ReverseKmerIndex)
    from graph_kmer_index_tpu.flat_kmers import FlatKmers2
    from graph_kmer_index_tpu.models.counters import (
        CountMinSketchKmerCounter, KmerCounter)
    from graph_kmer_index_tpu.models.kmer_index import KmerIndex2

    rng = np.random.default_rng(17)
    for trial in range(3):
        n = 400
        hashes = rng.integers(1, 5000, n).astype(np.int64)
        nodes = rng.integers(1, 60, n).astype(np.uint32)
        offs = rng.integers(0, 2000, n).astype(np.int64)
        af = np.ones(n, np.float32)
        flat = FlatKmers(hashes, nodes, offs, af)

        rev_o = ReverseKmerIndex.from_flat_kmers(flat)
        # int64 copies: the reference's ediff1d(to_begin=<signed>) is
        # not same_kind-castable to unsigned arrays under NumPy 2
        rev_r = ref.ReverseKmerIndex.from_flat_kmers(
            ref.FlatKmers(hashes.copy(), nodes.astype(np.int64),
                          offs.copy(), af.copy()))
        for node in range(60):
            a = sorted(int(x) for x in rev_o.get_node_kmers(node))
            b = sorted(int(x) for x in rev_r.get_node_kmers(node))
            assert a == b, f"reverse node {node}"

        # KmerIndex2 frequencies (distinct (start_node, start_offset))
        f2 = FlatKmers2(hashes.astype(np.uint64), nodes,
                        offs.astype(np.uint16), nodes, af)
        i2_o = KmerIndex2.from_flat_kmers(f2)
        i2_r = ref.KmerIndex2.from_flat_kmers(f2)

        def scalar(v):
            return int(np.atleast_1d(np.asarray(v))[0])

        for h in np.unique(hashes)[:50]:
            assert (scalar(i2_o.get_kmer_frequency(int(h)))
                    == scalar(i2_r.get_kmer_frequency(int(h)))), f"ki2 {h}"

        kc_o = KmerCounter.from_kmers(hashes.astype(np.uint64), 2003)
        kc_r = ref_kc.KmerCounter.from_kmers(hashes.copy(), 2003)
        for h in np.unique(hashes)[:50]:
            assert (kc_o.get_frequency(int(h))
                    == kc_r.get_frequency(int(h))), f"kc {h}"

        cms_o = CountMinSketchKmerCounter.create_empty([101, 103])
        cms_r = ref_cms.CountMinSketchKmerCounter.create_empty([101, 103])
        cms_o.count_kmers(hashes.astype(np.uint64))
        cms_r.count_kmers(hashes.copy())
        for h in np.unique(hashes)[:50]:
            assert (int(cms_o.get_count(np.uint64(h)))
                    == int(cms_r.get_count(int(h)))), f"cms {h}"

        kfi_o = __import__(
            "graph_kmer_index_tpu.models.counters",
            fromlist=["KmerFrequencyIndex"]).KmerFrequencyIndex.from_kmers(
                hashes.astype(np.uint64))
        kfi_r = ref_kfi.KmerFrequencyIndex.from_kmers(hashes.copy())
        # the reference's side='right' get has a documented off-by-one we
        # fix; compare against true counts instead for ours, and only
        # spot-check the reference where its quirk is not triggered
        true = {int(u): int(c) for u, c in
                zip(*np.unique(hashes, return_counts=True))}
        for h in list(true)[:50]:
            assert int(kfi_o.get(np.uint64(h))) == true[h], f"kfi {h}"
