"""Two-chromosome acceptance: the REAL ingestion path at scale.

Unlike bench_chromosome.py (which constructs the variant graph
directly), this run goes through the same front door a user does —
a generated FASTA with TWO chromosome records plus a VCF at ~1
variant/250 bp (10% indels) — exercising the FASTA reader, the VCF
reader's variant stream, graph construction with per-chromosome start
nodes (reference obgraph construction + command_line_interface.py
make_graph), chromosome-offset PositionId conversion, the pooled find,
the device index build at the production modulo, and read mapping with
reads drawn from BOTH chromosomes. Sampled find windows are checked
bit-equal against the in-process reference finder.

Prints one JSON record per stage. CPU fallback while the TPU relay is
down; re-run under the default env on chip:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/bench_two_chromosomes.py [bases_per_chrom] \
          [variants_per_chrom] [n_reads]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def _write_inputs(tmp, bases_per_chrom, variants_per_chrom, rng):
    """Synthetic 2-chromosome FASTA + VCF (bi-allelic SNPs + 10%
    insertion/deletion records at realistic density)."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa_path = os.path.join(tmp, "ref.fa")
    vcf_path = os.path.join(tmp, "v.vcf")
    seqs = {}
    with open(fa_path, "w") as fa:
        for chrom in ("1", "2"):
            seq = bases[rng.integers(0, 4, bases_per_chrom)]
            seqs[chrom] = seq.tobytes().decode()
            fa.write(f">{chrom}\n")
            s = seqs[chrom]
            for i in range(0, len(s), 10_000_000):
                fa.write(s[i:i + 10_000_000] + "\n")
    letters = "ACGT"
    with open(vcf_path, "w") as vcf:
        vcf.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\n")
        for chrom in ("1", "2"):
            spacing = bases_per_chrom // variants_per_chrom
            s = seqs[chrom]
            for v in range(variants_per_chrom):
                # 1-based POS, away from record edges
                pos = v * spacing + spacing // 2
                if pos < 2 or pos + 6 >= bases_per_chrom:
                    continue
                ref_base = s[pos - 1]
                kind = rng.random()
                if kind < 0.9:  # SNP
                    alt = letters[(letters.index(ref_base)
                                   + int(rng.integers(1, 4))) % 4]
                    vcf.write(f"{chrom}\t{pos}\t.\t{ref_base}\t{alt}\n")
                elif kind < 0.95:  # insertion (anchored, VCF style)
                    ins = "".join(letters[i] for i in rng.integers(0, 4, 3))
                    vcf.write(f"{chrom}\t{pos}\t.\t{ref_base}\t"
                              f"{ref_base}{ins}\n")
                else:  # deletion of 3 bases
                    refa = s[pos - 1: pos + 3]
                    vcf.write(f"{chrom}\t{pos}\t.\t{refa}\t{ref_base}\n")
    return fa_path, vcf_path


def main():
    bases_per_chrom = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    variants_per_chrom = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    n_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    modulo = 452_930_477
    k = 31

    import jax
    import jax.numpy as jnp

    from graph_kmer_index_tpu import KmerIndex
    from graph_kmer_index_tpu.critical_paths import CriticalGraphPaths
    from graph_kmer_index_tpu.finder import DenseKmerFinder
    from graph_kmer_index_tpu.graph import PositionId
    from graph_kmer_index_tpu.graph_builder import build_graph_from_files
    from graph_kmer_index_tpu.parallel.host_pool import (
        find_kmers_parallel_device)

    backend = jax.default_backend()
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        fa, vcf = _write_inputs(tmp, bases_per_chrom, variants_per_chrom,
                                rng)
        rec("input_generation", round(time.perf_counter() - t0, 1), "s",
            n_bases=2 * bases_per_chrom,
            n_variants=2 * variants_per_chrom, backend=backend)

        t0 = time.perf_counter()
        graph, v2n = build_graph_from_files(fa, vcf)
        rec("graph_from_fasta_vcf", round(time.perf_counter() - t0, 1), "s",
            n_nodes=graph.n_nodes(), n_variant_pairs=len(v2n),
            n_chromosomes=len(graph.chromosome_start_nodes))
        assert len(graph.chromosome_start_nodes) == 2

    t0 = time.perf_counter()
    cpaths = CriticalGraphPaths.from_graph(graph, k)
    position_id = PositionId.from_graph(graph)
    rec("critical_paths", round(time.perf_counter() - t0, 1), "s",
        n_paths=len(cpaths))

    t0 = time.perf_counter()
    flat = find_kmers_parallel_device(
        graph, k, n_workers=4, critical_paths=cpaths,
        position_id=position_id,
        stream_rows_target=24_000_000, stream_tape_target=24_000_000)
    float(jnp.sum(flat._hashes[:1].astype(jnp.float32)))  # scalar sync
    t_find = time.perf_counter() - t0
    n_rows = len(flat._hashes)
    rec("find_streamed_finalize", round(t_find, 1), "s", rows=n_rows,
        rows_per_s=round(n_rows / t_find))

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from accept_common import (choose_map_backend, read_mapping_stage,
                               sync_index_arrays)

    t0 = time.perf_counter()
    index = KmerIndex.from_flat_kmers(flat, modulo=modulo)
    sync_index_arrays(index)
    t_build = time.perf_counter() - t0
    rec("device_index_build", round(t_build, 1), "s", modulo=modulo,
        rows_per_s=round(n_rows / t_build))

    # read mapping (shared stage): reads drawn from BOTH chromosomes
    _, _, refseq = graph.linear_ref_sequence()
    map_backend = choose_map_backend(index, backend)
    t_map, hits, n_q = read_mapping_stage(
        index, graph, refseq, rng, n_reads, k, map_backend)
    rec("read_mapping", round(t_map, 1), "s", n_read_kmers=n_q,
        hits_per_query=round(hits / n_q, 2), map_backend=map_backend)

    # sampled-window bit-equality vs the in-process reference finder,
    # including windows from the SECOND chromosome (offset conversion)
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from reference_harness import load_reference
    ref = load_reference()
    ref_cpaths = ref.CriticalGraphPaths.from_graph(graph, k)
    n_paths = len(cpaths)
    ok = 0
    rng2 = np.random.default_rng(7)
    hi = max(2, n_paths - 40)  # small smoke sizes: keep low < high
    picks = sorted(set(
        rng2.integers(0, hi, 2).tolist()
        + rng2.integers(min(n_paths // 2, hi - 1), hi, 2).tolist()))
    for start in picks:
        stop = min(n_paths, start + 40)
        fr = ref.DenseKmerFinder(
            graph, k=k, critical_graph_paths=ref_cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop)
        fr.find()
        rflat = fr.get_flat_kmers(v="1")
        fo = DenseKmerFinder(
            graph, k, critical_graph_paths=cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop)
        fo.find()
        oflat = fo.get_flat_kmers(v="1")
        assert np.array_equal(np.asarray(rflat._hashes),
                              np.asarray(oflat._hashes)), start
        assert np.array_equal(np.asarray(rflat._nodes),
                              np.asarray(oflat._nodes)), start
        assert np.array_equal(np.asarray(rflat._ref_offsets),
                              np.asarray(oflat._ref_offsets)), start
        ok += 1
    rec("subregion_bit_equality", ok, "regions", ok=True)

    rec("two_chromosome_acceptance", 2 * bases_per_chrom, "bases",
        rows=n_rows, backend=backend, ok=True)


if __name__ == "__main__":
    main()
