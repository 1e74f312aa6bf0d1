"""Genome-scale out-of-core build acceptance (VERDICT r4 item 2).

Drives the full bounded-memory pipeline — pooled find (worker-side
spill) → per-range shard build → shard-checkpoint serving. Run at
1 Gb (full columns), 2 Gb (full columns) and the reference's own
3 Gb default (`--genome-size`, command_line_interface.py:261) with
the serving columns (`cols=kn`): logs_r5_ooc_{1gb,2gb,3gb}.jsonl.
Peak HOST MEMORY is ~graph + rows/n_ranges regardless of genome size,
which is the point.

Evidence captured per stage (one JSON record each):
  * wall time + rates for graph/find+spill/build,
  * peak RSS of the driver, its find workers, and the whole box —
    demonstrating the build never holds the row set in memory,
  * disk high-water marks for the spill and checkpoint,
  * sampled-window find bit-equality vs the in-process reference,
  * an INDEPENDENT audit of two shards: their kept spill ranges are
    re-derived with a different grouping code path (lexsort +
    np.unique) and compared to the shard files bit-for-bit,
  * a serving check: sampled known-present + random kmers answered
    from the checkpoint (per-shard host lookup) against ground truth
    collected during the audit.

Run (CPU fallback; on-chip rerun when the relay returns):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/bench_ooc_1gb.py [n_bases] [n_variants] \
          [workdir] [n_ranges] [cols: full|kn]
"""
from __future__ import annotations

import json
import os
import pathlib
import resource
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))



def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def rss_gb():
    self_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    child_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    return round(self_mb, 2), round(child_mb, 2)


class BoxSampler(threading.Thread):
    """Max of (MemTotal - MemAvailable) and the workdir's disk usage,
    sampled every 2 s — the honest whole-box high-water marks."""

    def __init__(self, workdir):
        super().__init__(daemon=True)
        self.workdir = workdir
        self.max_used_gb = 0.0
        self.max_disk_gb = 0.0
        self._halt = threading.Event()

    def _mem_used_gb(self):
        with open("/proc/meminfo") as f:
            d = {line.split(":")[0]: int(line.split()[1])
                 for line in f if ":" in line}
        return (d["MemTotal"] - d["MemAvailable"]) / 1e6

    def _disk_gb(self):
        total = 0
        for root, _, files in os.walk(self.workdir):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return total / 1e9

    def run(self):
        while not self._halt.is_set():
            try:
                self.max_used_gb = max(self.max_used_gb,
                                       self._mem_used_gb())
                self.max_disk_gb = max(self.max_disk_gb, self._disk_gb())
            except Exception:
                pass
            self._halt.wait(2.0)

    def stop(self):
        self._halt.set()


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/root/ooc_run"
    n_ranges = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spill_cols = sys.argv[5] if len(sys.argv) > 5 else "full"
    modulo = 452_930_477
    global AUDIT_RANGES
    AUDIT_RANGES = (0, min(17, n_ranges - 1))
    k = 31

    import jax

    from graph_kmer_index_tpu.critical_paths import CriticalGraphPaths
    from graph_kmer_index_tpu.finder import DenseKmerFinder
    from graph_kmer_index_tpu.parallel.oocbuild import (
        SpillWriter, _load_spill_range, _m_range,
        find_and_build_out_of_core)
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    os.makedirs(workdir, exist_ok=True)
    sampler = BoxSampler(workdir)
    sampler.start()
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    graph, _ = random_snp_graph(n_bases, n_variants, seed=0,
                                indel_fraction=0.1)
    rec("graph_build", round(time.perf_counter() - t0, 1), "s",
        n_bases=n_bases, n_variants=n_variants, n_nodes=graph.n_nodes(),
        backend=jax.default_backend())

    t0 = time.perf_counter()
    cpaths = CriticalGraphPaths.from_graph(graph, k)
    rec("critical_paths", round(time.perf_counter() - t0, 1), "s",
        n_paths=len(cpaths))

    # find + spill + per-range build, spills deleted as shards land
    # (except the two audit ranges)
    t0 = time.perf_counter()
    res = find_and_build_out_of_core(
        graph, k, n_workers=4, workdir=workdir, modulo=modulo,
        n_ranges=n_ranges, critical_paths=cpaths,
        delete_spills=True, keep_ranges=AUDIT_RANGES,
        spill_cols=spill_cols, max_variant_nodes=4)
    t_pipe = time.perf_counter() - t0
    self_gb, child_gb = rss_gb()
    rows = res["total_rows"]
    rec("ooc_find_spill_build", round(t_pipe, 1), "s", rows=rows,
        rows_per_s=round(rows / t_pipe), n_ranges=n_ranges,
        modulo=modulo, max_scan=res["max_scan"])
    rec("peak_memory", round(sampler.max_used_gb, 2), "GB_box_used",
        driver_maxrss_gb=self_gb, workers_maxrss_gb=child_gb,
        rows_in_one_piece_gb=round(rows * 26 / 1e9, 1),
        note="box high-water vs what a monolithic build would hold")
    rec("peak_disk", round(sampler.max_disk_gb, 2), "GB",
        note="spill + checkpoint high-water in workdir")

    # -- sampled-window find bit-equality vs the reference ----------------
    from reference_harness import load_reference
    ref = load_reference()
    ref_cpaths = ref.CriticalGraphPaths.from_graph(graph, k)
    n_paths = len(cpaths)
    rng2 = np.random.default_rng(7)
    hi = max(2, n_paths - 40)
    picks = sorted(set(rng2.integers(0, hi, 3).tolist()))
    ok = 0
    for start in picks:
        stop = min(n_paths, start + 40)
        fr = ref.DenseKmerFinder(
            graph, k=k, critical_graph_paths=ref_cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop, max_variant_nodes=4)
        fr.find()
        rflat = fr.get_flat_kmers(v="1")
        fo = DenseKmerFinder(
            graph, k, critical_graph_paths=cpaths,
            start_at_critical_path_number=start,
            stop_at_critical_path_number=stop, max_variant_nodes=4)
        fo.find()
        oflat = fo.get_flat_kmers(v="1")
        for a in ("_hashes", "_nodes", "_ref_offsets"):
            assert np.array_equal(np.asarray(getattr(rflat, a)),
                                  np.asarray(getattr(oflat, a))), (start, a)
        ok += 1
    rec("subregion_bit_equality", ok, "regions", ok=True)

    # -- independent shard audit ------------------------------------------
    # Re-derive the audit ranges' CSR with a DIFFERENT code path
    # (lexsort + np.unique instead of stable argsort + ediff1d) from the
    # kept spills, and compare to the shard files bit-for-bit.
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    m_range = _m_range(modulo, n_ranges)
    spill_dir = os.path.join(workdir, "spill")
    prefix = os.path.join(workdir, "index")
    with np.load(ckpt.manifest_path(prefix)) as z:
        shard_rows = z["shard_rows"].astype(np.int64)
    ground_truth = {}
    t0 = time.perf_counter()
    for t in AUDIT_RANGES:
        nt = int(shard_rows[t])
        # reconstruct the writer from the spill meta (worker-spill runs
        # use the per-(chunk,range) layout; segments stitch chunk order)
        import json as _json
        with open(os.path.join(spill_dir, "meta.json")) as f:
            smeta = _json.load(f)
        from graph_kmer_index_tpu.parallel.oocbuild import _COL_DTYPES
        w = SpillWriter(
            spill_dir, smeta["modulo"], smeta["n_ranges"],
            pins=smeta.get("pins") or {},
            cols=tuple((c, _COL_DTYPES[c]) for c in smeta["cols"]),
            m_range=smeta.get("m_range"),
            layout=smeta.get("layout", "range"))
        segs = w.range_segments(t) if w.layout == "chunk" else None
        loaded = _load_spill_range(spill_dir, t, nt, cols=w.cols,
                                   segs=segs)
        kmers, nodes = loaded[0], loaded[1]
        refs, afs = (loaded[2], loaded[3]) if len(loaded) > 2 \
            else (None, None)
        bucket = (kmers % np.uint64(modulo)).astype(np.int64) - t * m_range
        order = np.lexsort((np.arange(nt), bucket))
        ub, counts = np.unique(bucket[order], return_counts=True)
        starts_i = np.zeros(m_range, np.int64)
        sizes_i = np.zeros(m_range, np.int32)
        starts_i[ub] = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sizes_i[ub] = counts
        with np.load(ckpt.shard_path(prefix, t, n_ranges)) as z:
            assert np.array_equal(z["sizes"], sizes_i), t
            nz = sizes_i > 0
            assert np.array_equal(z["starts"][nz], starts_i[nz]), t
            assert np.array_equal(z["row_kmers"][:nt], kmers[order]), t
            assert np.array_equal(z["row_nodes"][:nt], nodes[order]), t
            if refs is not None:
                assert np.array_equal(z["row_ref_offsets"][:nt],
                                      refs[order]), t
                assert np.array_equal(z["row_afs"][:nt], afs[order]), t
        ground_truth[t] = (kmers, nodes)
    rec("independent_shard_audit", round(time.perf_counter() - t0, 1),
        "s", shards=list(AUDIT_RANGES),
        audited_rows=int(sum(shard_rows[t] for t in AUDIT_RANGES)),
        ok=True)

    # -- serving check from the checkpoint --------------------------------
    # counts for known-present + random kmers via one audited shard's CSR
    t0 = time.perf_counter()
    t = AUDIT_RANGES[1]
    kmers_t, nodes_t = ground_truth[t]
    qs = np.concatenate([
        np.random.default_rng(3).choice(kmers_t, 50_000),
        np.random.default_rng(4).integers(0, 1 << 62, 50_000,
                                          dtype=np.uint64)])
    own = ((qs % np.uint64(modulo)).astype(np.int64) // m_range) == t
    expect = np.zeros(len(qs), np.int64)
    sub = qs[own]
    # ground truth by brute force against the kept spill rows
    srt = np.sort(kmers_t)
    lo = np.searchsorted(srt, sub, "left")
    hi2 = np.searchsorted(srt, sub, "right")
    expect[own] = hi2 - lo
    with np.load(ckpt.shard_path(prefix, t, n_ranges)) as z:
        starts_t = z["starts"]
        sizes_t = z["sizes"]
        rk = z["row_kmers"]
    got = np.zeros(len(qs), np.int64)
    b = (qs[own] % np.uint64(modulo)).astype(np.int64) - t * m_range
    gots = []
    for q, bb in zip(qs[own], b):
        s, n = int(starts_t[bb]), int(sizes_t[bb])
        gots.append(int(np.sum(rk[s:s + n] == q)))
    got[own] = gots
    assert np.array_equal(got, expect), "served counts diverge"
    rec("checkpoint_serve_audit", round(time.perf_counter() - t0, 1),
        "s", n_queries=len(qs), owned=int(own.sum()),
        hits=int(expect.sum()), ok=True)

    sampler.stop()
    rec("ooc_acceptance", n_bases, "bases", rows=rows,
        total_s=round(time.perf_counter() - t_all, 1),
        n_ranges=n_ranges, columns=spill_cols, ok=True)


if __name__ == "__main__":
    main()
