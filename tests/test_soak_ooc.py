"""Randomized property soak for the out-of-core build machinery.

Mirrors the walker soak's strategy (test_soak_full.py): many random
graphs pushed through randomly drawn out-of-core configurations —
n_ranges, chunk counts, spill passes, column sets, worker counts,
mid-stream crash/resume points — each asserting bit-equality with the
monolithic build. Trials default low for CI; deepen out of band with
  GKI_SOAK_TRIALS=... GKI_SOAK_SEED=... python -m pytest
      tests/test_soak_ooc.py -q
(GKI_SOAK_TRIALS here means trials for THIS soak, divided by ~40 to
keep its per-trial cost comparable to the walker soak's.)
"""
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu import CollisionFreeKmerIndex
from graph_kmer_index_tpu.parallel.host_pool import find_kmers_parallel
from graph_kmer_index_tpu.parallel.oocbuild import (
    SpillWriter, build_shards_from_spills, find_and_build_out_of_core,
    index_from_shard_checkpoint)
from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

TRIALS = max(4, int(os.environ.get("GKI_SOAK_TRIALS", "160")) // 40)
SEED = int(os.environ.get("GKI_SOAK_SEED", "20260821"))


def _assert_equal(a, b, ctx):
    for attr, cast in (("_kmers", np.uint64), ("_nodes", None),
                       ("_ref_offsets", np.uint64),
                       ("_allele_frequencies", np.float32),
                       ("_n_kmers", np.int64),
                       ("_frequencies", np.int64)):
        x = np.asarray(getattr(a, attr))
        y = np.asarray(getattr(b, attr))
        if cast is not None:
            x, y = x.astype(cast), y.astype(cast)
        assert np.array_equal(x, y), (ctx, attr)


def test_soak_ooc_random_configs(tmp_path):
    rng = np.random.default_rng(SEED)
    for trial in range(TRIALS):
        seed = int(rng.integers(0, 1 << 30))
        n_bases = int(rng.integers(1500, 6000))
        n_var = int(rng.integers(10, max(11, n_bases // 60)))
        k = int(rng.choice([5, 7, 11]))
        modulo = int(rng.choice([211, 1009, 4099]))
        graph, _ = random_snp_graph(n_bases, n_var, seed=seed,
                                    indel_fraction=float(rng.random() * 0.5))
        flat = find_kmers_parallel(graph, k, n_workers=1)
        mono = CollisionFreeKmerIndex.from_flat_kmers(
            flat, modulo=modulo, use_device=False)

        n_ranges = int(rng.integers(1, 9))
        n_workers = int(rng.integers(1, 4))
        passes = int(rng.integers(1, 4))
        wd = str(tmp_path / f"t{trial}")
        ctx = dict(trial=trial, seed=seed, k=k, modulo=modulo,
                   n_ranges=n_ranges, n_workers=n_workers, passes=passes)
        res = find_and_build_out_of_core(
            graph, k, n_workers=n_workers, workdir=wd, modulo=modulo,
            n_ranges=n_ranges, n_spill_passes=passes,
            delete_spills=bool(rng.integers(0, 2)))
        assert res["total_rows"] == len(flat), ctx
        _assert_equal(index_from_shard_checkpoint(
            os.path.join(wd, "index")), mono, ctx)

        # crash/resume property: re-spill through a journal truncated
        # at a random point, then rebuild — must still equal monolithic
        d2 = str(tmp_path / f"t{trial}_crash")
        w = SpillWriter(f"{d2}/spill", modulo, n_ranges)
        h = np.asarray(flat._hashes, dtype=np.uint64)
        n_chunks = int(rng.integers(1, 7))
        bounds = np.linspace(0, len(h), n_chunks + 1).astype(int)
        for c in range(n_chunks):
            s = slice(bounds[c], bounds[c + 1])
            w.add_chunk(c, h[s], np.asarray(flat._nodes)[s],
                        np.asarray(flat._ref_offsets)[s],
                        np.asarray(flat._allele_frequencies)[s])
        keep = int(rng.integers(0, n_chunks))
        jp = os.path.join(d2, "spill", "journal.jsonl")
        with open(jp) as f:
            lines = f.readlines()
        with open(jp, "w") as f:
            f.writelines(lines[:keep])
        # torn tail beyond the journal
        with open(os.path.join(
                d2, "spill",
                f"range-{int(rng.integers(0, n_ranges)):05d}.kmers.bin"),
                "ab") as f:
            f.write(b"\xcc" * int(rng.integers(1, 40)))
        w2 = SpillWriter(f"{d2}/spill", modulo, n_ranges)
        for c in range(keep, n_chunks):
            s = slice(bounds[c], bounds[c + 1])
            w2.add_chunk(c, h[s], np.asarray(flat._nodes)[s],
                         np.asarray(flat._ref_offsets)[s],
                         np.asarray(flat._allele_frequencies)[s])
        build_shards_from_spills(f"{d2}/spill", f"{d2}/index")
        _assert_equal(index_from_shard_checkpoint(f"{d2}/index"), mono,
                      {**ctx, "crash_keep": keep})
