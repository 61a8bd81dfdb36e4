"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {name: sec},
"sf": ...}.

The flagship measurement is the full KG-construction pipeline
(synth docs → extract → link → thin→thick → dedup → count) — its
triples/sec is reported alongside (BASELINE.json metric). Scaling
evidence (N vs 4N cores) comes from tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
# docs scale tied to sf: sf0.1 → 20k docs (~500k thin triples)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR \
    else 0.1
N_DOCS = max(int(200_000 * _SF), 500)

HEADLINE = ["tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5",
            "a1_group_collect", "w4_rank_window", "so4_symmetric_diff",
            "dedup_exact", "dedup_minhash_lsh",
            "text_quality", "text_fingerprint", "text_term_stats",
            "events_sessionize", "ann_cosine_topk", "ann_ivf_topk",
            "kg_mention_extract", "kg_roundtrip_reimport",
            "diff_transactions"]


def _simhash_pairs_arrow(spark, sf_dir):
    """SimHash banded pairs via the numpy throughput mode (bit-identical
    to the oracle's mode="sql"; equality pinned by test — the bench
    measures the path you'd run at scale, as with ann_srp_near_dup)."""
    from ldtab_clj_spark.operators.dedup import simhash_pairs
    from ldtab_clj_spark.queries import load
    return simhash_pairs(load(spark, sf_dir, "documents"), mode="arrow")


def _ann_srp_scaled(spark, sf_dir):
    """SRP-LSH near-dup with size-appropriate selectivity: k ≈ log2(N)
    bits per table (the CORRECTNESS entry pins k=3 for the sf0.01
    oracle; at bench scale that candidate volume would be quadratic in
    the per-bucket count — the whole point of k growing with N)."""
    from ldtab_clj_spark.operators.similarity import (srp_banded_near_dup,
                                                      srp_plane_tables)
    from ldtab_clj_spark.queries import load
    emb = load(spark, sf_dir, "embeddings")
    return srp_banded_near_dup(emb, srp_plane_tables(n_tables=8,
                                                     k_planes=8),
                               threshold=0.4, mode="arrow")


def main() -> None:
    from ldtab_clj_spark import queries as q
    from ldtab_clj_spark.plans.pipeline import run_pipeline
    from ldtab_clj_spark.session import get_spark

    spark = get_spark("ldtab-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    timings: dict[str, float] = {}

    # warm the JVM + Python workers (cold-start excluded, as in
    # tools/bench_scaling.py)
    run_pipeline(spark, n_docs=200, seed=1).count()

    def best_of(fn, trials=2):
        """Shared-box spikes (GC, co-tenants) hit single shots hard —
        best-of-2 per query damps them at 2× suite cost."""
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    # flagship: KG pipeline; throughput = statement rows / sec
    n_rows = 0

    def kg():
        nonlocal n_rows
        n_rows = run_pipeline(spark, n_docs=N_DOCS, seed=42).count()

    kg_sec = best_of(kg)
    timings["kg_pipeline"] = round(kg_sec, 3)

    for name in HEADLINE:
        fn = q.QUERIES[name]
        timings[name] = round(
            best_of(lambda: fn(spark, SF_DIR).count()), 3)

    timings["ann_srp_near_dup"] = round(
        best_of(lambda: _ann_srp_scaled(spark, SF_DIR).count()), 3)
    timings["dedup_simhash_pairs"] = round(
        best_of(lambda: _simhash_pairs_arrow(spark, SF_DIR).count()), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "kg_docs": N_DOCS,
        "kg_statements": int(n_rows),
        "kg_triples_per_sec": round(n_rows / kg_sec, 1),
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
