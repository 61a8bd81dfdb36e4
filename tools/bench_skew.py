"""Skew-resilience benchmark (north rule: "salted repartitioning for
hot-entity skew", SURVEY.md J8).

Runs the pipeline on a uniform-Zipf corpus vs an adversarial corpus
where 70% of all entity mentions hit ONE tail entity (outside the
broadcast head set, so the salted shuffle join takes the hit). Reports
throughput for both; a resilient design degrades gracefully (ratio
near 1) instead of serializing on one reducer.

Usage: python tools/bench_skew.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ldtab_clj_spark.plans.pipeline import build_statements  # noqa: E402
from ldtab_clj_spark.session import get_spark  # noqa: E402
from ldtab_clj_spark.synth import entity_dictionary, synth_docs  # noqa: E402


def run(spark, n_docs: int, hot_frac: float) -> dict:
    docs = synth_docs(spark, n_docs, seed=42, partitions=64,
                      hot_frac=hot_frac)
    t0 = time.perf_counter()
    rows = build_statements(docs, entity_dictionary(spark)).count()
    dt = time.perf_counter() - t0
    return {"hot_frac": hot_frac, "rows": int(rows), "sec": round(dt, 2),
            "rows_per_sec": round(rows / dt, 1)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("skew-bench", master="local[4]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    build_statements(synth_docs(spark, 200, seed=1),
                     entity_dictionary(spark)).count()  # warm
    uniform = run(spark, n_docs, 0.0)
    skewed = run(spark, n_docs, 0.7)
    # same input volume both runs; the skewed corpus yields fewer
    # DISTINCT statements (dedup collapses the hot entity), so wall
    # time on equal input — not output rows/sec — is the resilience
    # metric. slowdown ≈ 1.0 ⇒ the salted join absorbed the skew.
    slowdown = skewed["sec"] / uniform["sec"]
    print(json.dumps({"n_docs": n_docs, "uniform": uniform,
                      "skewed": skewed,
                      "skew_slowdown": round(slowdown, 3)}))


if __name__ == "__main__":
    main()
