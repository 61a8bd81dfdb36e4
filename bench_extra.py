"""Round-6 optimization harness (bench.py is FROZEN — this file holds
the extra measurements the optimization round needs).

Per-query isolation timing with the same session + methodology as
bench.py (best-of-N ``.count()``), plus:

* ``--noop``    time with the noop sink (computes every column —
                guide §1.4) instead of ``.count()``;
* ``--explain`` capture ``.explain("formatted")`` to
                ``plans/r06/<query>_<tag>.txt``;
* ``--trials``  best-of-N (default 3);
* ``--sf``      data dir (default $SPARK_GRAFT_SF_DIR or
                /root/testdata/sf1.0 — the driver's round-5
                measurement scale).

Usage:
    python bench_extra.py [--sf DIR] [--noop] [--trials N]
                          [--explain TAG] [query ...]
Prints one JSON line per query; job descriptions are set so the UI /
event log attributes stages (guide §1.5).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r06"


def _bench_queries(sf: str):
    """The exact fn set bench.py times (HEADLINE + kg_pipeline + the
    scaled SRP entry), resolved through the same registry."""
    import bench
    from ldtab_clj_spark import queries as q
    from ldtab_clj_spark.plans.pipeline import run_pipeline

    sf_num = float(sf.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf else 0.1
    n_docs = max(int(200_000 * sf_num), 500)

    fns = {}

    def kg(spark):
        return run_pipeline(spark, n_docs=n_docs, seed=42,
                            partitions=max(CPUS, 16))
    fns["kg_pipeline"] = kg
    for name in bench.HEADLINE:
        fns[name] = (lambda fn: lambda spark: fn(spark, sf))(
            q.ALL_QUERIES[name])
    fns["ann_srp_near_dup"] = lambda spark: bench._ann_srp_scaled(spark, sf)
    # non-HEADLINE driver entries worth watching (correctness-path cost)
    for name in ("kg_pipeline_statements", "dedup_minhash_clusters",
                 "text_winnow", "dedup_boilerplate", "events_hourly_window",
                 "tpch_q13", "tpch_q16", "tpch_q19", "tpch_q22",
                 "so4_symmetric_diff", "so5_state_at_t", "a8_get_type"):
        if name not in fns:
            fns[name] = (lambda fn: lambda spark: fn(spark, sf))(
                q.ALL_QUERIES[name])
    return fns


def main() -> None:
    args = sys.argv[1:]
    sf, trials, noop, tag = DEFAULT_SF, 3, False, None
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--trials":
            trials = int(next(it))
        elif a == "--noop":
            noop = True
        elif a == "--explain":
            tag = next(it)
        else:
            names.append(a)

    from ldtab_clj_spark.session import get_spark
    spark = get_spark("ldtab-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    fns = _bench_queries(sf)
    if names:
        fns = {n: fns[n] for n in names}

    # warm the JVM + Python workers exactly like bench.py
    from ldtab_clj_spark.plans.pipeline import run_pipeline
    run_pipeline(spark, n_docs=200, seed=1).count()

    if tag:
        PLANS_DIR.mkdir(parents=True, exist_ok=True)

    for name, fn in fns.items():
        if tag:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark).explain("formatted")
            (PLANS_DIR / f"{name}_{tag}.txt").write_text(buf.getvalue())
        secs = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # construction INSIDE the timed region, exactly like
            # bench.py's best_of(lambda: fn(spark, SF_DIR).count()) —
            # some queries do eager work at build time (IVF centroid
            # collect, cluster localCheckpoint)
            t0 = time.perf_counter()
            df = fn(spark)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            secs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "sf": sf, "best": min(secs),
                          "secs": secs, "mode": "noop" if noop else "count"}),
              flush=True)


if __name__ == "__main__":
    main()
