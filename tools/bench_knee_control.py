"""Thread-knee control (r5): generic shuffle+sort+Python job.

The pipeline's weakest marginal scaler is the thin→thick stage
(repartition → JVM sortWithinPartitions → Arrow → pandas UDF): at 4
cores it keeps ~8 threads busy (4 JVM sort/Arrow + 4 Python workers),
which is exactly the documented knee where this VM's thread scaling
flattens. The r4 pure-Python control (matmul mapInPandas, JVM side
idle) scaled 0.997 — it never reached the knee.

This control reproduces the thick stage's THREAD SHAPE with none of
its code: random rows → repartition(64) → sortWithinPartitions →
mapInPandas(numpy work per batch) → count, at 1 vs 4 cores,
interleaved. If IT lands at ~0.6-0.75 too, the pipeline's residual
4-core deficit at volume is box-typical for this thread shape — on a
real cluster, executor JVM threads and Python workers are provisioned
separate cores and the knee does not exist.

Usage: python tools/bench_knee_control.py [n_rows] [pairs]
Appends to BENCH/knee_control.jsonl.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from ldtab_clj_spark.session import get_spark
from pyspark.sql import functions as F
import pandas as pd, numpy as np

spark = get_spark("knee", master="local[{cores}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.driver.memory": "16g"}})

def job(n):
    df = (spark.range(n)
          .withColumn("k", F.xxhash64("id"))
          .withColumn("payload", F.repeat(F.md5(F.col("id")
                                                .cast("string")), 8)))
    part = df.repartition(64, "k").sortWithinPartitions("k")
    def work(batches):
        w = np.eye(64) * 1.0000001
        for pdf in batches:
            a = np.frombuffer("".join(pdf["payload"]).encode(),
                              dtype=np.uint8).astype(np.float64)
            m = a[: (len(a) // 64) * 64].reshape(-1, 64)
            for _ in range(12):   # python-side weight ~ thick stage's
                m = m @ w
            yield pd.DataFrame({{"s": [float(m.sum())]}})
    return part.mapInPandas(work, "s double").agg(
        F.sum("s").alias("t"))

job(50_000).collect()   # warm
t0 = time.perf_counter()
job({n_rows}).collect()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "sec": dt}}))
"""


def run_once(cores: int, n_rows: int) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, n_rows=n_rows)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = REPO / "BENCH" / "knee_control.jsonl"
    effs = []
    for i in range(pairs):
        a = run_once(1, n_rows)
        b = run_once(4, n_rows)
        eff = round((a["sec"] / b["sec"]) / 4, 3)
        effs.append(eff)
        rec = {"n_rows": n_rows, "pair": i,
               "sec_1c": round(a["sec"], 2),
               "sec_4c": round(b["sec"], 2),
               "pair_eff": eff, "ts": int(time.time())}
        print(json.dumps(rec), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps({"knee_control_effs": effs}), flush=True)


if __name__ == "__main__":
    main()
