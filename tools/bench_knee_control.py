"""Thread-knee control: shuffle+sort+PYTHON-STRING job (r5 rev).

Purpose: decide whether the pipeline's 4-core efficiency erosion at
volume (1M: 0.78-0.82 → 2M: 0.70-0.75) is pipeline code or this
shared VM's thread scaling, by reproducing the thick stage's RESOURCE
SHAPE with none of its code.

The r4 version did numpy matmuls per batch — compute-bound Python,
and it scaled 0.997 at 20M rows: CPU-bound work scales cleanly here,
so that control only falsified "4 threads can't run at 4x". This rev
matches what the stanza stage actually does per row: build Python
dicts/tuples from strings, append to lists, assemble object-dtype
DataFrames — small-allocation churn + memory-bandwidth traffic, the
profile glibc's allocator and the shared LLC actually see. If THIS
control erodes at 4 cores as volume doubles the way the pipeline
does, the erosion is box thread-shape, not pipeline structure — on a
real cluster, N vs 4N EXECUTORS have separate cores, caches, and
allocator arenas, so the knee does not exist.

Structure per trial: spark.range → md5 payload → repartition(64) →
sortWithinPartitions → mapInPandas(string/dict churn) → count, at 1
vs 4 cores, interleaved pairs.

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
import pandas as pd

spark = get_spark("knee", master="local[{cores}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.driver.memory": "16g"}})

def job(n):
    df = (spark.range(n)
          .withColumn("k", F.xxhash64("id"))
          .withColumn("payload",
                      F.concat_ws("-", F.md5(F.col("id").cast("string")),
                                  F.md5(F.concat(F.col("id").cast("string"),
                                                 F.lit("x"))))))
    part = df.repartition(64, "k").sortWithinPartitions("k")

    def work(batches):
        # stanza-shaped churn: per row, split a string, build a dict,
        # accumulate rows, emit object-dtype DataFrames in 20k blocks
        out = []
        for pdf in batches:
            for k, payload in zip(pdf["k"].to_numpy(),
                                  pdf["payload"].to_numpy()):
                a, b = payload.split("-", 1)
                out.append({{"s": a + ":" + b[:8], "p": b[8:16],
                             "o": a[:16] + b[16:24],
                             "n": int(k) & 1023}})
                if len(out) >= 20_000:
                    yield pd.DataFrame(
                        out, columns=["s", "p", "o", "n"])
                    out = []
        if out:
            yield pd.DataFrame(out, columns=["s", "p", "o", "n"])

    return part.mapInPandas(work, "s string, p string, o string, n long")

job(50_000).count()   # warm
t0 = time.perf_counter()
rows = job({n_rows}).count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "rows": int(rows), "sec": dt}}))
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
        rec = {"n_rows": n_rows, "kind": "string-churn", "pair": i,
               "sec_1c": round(a["sec"], 2),
               "sec_4c": round(b["sec"], 2),
               "pair_eff": eff, "ts": int(time.time())}
        print(json.dumps(rec), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps({"knee_control_effs": effs}), flush=True)


if __name__ == "__main__":
    main()
