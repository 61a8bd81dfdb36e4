"""Config matrix for the VOLUME-degrading leg (r4 verdict #1).

The 2M-doc probe sits at 0.75 efficiency because the 4-core leg
degrades ~12% vs 1M while the 1-core leg holds; cause identified as
GC/shuffle-volume growth. This harness A/Bs candidate fixes on the
4-core leg ONLY (the degrading one) at a given doc count, one JVM per
trial, same method as the r4 codec matrix that found zstd.

Usage: python tools/bench_volume_matrix.py [n_docs] [variant ...]
Variants default to the full matrix; results append to
BENCH/volume_matrix.jsonl.
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
from ldtab_clj_spark.plans.pipeline import run_pipeline
spark = get_spark("volmatrix", master="local[4]",
                  shuffle_partitions={parts},
                  extra_conf={extra!r})
run_pipeline(spark, n_docs=200, seed=1).count()
t0 = time.perf_counter()
rows = run_pipeline(spark, n_docs={n_docs}, seed=42,
                    partitions={parts}).count()
dt = time.perf_counter() - t0
print(json.dumps({{"rows": int(rows), "sec": dt,
                   "rows_per_sec": rows / dt}}))
"""

BASE = {"spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "16g"}

VARIANTS = {
    # control: exactly the bench_scaling.py configuration
    "base": (64, {}),
    # per-partition shuffle bytes double at 2M under fixed 64 parts;
    # scaling parts with volume keeps sort buffers/spills at 1M size
    "parts128": (128, {}),
    "parts192": (192, {}),
    # batch job: GC PAUSES don't matter, only GC CPU — ParallelGC
    # trades pause predictability for throughput vs the G1 default
    "pgc": (64, {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}),
    "parts128_pgc": (128, {"spark.driver.extraJavaOptions":
                           "-XX:+UseParallelGC"}),
    # bigger shuffle write buffer: fewer flush syscalls per file at
    # the larger shuffle volume
    "filebuf1m": (64, {"spark.shuffle.file.buffer": "1m"}),
    "parts128_filebuf1m": (128, {"spark.shuffle.file.buffer": "1m"}),
}


def run_once(n_docs: int, parts: int, extra: dict) -> dict:
    conf = {**BASE, **extra}
    code = RUNNER.format(repo=REPO, parts=parts, extra=conf,
                         n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    names = sys.argv[2:] or list(VARIANTS)
    out_path = REPO / "BENCH" / "volume_matrix.jsonl"
    for name in names:
        parts, extra = VARIANTS[name]
        r = run_once(n_docs, parts, extra)
        rec = {"variant": name, "n_docs": n_docs, "parts": parts,
               **r, "ts": int(time.time())}
        print(json.dumps(rec), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
