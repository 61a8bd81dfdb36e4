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

def gc_ms():
    # cumulative stop-the-world GC time across all collectors — a
    # DRIFT-INSENSITIVE mechanistic probe: wall seconds swing 2-3x
    # with box state, but gc_sec/wall_sec isolates the GC hypothesis
    beans = (spark.sparkContext._jvm.java.lang.management
             .ManagementFactory.getGarbageCollectorMXBeans())
    return sum(beans.get(i).getCollectionTime()
               for i in range(beans.size()))

run_pipeline(spark, n_docs=200, seed=1).count()
g0, t0 = gc_ms(), time.perf_counter()
rows = run_pipeline(spark, n_docs={n_docs}, seed=42,
                    partitions={parts}).count()
dt = time.perf_counter() - t0
gsec = (gc_ms() - g0) / 1000.0
print(json.dumps({{"rows": int(rows), "sec": dt,
                   "rows_per_sec": rows / dt,
                   "gc_sec": round(gsec, 2),
                   "gc_frac": round(gsec / dt, 4)}}))
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
    # fresh Python worker per task: tests whether the thick stage's
    # volume-coupled 4-core erosion is reused-worker RSS growth /
    # allocator fragmentation over the longer sustained stage
    "noreuse": (64, {"spark.python.worker.reuse": "false"}),
    # spill probe: at 4 concurrent tasks each gets 1/4 of the
    # execution-memory pool; doubling volume at fixed partition count
    # doubles per-task data, so 4c tasks may spill where 1c tasks
    # don't — a volume-coupled 4c-only tax. If 32g recovers the 4c
    # leg, the erosion is sorter/agg spill, not CPU
    "mem32": (64, {"spark.driver.memory": "32g"}),
    "memfrac8": (64, {"spark.memory.fraction": "0.8"}),
    # shuffle files on tmpfs instead of the shared virtio disk: /tmp
    # is ext4 on /dev/vda (host-shared block storage), so 4 concurrent
    # shuffle writers pay host-side block-I/O contention a single
    # writer doesn't — the same mechanism that made zstd (fewer bytes)
    # a 4c-only win. /dev/shm is a 126G tmpfs; on a real cluster this
    # corresponds to provisioning local SSDs for spark.local.dir,
    # which is standard practice
    "shmdir": (64, {"spark.local.dir": "/dev/shm/ldtab-spark-local"}),
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


def duel(n_docs: int, a: str, b: str, pairs: int = 3) -> None:
    """Paired A/B for drifty-box days: run a,b back-to-back ``pairs``
    times and report the per-pair sec ratio (b/a). Adjacent runs share
    box state, so the MEDIAN pair ratio survives drift that makes
    isolated trials incomparable (this matrix's first pass measured
    the same code 132s-324s purely on box swing)."""
    import statistics
    out_path = REPO / "BENCH" / "volume_matrix.jsonl"
    ratios = []
    for i in range(pairs):
        recs = {}
        for name in (a, b) if i % 2 == 0 else (b, a):
            parts, extra = VARIANTS[name]
            r = run_once(n_docs, parts, extra)
            rec = {"variant": name, "n_docs": n_docs, "parts": parts,
                   "pair": i, **r, "ts": int(time.time())}
            recs[name] = rec
            print(json.dumps(rec), flush=True)
            with out_path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        ratios.append(recs[b]["sec"] / recs[a]["sec"])
        print(f"pair {i}: {b}/{a} sec ratio = {ratios[-1]:.3f}",
              flush=True)
    print(json.dumps({"duel": f"{b}_vs_{a}", "n_docs": n_docs,
                      "ratios": [round(x, 3) for x in ratios],
                      "median": round(statistics.median(ratios), 3)}),
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "duel":
        duel(int(sys.argv[2]), sys.argv[3], sys.argv[4],
             int(sys.argv[5]) if len(sys.argv) > 5 else 3)
    else:
        main()
