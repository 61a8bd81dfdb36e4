"""Per-stage 1c-vs-4c decomposition from Spark event logs (r5).

The string-churn knee control scales 0.92+ at durations and shuffle
volumes matched to the 2M-doc pipeline, so the pipeline's 0.73 at 2M
is pipeline-specific. This tool runs the pipeline once per core count
with spark.eventLog enabled and reports, PER STAGE:

* wall      — stage completion - submission
* task_sum  — summed task run time (the work actually done)
* util      — task_sum / (cores * wall): <1 = scheduler idle /
              straggler tail (last tasks finish while cores sit idle)
* gc, shuffle write/read-fetch, (de)serialize components of task_sum

The discriminating statistic is task_sum INFLATION 1c→4c per stage:
tasks that get slower when 4 run concurrently = genuine resource
contention in that stage (bandwidth, lock, allocator); util drop with
no inflation = scheduling/tail waste. Appends a compact JSON line per
(cores, stage) to BENCH/stage_decompose.jsonl and prints a merged
1c-vs-4c table.

Usage: python tools/bench_stage_decompose.py [n_docs]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from ldtab_clj_spark.session import get_spark
from ldtab_clj_spark.plans.pipeline import run_pipeline
spark = get_spark("decomp", master="local[{cores}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.driver.memory": "16g",
                               "spark.eventLog.enabled": "true",
                               "spark.eventLog.dir": "{evdir}"}})
run_pipeline(spark, n_docs=200, seed=1).count()
t0 = time.perf_counter()
rows = run_pipeline(spark, n_docs={n_docs}, seed=42,
                    partitions=64).count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "rows": int(rows), "sec": dt}}))
spark.stop()
"""


def _event_lines(evdir: Path):
    """Yield event-JSON lines from the newest log. Spark 4 writes
    eventlog v2 as a DIRECTORY of events_* part files; v1 is a single
    file — handle both."""
    logs = sorted(evdir.glob("*"), key=lambda p: p.stat().st_mtime)
    newest = logs[-1]
    parts = (sorted(newest.glob("events_*")) if newest.is_dir()
             else [newest])
    for p in parts:
        if p.suffix == ".zstd":
            # the session's io.compression.codec=zstd also compresses
            # event logs; stream-decompress (files can be large)
            import subprocess as sp
            proc = sp.Popen(["zstd", "-dc", str(p)], stdout=sp.PIPE,
                            text=True)
            yield from proc.stdout
            proc.wait()
        else:
            with p.open() as f:
                yield from f


def parse_eventlog(evdir: Path) -> list[dict]:
    """Aggregate per-stage metrics from the newest event log."""
    stages: dict[int, dict] = defaultdict(lambda: {
        "task_sum": 0.0, "gc": 0.0, "shuf_write": 0.0,
        "fetch_wait": 0.0, "ser": 0.0, "deser": 0.0, "tasks": 0,
        "name": "", "submit": None, "complete": None,
        "in_rows": 0, "out_shuffle_mb": 0.0})
    for line in _event_lines(evdir):
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                s = stages[si["Stage ID"]]
                s["name"] = si["Stage Name"].split()[0]
                s["submit"] = si.get("Submission Time")
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                s = stages[si["Stage ID"]]
                s["name"] = si["Stage Name"].split()[0]
                s["submit"] = si.get("Submission Time") or s["submit"]
                s["complete"] = si.get("Completion Time")
            elif kind == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                s = stages[ev["Stage ID"]]
                s["tasks"] += 1
                s["task_sum"] += m.get("Executor Run Time", 0) / 1e3
                s["gc"] += m.get("JVM GC Time", 0) / 1e3
                s["ser"] += m.get("Result Serialization Time", 0) / 1e3
                s["deser"] += m.get("Executor Deserialize Time", 0) / 1e3
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuf_write"] += sw.get("Shuffle Write Time", 0) / 1e9
                s["out_shuffle_mb"] += sw.get("Shuffle Bytes Written",
                                              0) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                s["fetch_wait"] += sr.get("Fetch Wait Time", 0) / 1e3
                s["in_rows"] += (m.get("Input Metrics", {})
                                 .get("Records Read", 0)
                                 or sr.get("Total Records Read", 0))
    out = []
    for sid, s in sorted(stages.items()):
        if not s["tasks"]:
            continue
        wall = ((s["complete"] - s["submit"]) / 1e3
                if s["complete"] and s["submit"] else None)
        out.append({"stage": sid, "name": s["name"],
                    "tasks": s["tasks"],
                    "wall": round(wall, 2) if wall else None,
                    "task_sum": round(s["task_sum"], 2),
                    "gc": round(s["gc"], 2),
                    "shuf_write": round(s["shuf_write"], 2),
                    "fetch_wait": round(s["fetch_wait"], 2),
                    "deser": round(s["deser"], 2),
                    "in_rows": s["in_rows"],
                    "out_mb": round(s["out_shuffle_mb"], 1)})
    return out


def run_leg(cores: int, n_docs: int) -> tuple[dict, list[dict]]:
    evdir = Path(tempfile.mkdtemp(prefix=f"ldtab_ev{cores}_"))
    code = RUNNER.format(repo=REPO, cores=cores, n_docs=n_docs,
                         evdir=evdir)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    head = json.loads(out.stdout.strip().splitlines()[-1])
    return head, parse_eventlog(evdir)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    log = REPO / "BENCH" / "stage_decompose.jsonl"
    legs = {}
    for cores in (1, 4):
        head, st = run_leg(cores, n_docs)
        legs[cores] = (head, st)
        with log.open("a") as f:
            for s in st:
                f.write(json.dumps({"n_docs": n_docs, "cores": cores,
                                    "leg_sec": round(head["sec"], 2),
                                    **s, "ts": int(time.time())}) + "\n")
        print(json.dumps(head), flush=True)
    # merge by stage order/name for the big-stage comparison: match
    # the N largest stages by task_sum on each side, pair by rank
    for cores, (head, st) in legs.items():
        big = sorted(st, key=lambda s: -s["task_sum"])[:8]
        print(f"-- local[{cores}] leg {head['sec']:.1f}s; "
              "top stages by task_sum:")
        for s in big:
            util = (s["task_sum"] / (cores * s["wall"])
                    if s["wall"] else None)
            print(f"   {s['name'][:28]:28s} tasks={s['tasks']:3d} "
                  f"wall={s['wall']:7.1f} task_sum={s['task_sum']:8.1f} "
                  f"util={util:.2f} gc={s['gc']:6.1f} "
                  f"fetchw={s['fetch_wait']:6.1f} "
                  f"out_mb={s['out_mb']:8.1f}")


if __name__ == "__main__":
    main()
