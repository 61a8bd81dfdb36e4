"""lz4-vs-zstd A/B on the local[32] small-query suite (r4 verdict #4).

The zstd session default was tuned on the 4-core VOLUME harness
(bench_scaling.py: 4-core leg 77.5s lz4 → 63.7s zstd at 1M docs) but
never A/B'd on the many-small-queries local[32] bench.py suite, whose
shuffles are tiny and latency-bound — the regime where zstd's higher
per-block CPU could lose. This runs the full bench suite in separate
JVMs, INTERLEAVED (zstd, lz4, zstd, lz4) so both codecs sample the
same box phase, and reports suite seconds + control levels per draw.

Usage: python tools/bench_codec_ab.py [pairs]
Appends to BENCH/codec_ab.jsonl.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys
sys.path.insert(0, "{repo}")
import bench
from ldtab_clj_spark.session import get_spark
spark = get_spark("codec-ab", master=f"local[{{bench.CPUS}}]",
                  shuffle_partitions=max(bench.CPUS, 16),
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.io.compression.codec": "{codec}"}})
print(json.dumps(bench.run_suite(spark)))
"""


def run_once(codec: str) -> dict:
    code = RUNNER.format(repo=REPO, codec=codec)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    log = REPO / "BENCH" / "codec_ab.jsonl"
    for pair in range(pairs):
        for codec in ("zstd", "lz4"):
            r = run_once(codec)
            row = {"codec": codec, "pair": pair,
                   "suite_sec": r["value"],
                   "kg_sec": r["queries"]["kg_pipeline"],
                   "kg_triples_per_sec": r["kg_triples_per_sec"],
                   "control_secs": r["control_secs"],
                   "contaminated": r["contaminated"],
                   "queries": r["queries"],
                   "ts": int(time.time())}
            print(json.dumps({k: v for k, v in row.items()
                              if k != "queries"}), flush=True)
            with log.open("a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
