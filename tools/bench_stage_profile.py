"""Per-stage cumulative scaling profile (r4 verdict #7 method).

Runs growing PREFIXES of the KG pipeline (synth → +extract → +link →
+thick → +dedup/full) at 1 and 4 cores, interleaved per prefix so each
(1c, 4c) pair shares box state, and reports per-prefix pair efficiency.
The stage whose MARGINAL time scales worst is where volume-coupled
4-core degradation lives (the r4 500k profile: synth 0.95, extract
0.98, link 0.93, thin→thick 0.87, full 0.92).

Usage: python tools/bench_stage_profile.py [n_docs] [prefix ...]
Appends to BENCH/stage_profile.jsonl.
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
from ldtab_clj_spark.synth import synth_docs, entity_dictionary
from ldtab_clj_spark.operators.extract import extract_thin_triples
from ldtab_clj_spark.operators.link import link_entities
from ldtab_clj_spark.operators.materialize import dedup_statements
from ldtab_clj_spark.operators.stanza import thin_to_thick_df

spark = get_spark("stageprof", master="local[{cores}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.driver.memory": "16g"}})

def prefix_df(name, n_docs):
    docs = synth_docs(spark, n_docs, seed=42, partitions=64)
    if name == "synth":
        return docs
    thin = extract_thin_triples(docs)
    if name == "extract":
        return thin
    linked = link_entities(thin, entity_dictionary(spark))
    if name == "link":
        return linked
    thick = thin_to_thick_df(linked)
    if name == "thick":
        return thick
    return dedup_statements(thick)   # "full"

run_pipeline(spark, n_docs=200, seed=1).count()
t0 = time.perf_counter()
rows = prefix_df("{prefix}", {n_docs}).count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "prefix": "{prefix}",
                   "rows": int(rows), "sec": dt}}))
"""

PREFIXES = ["synth", "extract", "link", "thick", "full"]


def run_once(cores: int, prefix: str, n_docs: int) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, prefix=prefix,
                         n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    prefixes = sys.argv[2:] or PREFIXES
    out_path = REPO / "BENCH" / "stage_profile.jsonl"
    rows = []
    for prefix in prefixes:
        a = run_once(1, prefix, n_docs)
        b = run_once(4, prefix, n_docs)
        eff = (a["sec"] / b["sec"]) / 4
        rec = {"n_docs": n_docs, "prefix": prefix,
               "sec_1c": round(a["sec"], 2), "sec_4c": round(b["sec"], 2),
               "pair_eff": round(eff, 3), "rows": a["rows"],
               "ts": int(time.time())}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
    # marginal per-stage efficiency (stage time = prefix - prev prefix)
    for prev, cur in zip(rows, rows[1:]):
        d1 = cur["sec_1c"] - prev["sec_1c"]
        d4 = cur["sec_4c"] - prev["sec_4c"]
        if d4 > 0:
            print(json.dumps({"stage": cur["prefix"],
                              "marginal_sec_1c": round(d1, 2),
                              "marginal_sec_4c": round(d4, 2),
                              "marginal_eff": round(d1 / d4 / 4, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
