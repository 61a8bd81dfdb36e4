"""Synthesize an N× scale-probe dataset from an existing sf dir.

Each fact table is an N-way union of id-shifted copies (shift keeps
intra-copy join cardinalities and all content identical, so per-query
work scales like a corpus N× the size); dims are copied as-is. Used by
the r06 optimization round to validate that the per-query wins hold
ABOVE the driver's sf1.0 measurement scale — it exposed the SRP
confirm's quadratic per-pair vector transport (147 s at 4×) before
the driver could.

Usage: python tools/make_scale_probe.py [n=4] [src=/root/testdata/sf1.0]
                                        [dst=/tmp/sf{n}.0]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ldtab_clj_spark.session import get_spark  # noqa: E402

OFF = 1 << 33  # key shift per copy — far above any base id

SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY = ("nation", "region", "supplier", "part")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf{n}.0"
    spark = get_spark("scale-probe-gen",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    for name, idcols in SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = None
        for i in range(n):
            d = df
            for c in idcols:
                d = d.withColumn(c, F.col(c) + F.lit(i * OFF))
            out = d if out is None else out.unionByName(d)
        out.repartition(2 * n).write.mode("overwrite") \
            .parquet(f"{dst}/{name}.parquet")
        print(name, "done")
    for name in COPY:
        spark.read.parquet(f"{src}/{name}.parquet") \
            .write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(name, "copied")


if __name__ == "__main__":
    main()
