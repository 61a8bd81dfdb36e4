"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline (synthesized
interleaved docs → extract → link → thin→thick → dedup) and returns
the statement table. ``queries``/``oracle_sql`` expose the operator
suite of SURVEY.md §2 with DuckDB oracles (see ldtab_clj_spark/queries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _ship_package(spark: SparkSession) -> None:
    from ldtab_clj_spark.session import _package_zip
    spark.sparkContext.addPyFile(_package_zip())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline at smoke scale (sf0.001-equivalent).

    Uses the deterministic synthetic interleaved docs table
    (BASELINE.json input_hint shape) — /root/testdata has no span
    table; documents.parquet there feeds the queries() suite instead.
    """
    _ship_package(spark)
    from ldtab_clj_spark.plans.pipeline import run_pipeline
    return run_pipeline(spark, n_docs=500, seed=42)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ldtab_clj_spark import queries as q

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)
        return run

    if len(q.QUERIES) > q.DRIVER_CAP:
        # a RuntimeError, not assert: python -O would strip an assert
        # and silently revert to the round-3 over-cap rotation this
        # guard exists to prevent
        raise RuntimeError(
            f"driver registry {len(q.QUERIES)} > cap {q.DRIVER_CAP}; "
            "move twins to EXTRA_QUERIES")
    return {name: wrap(fn) for name, fn in q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ldtab_clj_spark import queries as q
    return {k: v for k, v in q.ORACLE_SQL.items() if k in q.QUERIES}
