"""Scan-width adaptation for per-row-expensive stages.

A parquet scan parallelizes at ROW-GROUP granularity: a table written
as one file with one row group yields ONE scan task no matter how many
cores the session has, and everything between the scan and the first
exchange (shingle explodes + md5 signatures, mapInPandas banding,
interpreted folds) runs serially. Measured on the r06 bench inputs:
documents/embeddings/events at sf1.0 are single-row-group files, so
the md5/Python stanzas of the dedup/ANN/text operators ran on 1 of 32
cores.

``widen_partitions`` repartitions a relation up to the session's
default parallelism ONLY when the upstream plan under-parallelizes it
(fewer partitions than cores). The round-robin exchange moves just the
projected columns (a few MB here), and REPARTITION_BY_NUM is exempt
from AQE coalescing, so the width sticks (the round-5 rule: pin width
where cost is per-row, keep AQE where cost is per-byte). At scale a
100 TB scan already has orders of magnitude more splits than cores, so
the guard makes this a no-op there — the knob adapts to input size
instead of hard-coding either deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when
    (and only when) the current plan has fewer partitions — a no-op on
    inputs that are already wide. With ``keys``, the exchange is
    hash-partitioned on them instead of round-robin: a downstream
    aggregation/window keyed the same way is then already satisfied,
    so the widen MOVES that exchange below the per-row-expensive
    segment rather than adding one."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys \
        else df.repartition(target)
