"""Group-complete Arrow-batch streaming for mapInPandas operators.

A partition that was ``repartition(key).sortWithinPartitions(key)``-ed
arrives in the Python worker as a sequence of Arrow batches in sorted
order, so each key-group is a contiguous run — but a run may straddle a
batch boundary. ``grouped_batches`` re-chunks the stream into frames
that contain only COMPLETE groups by carrying the trailing group over
to the next batch.

Worker memory is O(Arrow batch + largest single group) instead of the
whole-partition ``pd.concat`` it replaces — the difference between a
fat partition OOMing the Python worker at 100× scale and not
(tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` independently of
partition sizing).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd


def grouped_batches(batches: Iterator[pd.DataFrame],
                    key: str) -> Iterator[pd.DataFrame]:
    """Yield frames of complete ``key``-groups from a batch stream whose
    rows are sorted by ``key`` within the partition."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if not len(pdf):
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        # rows are sorted by key → all rows equal to the last key form
        # the trailing run, which may continue in the next batch
        tail = int((pdf[key] == pdf[key].iloc[-1]).sum())
        split = len(pdf) - tail
        # copy: a view would pin the whole source batch in memory
        carry = pdf.iloc[split:].reset_index(drop=True).copy()
        if split:
            yield pdf.iloc[:split]
    if carry is not None and len(carry):
        yield carry
