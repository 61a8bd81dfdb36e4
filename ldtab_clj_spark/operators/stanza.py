"""Stage 3 — stanza assembly: thin triples → thick statement rows.

The grouped realization of thin-2-thick (SURVEY.md R1-R8,
thin2thick.clj:302-333). Blank-node components are document-local by
construction (extract.py), so one hash shuffle on doc_id co-locates
every stanza; the rewrite chain runs inside an Arrow-batched
``mapInPandas`` over the repartitioned data with a *pandas groupby*
per partition, not ``applyInPandas`` — same semantics, but per-group
dispatch happens in C instead of one Python/Arrow round trip per
document (20k tiny groups made applyInPandas the pipeline bottleneck).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.thick import thin_to_thick, to_statement_row
from ..schemas import STATEMENT

_THIN_COLS = ["subject", "predicate", "object", "datatype",
              "is_blank_s", "is_blank_o"]
_OUT_COLS = [f.name for f in STATEMENT.fields]
_EMIT_EVERY = 20_000  # rows per yielded Arrow batch


def _partition_stanzas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # a doc's triples all live in this partition (hash-partitioned by
    # doc_id) but may span Arrow batches — concat before grouping
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    pdf = pdf.sort_values(["doc_id", "span_order", "subject", "predicate",
                           "object", "datatype"], kind="mergesort")
    # zip over raw column arrays + run-length grouping on the sorted
    # doc_id column: ~5× cheaper than pandas per-group dispatch
    cols = [pdf[c].to_numpy() for c in ("doc_id", *_THIN_COLS)]
    out: list[dict] = []
    cur_doc, triples = None, []

    def flush():
        out.extend(to_statement_row(t) for t in thin_to_thick(triples))

    for doc_id, s, p, o, dt, bs, bo in zip(*cols):
        if doc_id != cur_doc:
            if triples:
                flush()
            cur_doc, triples = doc_id, []
        triples.append({"subject": s, "predicate": p, "object": o,
                        "datatype": dt, "is_blank_s": bs,
                        "is_blank_o": bo})
        if len(out) >= _EMIT_EVERY:
            yield pd.DataFrame(out, columns=_OUT_COLS)
            out = []
    if triples:
        flush()
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLS)


def thin_to_thick_df(thin: DataFrame,
                     partitions: int | None = None) -> DataFrame:
    """Thin triples (linked) → statement rows. One shuffle on doc_id."""
    df = thin.repartition(partitions, "doc_id") if partitions \
        else thin.repartition(F.col("doc_id"))
    return df.mapInPandas(_partition_stanzas, STATEMENT)
