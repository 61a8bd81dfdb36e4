"""Stateful annotation↔statement association (SURVEY.md R9 streaming
variant).

Reference: import.clj:103-140 — a 3-window backlog where a bare triple
waits for a possible annotation before being inserted; annotations
arriving late replace the bare row. Keyed state realization:
``applyInPandasWithState`` keyed by the content key
(graph, subject, predicate, object, datatype):

* an annotated arrival emits immediately (new annotation values only);
* a bare arrival is *held* in state with a processing-time timeout
  (the backlog-depth analog);
* if an annotation for the key arrives while the bare row is held, the
  bare row is dropped (import.clj:199-201 across windows);
* on timeout the bare row is emitted (the reference's tail flush,
  import.clj:80-101).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)

from ..schemas import STATEMENT

STATE_SCHEMA = ("bare_held boolean, assertion bigint, retraction bigint, "
                "emitted_anns string")
BARE_HOLD_MS = 5_000  # how long a bare row waits for its annotation
KEY_COLS = ["graph", "subject", "predicate", "object", "datatype"]
OUT_COLS = [f.name for f in STATEMENT.fields]


def associate_annotations(key: Tuple[Any, ...],
                          pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterable[pd.DataFrame]:
    """Grouped-map-with-state function (pass to applyInPandasWithState
    with outputMode="append", timeoutConf="ProcessingTimeTimeout")."""
    graph, subject, predicate, obj, datatype = key

    def row(assertion, retraction, annotation):
        return {"assertion": assertion, "retraction": retraction,
                "graph": graph, "subject": subject,
                "predicate": predicate, "object": obj,
                "datatype": datatype, "annotation": annotation}

    if state.hasTimedOut:
        bare_held, assertion, retraction, _ = state.get
        state.remove()
        if bare_held:
            yield pd.DataFrame([row(assertion, retraction, None)],
                               columns=OUT_COLS)
        return

    bare_held, assertion, retraction, emitted = \
        state.get if state.exists else (False, 1, 0, "")
    seen = set(emitted.split("\x1e")) if emitted else set()
    out = []
    saw_annotation = False
    for pdf in pdfs:
        for r in pdf.to_dict("records"):
            ann = r.get("annotation")
            if ann:  # emit new annotation values immediately
                saw_annotation = True
                if ann not in seen:
                    seen.add(ann)
                    out.append(row(r["assertion"], r["retraction"], ann))
            else:
                bare_held, assertion, retraction = \
                    True, r["assertion"], r["retraction"]
    if saw_annotation or seen:
        # annotated twin supersedes the bare row — whether it arrived
        # in this batch or any earlier one (the `seen` state)
        bare_held = False
    if bare_held or seen:
        state.update((bare_held, int(assertion), int(retraction),
                      "\x1e".join(sorted(seen))))
        # backlog depth: flush a held bare row after the hold window
        # (the 3-window analog of import.clj:133-139). An annotation
        # arriving even later than this produces a bare+annotated pair
        # in the raw output — the same terminal state as the
        # reference's never-stated-annotation tail insert
        # (import.clj:100-101); table-level dedup-on-read resolves it.
        state.setTimeoutDuration(BARE_HOLD_MS if bare_held else 60_000)
    if out:
        yield pd.DataFrame(out, columns=OUT_COLS)


def with_annotation_association(statement_stream):
    """Wire the stateful operator onto a statement stream."""
    return statement_stream.groupBy(*KEY_COLS).applyInPandasWithState(
        associate_annotations, STATEMENT, STATE_SCHEMA,
        "append", GroupStateTimeout.ProcessingTimeTimeout)
