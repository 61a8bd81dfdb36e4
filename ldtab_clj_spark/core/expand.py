"""Thick→thin expansion — the generic export path used for round-trip
verification (``ldtab export`` to Turtle).

Reference: /root/reference/src/ldtab/thick_rdf.clj:66-138 (predicate-map
/ list / annotation expansion), :162-193 (wiring-blanknode merge),
:195-215 (row driver incl. JSON subjects / dropped wiring base triples).

Instead of a Jena model we emit thin-triple dicts (the same shape
``core.thick`` consumes), with deterministic content-derived blank
labels so the expansion is reproducible across executors.
"""

from __future__ import annotations

import json
from typing import Any

from .canonical import content_hash, is_wiring_blanknode


def parse_json_tolerant(value: Any) -> Any:
    """Parse; fall back to the raw string for plain IRIs/literals
    (thick_rdf.clj:140-151 — only dict/list parses count)."""
    if not isinstance(value, str):
        return value
    try:
        parsed = json.loads(value)
    except (ValueError, TypeError):
        return value
    return parsed if isinstance(parsed, (dict, list)) else value


class _Expander:
    """Per-row expansion state: emits thin triples, mints deterministic
    blank labels ``_:h<rowhash>n<counter>``."""

    def __init__(self, row_key: str):
        self.triples: list[dict] = []
        self.row_hash = content_hash(row_key)
        self.counter = 0

    def fresh_blank(self) -> str:
        self.counter += 1
        return f"_:h{self.row_hash}n{self.counter}"

    def emit(self, s: str, p: str, o: str, datatype: str) -> None:
        self.triples.append({
            "subject": s, "predicate": p, "object": o,
            "datatype": datatype,
            "is_blank_s": s.startswith("_:"),
            "is_blank_o": datatype == "_JSONMAP" and o.startswith("_:"),
        })

    def predicate_map(self, pmap: dict) -> str:
        """thick_rdf.clj:66-75 — a JSON predicate map becomes a fresh
        blank node with one triple per (predicate, leaf)."""
        bnode = self.fresh_blank()
        for pred, leaves in pmap.items():
            for leaf in leaves:
                obj, dt = self.leaf(leaf)
                self.emit(bnode, pred, obj, dt)
        return bnode

    def rdf_list(self, items: list) -> str:
        """thick_rdf.clj:77-90 — JSON array → rdf:first/rdf:rest chain."""
        head = bnode = self.fresh_blank()
        for i, item in enumerate(items):
            obj, dt = self.leaf(item)
            self.emit(bnode, "rdf:first", obj, dt)
            if i + 1 < len(items):
                nxt = self.fresh_blank()
                self.emit(bnode, "rdf:rest", nxt, "_JSONMAP")
                bnode = nxt
            else:
                self.emit(bnode, "rdf:rest", "rdf:nil", "_IRI")
        return head

    def leaf(self, leaf: dict) -> tuple[str, str]:
        """Datatype dispatch (thick_rdf.clj:92-98). Returns
        (object-node, thin datatype); compound objects come back as
        blank labels with datatype _JSONMAP."""
        dt = leaf.get("datatype")
        obj = leaf.get("object")
        if dt == "_JSONMAP":
            return self.predicate_map(obj), "_JSONMAP"
        if dt == "_JSONLIST":
            return self.rdf_list(obj), "_JSONMAP"
        return obj, dt  # _IRI, @lang, or typed-literal CURIE

    def annotation(self, subject: str, subject_dt: str, predicate: str,
                   obj: str, obj_dt: str, ann: dict) -> None:
        """thick_rdf.clj:100-138 — annotation map → reification bnode
        (rdf:type from the leaves' ``meta`` tag, owl:annotated* or
        rdf:subject/predicate/object wiring, then the annotation
        properties; recursive for nested annotations)."""
        bnode = self.fresh_blank()
        first_leaves = next(iter(ann.values()), [])
        meta = (first_leaves[0].get("meta") if first_leaves else None) \
            or "owl:Axiom"
        # thick_rdf.clj:104-109 re-emits rdf:type = meta verbatim, which
        # for reifications produces rdf:type rdf:Reification — a stanza
        # the import dispatch (thin2thick.clj:307-311) does not
        # recognize, breaking the reference's own round trip. We emit
        # the original rdf:Statement type instead.
        self.emit(bnode, "rdf:type",
                  "rdf:Statement" if meta == "rdf:Reification" else meta,
                  "_IRI")
        if meta == "rdf:Reification":
            src, prop, tgt = "rdf:subject", "rdf:predicate", "rdf:object"
        else:
            src, prop, tgt = ("owl:annotatedSource", "owl:annotatedProperty",
                              "owl:annotatedTarget")
        self.emit(bnode, src, subject, subject_dt)
        self.emit(bnode, prop, predicate, "_IRI")
        self.emit(bnode, tgt, obj, obj_dt)
        for pred, leaves in ann.items():
            # rdf:Reification keeps rdf:subject/predicate/object inside
            # the annotation map (annotation_handling.clj:83-86); they
            # are the wiring we just re-emitted — skip to avoid doubles.
            if pred in ("rdf:subject", "rdf:predicate", "rdf:object"):
                continue
            for leaf in leaves:
                o, dt = self.leaf({k: v for k, v in leaf.items()
                                   if k not in ("meta", "annotation")})
                self.emit(bnode, pred, o, dt)
                if leaf.get("annotation"):
                    self.annotation(bnode, "_JSONMAP", pred, o, dt,
                                    leaf["annotation"])


def expand_statement_row(row: dict) -> list[dict]:
    """One statement-table row → thin triples (thick_rdf.clj:195-215).

    GCI JSON subjects expand to a bnode subject; single wiring-subject
    rows drop their base triple (the skolem is synthetic) but are
    handled by ``merge_existential_rows`` upstream when multi-row.
    """
    key = "\x1f".join(str(row.get(k)) for k in
                      ("subject", "predicate", "object", "datatype",
                       "annotation"))
    ex = _Expander(key)

    subject_json = parse_json_tolerant(row["subject"])
    if isinstance(subject_json, dict):
        subject, subject_dt = ex.predicate_map(subject_json), "_JSONMAP"
    else:
        subject, subject_dt = subject_json, "_IRI"

    predicate = row["predicate"]
    dt = row["datatype"]
    obj_val = parse_json_tolerant(row["object"]) \
        if dt in ("_JSONMAP", "_JSONLIST") else row["object"]
    obj, obj_dt = ex.leaf({"object": obj_val, "datatype": dt})

    ann = parse_json_tolerant(row.get("annotation")) \
        if row.get("annotation") else None
    if isinstance(ann, dict) and ann:
        ex.annotation(subject, subject_dt, predicate, obj, obj_dt, ann)

    if not is_wiring_blanknode(subject):
        ex.emit(subject, predicate, obj, obj_dt)
    return ex.triples


def merge_existential_rows(rows: list[dict]) -> list[dict]:
    """Merge wiring-blanknode subject rows back into one raw
    ``_JSONMAP`` row with predicate "unknown" (thick_rdf.clj:176-193);
    must run over a whole group of rows sharing the skolem subject.

    Deviation from the reference: single-row groups are merged too —
    the reference passes them through (count > 1 filter at
    thick_rdf.clj:181) and then drops their base triple at
    thick_rdf.clj:213-215, so a single-predicate existential blank
    root silently vanishes from its own export. Merging the singleton
    round-trips it to the identical skolem row instead."""
    by_subject: dict[str, list[dict]] = {}
    passthrough = []
    for r in rows:
        if is_wiring_blanknode(r.get("subject")):
            by_subject.setdefault(r["subject"], []).append(r)
        else:
            passthrough.append(r)
    merged = []
    for subj, group in by_subject.items():
        pmap = {r["predicate"]:
                [{"object": parse_json_tolerant(r["object"]),
                  "datatype": r["datatype"]}]
                for r in group}
        first = group[0]
        merged.append({
            "assertion": first.get("assertion"),
            "retraction": first.get("retraction"),
            "graph": first.get("graph"),
            "subject": subj,
            "predicate": "unknown",
            "object": json.dumps(pmap, sort_keys=True,
                                 separators=(",", ":"), ensure_ascii=False),
            "datatype": "_JSONMAP",
            "annotation": first.get("annotation"),
        })
    return passthrough + merged
