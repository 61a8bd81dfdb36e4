"""Canonical JSON + content hashing (LDTab `sort-json` semantics).

Reference: /root/reference/src/ldtab/thin2thick.clj:230-257 (sort-json),
:19-25 (hash-existential-subject-blanknode), :35-42 (curify-with),
:14-17 (is-wiring-blanknode).

Contract (pinned by tests/test_canonical.py, mirroring
/root/reference/test/ldtab/thin2thick_test.clj):
  * maps are key-sorted,
  * arrays are sorted by comparing members' serialized JSON strings,
  * EXCEPT ``_JSONLIST`` objects, whose element order is preserved
    (RDF lists are ordered),
  * after canonicalization, thick triples compare as strings.

Deviation from the reference: blank-node skolem ids use a 64-bit
SHA-256-derived content hash of the canonical JSON (hex) instead of
Clojure's JVM ``hash`` — the reference's ids are only stable within one
JVM run; ours are stable across runs/machines/executors, which the
north rule's resumability requires.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

WIRING_PREFIX = "<wiring:blanknode"

# Keys merged into a *top-level* _JSONLIST triple by sort-json
# (thin2thick.clj:239-246). Absent keys become explicit nulls there;
# we reproduce that only for keys the triple actually carries, because
# downstream row-encoding extracts fields explicitly anyway.
_TOP_LEVEL_LIST_KEYS = ("subject", "predicate", "graph", "assertion",
                        "retraction", "annotation")


def canonical_dumps(value: Any) -> str:
    """Serialize with sorted keys + no whitespace — the canonical string
    form under which thick triples are equality-comparable
    (thin2thick_test.clj's string-comparability contract)."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def sort_json(m: Any) -> Any:
    """Lexicographically ordered representation of a JSON value.

    Port of sort-json (thin2thick.clj:230-257): maps key-sorted, arrays
    sorted by member-JSON-string, ``_JSONLIST`` keeps element order.
    """
    if isinstance(m, dict) and m.get("datatype") == "_JSONLIST":
        sorted_list = {"datatype": "_JSONLIST",
                       "object": [sort_json(x) for x in m["object"]]}
        if "subject" in m:  # top-level RDF-list triple
            out = dict(sorted_list)
            for k in _TOP_LEVEL_LIST_KEYS:
                if k in m:
                    out[k] = sort_json(m[k]) if k == "subject" else m[k]
            return dict(sorted(out.items()))
        return sorted_list  # nested RDF list
    if isinstance(m, dict):
        return {k: sort_json(v) for k, v in sorted(m.items())}
    if isinstance(m, (list, tuple)):
        # sort by string comparison of the serialized sorted members;
        # keep the sorted STRUCTURES (serialize for the key only — a
        # json.loads round trip per member profiled ~15% of the chain)
        return sorted((sort_json(x) for x in m), key=canonical_dumps)
    return m


def content_hash(value: Any) -> str:
    """Deterministic 64-bit content hash (hex) of a JSON value."""
    s = value if isinstance(value, str) else canonical_dumps(value)
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:16]


def is_wiring_blanknode(value: Any) -> bool:
    """thin2thick.clj:14-17."""
    return isinstance(value, str) and value.startswith(WIRING_PREFIX)


def wiring_blanknode(payload: Any) -> str:
    """Skolem IRI for an existential blank node, content-addressed
    (thin2thick.clj:19-25 uses ``(hash (:object triple))``)."""
    return f"<wiring:blanknode:{content_hash(payload)}>"


def hash_existential_subject_blanknode(triple: dict) -> dict:
    """thin2thick.clj:19-25 — rewrite a wiring subject to its
    content-hash skolem form (deterministic replacement for gensym ids
    minted in encode-blank-nodes, thin2thick.clj:113)."""
    if is_wiring_blanknode(triple.get("subject")):
        t = dict(triple)
        t["subject"] = wiring_blanknode(triple["object"])
        return t
    return triple


def curify_with(uri: str, prefixes: list[tuple[str, str]]) -> str:
    """Longest-prefix CURIE-ification, else wrap ``<iri>``
    (thin2thick.clj:35-42). ``prefixes``: [(prefix, base), ...]."""
    best = None
    for prefix, base in prefixes:
        if uri.startswith(base) and (best is None or len(base) > len(best[1])):
            best = (prefix, base)
    if best is None:
        return f"<{uri}>"
    # prefix-only substring replacement, consistent with the columnar
    # path (functions/prefixes.curify_col). The reference's str/replace
    # replaces ALL occurrences of the base (thin2thick.clj:40), which
    # corrupts IRIs embedding the base twice (e.g. in a query string) —
    # deliberately not copied.
    return best[0] + ":" + uri[len(best[1]):]


def curie_to_iri(curie: str, prefix_map: dict[str, str]) -> str:
    """CURIE → IRI; strip ``<>`` wrapping (thick_rdf.clj:32-43)."""
    if curie.startswith("<") and curie.endswith(">"):
        return curie[1:-1]
    if ":" in curie:
        pfx, local = curie.split(":", 1)
        base = prefix_map.get(pfx)
        if base is not None:
            return base + local
    return curie
