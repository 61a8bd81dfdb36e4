"""RDF list folding: rdf:first/rdf:rest chains → ``_JSONLIST`` arrays.

Reference: /root/reference/src/ldtab/rdf_list_handling.clj (whole file).
Element order is preserved (RDF lists are ordered) — sort-json exempts
``_JSONLIST`` from array sorting (thin2thick.clj:233-247).
"""

from __future__ import annotations

from typing import Any


def _is_list_map(obj: Any, datatype: Any) -> bool:
    return (isinstance(obj, dict)
            and "rdf:first" in obj and "rdf:rest" in obj
            and datatype == "_JSONMAP")


def is_top_level_rdf_list(json_val: Any) -> bool:
    """rdf_list_handling.clj:14-25."""
    return (isinstance(json_val, dict)
            and "subject" in json_val and "predicate" in json_val
            and "object" in json_val
            and _is_list_map(json_val.get("object"), json_val.get("datatype")))


def is_rdf_list(json_val: Any) -> bool:
    """rdf_list_handling.clj:27-35."""
    return (isinstance(json_val, dict)
            and _is_list_map(json_val.get("object"), json_val.get("datatype")))


def collect_list_elements(node: dict, acc: list) -> list:
    """Walk rdf:rest links, collecting the first rdf:first leaf of each
    cons cell (rdf_list_handling.clj:7-12)."""
    while True:
        elements = node.get("rdf:first") or [None]
        acc.append(elements[0])
        rest = node.get("rdf:rest")
        remainder = rest[0].get("object") if rest else "rdf:nil"
        if remainder == "rdf:nil" or not isinstance(remainder, dict):
            return acc
        node = remainder


def _encode_list_object(list_map: dict) -> dict:
    """rdf_list_handling.clj:38-42."""
    elements = collect_list_elements(list_map, [])
    return {"object": [encode_rdf_list(e) for e in elements],
            "datatype": "_JSONLIST"}


def encode_rdf_list(m: Any) -> Any:
    """Recursively fold every rdf:first/rdf:rest chain in a JSON value
    (rdf_list_handling.clj:58-66)."""
    if is_top_level_rdf_list(m):
        out = dict(m)
        out["object"] = _encode_list_object(m["object"])["object"]
        out["datatype"] = "_JSONLIST"
        return out
    if is_rdf_list(m):
        return _encode_list_object(m["object"])
    if isinstance(m, dict):
        return {k: encode_rdf_list(v) for k, v in m.items()}
    if isinstance(m, (list, tuple)):
        return [encode_rdf_list(x) for x in m]
    return m
