"""Canonicalization contract tests.

Mirrors /root/reference/test/ldtab/thin2thick_test.clj:10-103 — after
sort_json + canonical_dumps, thick triples must compare as strings
regardless of original key order or array order (except _JSONLIST).
"""

import json

from ldtab_clj_spark.core.canonical import (canonical_dumps, content_hash,
                                            curify_with,
                                            hash_existential_subject_blanknode,
                                            is_wiring_blanknode, sort_json)

S1 = ('{"owl:onProperty":[{"datatype":"_IRI","object":"obo:RO_0000085"}],'
      '"owl:someValuesFrom":[{"datatype":"_IRI","object":"obo:OBI_0001043"}],'
      '"rdf:type":[{"datatype":"_IRI","object":"owl:Restriction"}]}')
S2 = ('{"owl:someValuesFrom":[{"datatype":"_IRI","object":"obo:OBI_0001043"}],'
      '"owl:onProperty":[{"datatype":"_IRI","object":"obo:RO_0000085"}],'
      '"rdf:type":[{"datatype":"_IRI","object":"owl:Restriction"}]}')

A1 = ('{"obo:IAO_0010000":['
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-001"},'
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-002"},'
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-003"}]}')
A2 = ('{"obo:IAO_0010000":['
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-003"},'
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-001"},'
      '{"datatype":"_IRI","meta":"owl:Axiom","object":"obo:bfo/axiom/033-002"}]}')


def canon(s: str) -> str:
    return canonical_dumps(sort_json(json.loads(s)))


def test_key_order_is_the_same_after_sorting():
    assert canon(S1) == canon(S2)


def test_array_order_is_the_same_after_sorting():
    assert canon(A1) == canon(A2)


def test_array_order_and_key_order_same_after_sorting():
    c1 = json.loads(S1) | json.loads(A1)
    c2 = json.loads(S2) | json.loads(A2)
    assert canonical_dumps(sort_json(c1)) == canonical_dumps(sort_json(c2))


def test_jsonlist_order_is_preserved():
    # thin2thick.clj:233-247 — RDF lists are ordered; sort-json must NOT
    # reorder _JSONLIST members.
    v = {"datatype": "_JSONLIST",
         "object": [{"object": "ex:B", "datatype": "_IRI"},
                    {"object": "ex:A", "datatype": "_IRI"}]}
    out = sort_json(v)
    assert [x["object"] for x in out["object"]] == ["ex:B", "ex:A"]


def test_nested_arrays_sorted_by_serialized_string():
    v = {"k": [{"object": "b"}, {"object": "a"}]}
    assert sort_json(v) == {"k": [{"object": "a"}, {"object": "b"}]}


def test_content_hash_deterministic_and_structure_sensitive():
    a = {"p": [{"object": "x", "datatype": "_IRI"}]}
    b = {"p": [{"object": "y", "datatype": "_IRI"}]}
    assert content_hash(a) == content_hash(dict(a))
    assert content_hash(a) != content_hash(b)


def test_hash_existential_subject_rewrites_wiring_only():
    t = {"subject": "<wiring:blanknode:0>", "predicate": "rdf:type",
         "object": {"p": [{"object": "x", "datatype": "_IRI"}]},
         "datatype": "_JSONMAP"}
    out = hash_existential_subject_blanknode(t)
    assert is_wiring_blanknode(out["subject"])
    assert out["subject"] != t["subject"]
    # content-addressed: same object → same skolem
    assert (hash_existential_subject_blanknode(dict(t))["subject"]
            == out["subject"])
    plain = {"subject": "ex:a", "predicate": "p", "object": "o",
             "datatype": "_IRI"}
    assert hash_existential_subject_blanknode(plain) == plain


def test_curify_with_longest_prefix_wins():
    # FIXTURES.md §2: two prefixes where one base prefixes the other
    prefixes = [("ex", "http://example.com/"),
                ("exv", "http://example.com/vocab/"),
                ("owl", "http://www.w3.org/2002/07/owl#")]
    assert curify_with("http://example.com/vocab/Widget", prefixes) == \
        "exv:Widget"
    assert curify_with("http://example.com/thing/1", prefixes) == \
        "ex:thing/1"
    assert curify_with("http://unknown.org/x", prefixes) == \
        "<http://unknown.org/x>"
