"""Property-based canonicalization tests (hypothesis).

The invariant the whole engine rests on (thin2thick_test.clj's
contract): canonical_dumps ∘ sort_json is invariant under key order
and (non-_JSONLIST) array order, and idempotent.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from ldtab_clj_spark.core.canonical import canonical_dumps, sort_json

# JSON-ish values shaped like thick-triple content
leaf = st.fixed_dictionaries(
    {"object": st.text(alphabet="abcXYZ:0123 ", max_size=8),
     "datatype": st.sampled_from(["_IRI", "@en", "xsd:string"])})
pmap = st.dictionaries(
    st.text(alphabet="abcowl:", min_size=1, max_size=6),
    st.lists(leaf, min_size=1, max_size=3), max_size=4)
value = st.recursive(
    leaf | pmap,
    lambda children: st.dictionaries(
        st.text(alphabet="pqr:", min_size=1, max_size=5),
        st.lists(children, min_size=1, max_size=3), max_size=3),
    max_leaves=12)


def shuffle_everything(v, rng):
    """Rebuild v with randomized dict insertion order + list order."""
    if isinstance(v, dict):
        items = list(v.items())
        rng.shuffle(items)
        return {k: shuffle_everything(x, rng) for k, x in items}
    if isinstance(v, list):
        out = [shuffle_everything(x, rng) for x in v]
        rng.shuffle(out)
        return out
    return v


@settings(max_examples=200, deadline=None)
@given(value, st.randoms())
def test_canonical_invariant_under_order(v, rng):
    a = canonical_dumps(sort_json(v))
    b = canonical_dumps(sort_json(shuffle_everything(v, rng)))
    assert a == b


@settings(max_examples=200, deadline=None)
@given(value)
def test_sort_json_idempotent(v):
    once = sort_json(v)
    assert sort_json(once) == once
    # round-trips through JSON text unchanged
    assert sort_json(json.loads(canonical_dumps(once))) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(leaf, min_size=1, max_size=5))
def test_jsonlist_keeps_order_everywhere(items):
    v = {"k": [{"datatype": "_JSONLIST", "object": items}]}
    out = sort_json(v)
    assert out["k"][0]["object"] == [sort_json(x) for x in items]


# ---- Turtle writer ↔ parser escaping round trip (pure Python) ----

_TTL_PREFIXES = [("ex", "http://example.com/"),
                 ("xsd", "http://www.w3.org/2001/XMLSchema#")]
_TTL_PMAP = dict(_TTL_PREFIXES)

# printable + the escape-relevant controls + some unicode
_lit_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",),
                           include_characters='\n\r\t"\\'),
    max_size=40)


@settings(max_examples=300, deadline=None)
@given(_lit_text, st.sampled_from(["xsd:string", "@en", "xsd:int",
                                   "ex:custom"]))
def test_turtle_literal_roundtrip(value, dt):
    """turtle_literal's escaping must survive the Turtle parser for
    ANY string content (quotes, backslashes, newlines, unicode)."""
    from ldtab_clj_spark.operators.export import turtle_literal
    from ldtab_clj_spark.sources.turtle import parse_turtle
    lit = turtle_literal(value, dt, _TTL_PMAP, _TTL_PREFIXES)
    doc = ("@prefix ex: <http://example.com/> .\n"
           "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
           f"ex:s ex:p {lit} .\n")
    triples = parse_turtle(doc)
    assert len(triples) == 1
    s, p, o, parsed_dt = triples[0]
    assert o == value
    if dt == "@en":
        assert parsed_dt == "@en"
    else:
        assert parsed_dt == _TTL_PMAP[dt.split(":")[0]] + dt.split(":")[1]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcXYZ0129_./%-", min_size=1, max_size=20))
def test_turtle_term_roundtrip(local):
    """turtle_term must emit something the parser reads back as the
    same IRI — prefixed name when PN-safe, <iri> otherwise."""
    from ldtab_clj_spark.operators.export import turtle_term
    from ldtab_clj_spark.sources.turtle import parse_turtle
    iri = "http://example.com/" + local
    term = turtle_term(f"<{iri}>", False, _TTL_PMAP, _TTL_PREFIXES)
    doc = ("@prefix ex: <http://example.com/> .\n"
           f"ex:s ex:p {term} .\n")
    triples = parse_turtle(doc)
    assert len(triples) == 1
    assert triples[0][2] == iri, (term, triples[0])


@settings(max_examples=300, deadline=None)
@given(_lit_text, st.sampled_from(["xsd:string", "@en", "xsd:int",
                                   "ex:custom"]))
def test_ntriples_literal_roundtrip(value, dt):
    """nt_object's escaping must survive parse_nt_line for any string
    content (NT has no multiline forms — every control char must be
    escaped on one line)."""
    from ldtab_clj_spark.operators.export import nt_object
    from ldtab_clj_spark.sources.ntriples import parse_nt_line
    lit = nt_object(value, dt, False, _TTL_PMAP)
    line = f"<http://example.com/s> <http://example.com/p> {lit} ."
    t = parse_nt_line(line, _TTL_PREFIXES)
    assert t is not None, line
    assert t[2] == value
    if dt == "@en":
        assert t[3] == "@en"
    else:
        assert t[3] == dt  # CURIE-fied back by the prefix table
