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
