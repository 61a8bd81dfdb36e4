"""Turtle 1.1 conformance sweep — positive-syntax cases modeled on the
public W3C Turtle test suite (https://www.w3.org/2013/TurtleTests/):
UCHAR numeric escapes in IRIs, RFC 3986 @base resolution in every
position, numeric-leading / exotic PN_LOCALs, unicode PN_CHARS.

These drive the parser directly (full-IRI raw triples) — the
Spark-side plumbing is pinned by test_turtle_rdfxml.py."""

import pytest

from ldtab_clj_spark.sources.turtle import (TurtleError, parse_turtle)

P = "@prefix p: <http://a.example/> .\n"


def triples(ttl):
    return set(parse_turtle(ttl))


# (name, turtle text, expected (s, p, o, dt) set) — dt "_IRI" for IRIs
CASES = [
    ("IRI_with_four_digit_numeric_escape",
     "<http://a.example/\\u0073> <http://a.example/p> "
     "<http://a.example/o> .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/o", "_IRI")}),
    ("IRI_with_eight_digit_numeric_escape",
     "<http://a.example/\\U00000073> <http://a.example/p> "
     "<http://a.example/o> .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/o", "_IRI")}),
    ("localName_with_leading_digit",
     P + "p:s p:p p:11 .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/11", "_IRI")}),
    ("localName_with_colon",
     P + "p:s p:p p:o:2 .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/o:2", "_IRI")}),
    ("localName_with_non_leading_extras",
     P + "p:s p:p p:a.b-c .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/a.b-c", "_IRI")}),
    ("localName_with_PN_LOCAL_ESC",
     P + "p:s p:p p:o\\,b .",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/o,b", "_IRI")}),
    ("unicode_pname_and_blank_label",
     "@prefix é: <http://a.example/> .\n_:bé é:p é:café .",
     {("_:bé", "http://a.example/p",
       "http://a.example/café", "_IRI")}),
    ("trailing_dot_terminates_local",
     P + "p:s p:p p:o.",
     {("http://a.example/s", "http://a.example/p",
       "http://a.example/o", "_IRI")}),
    ("string_with_numeric_escapes",
     P + 'p:s p:p "a\\u0062c\\U00000064" .',
     {("http://a.example/s", "http://a.example/p", "abcd",
       "http://www.w3.org/2001/XMLSchema#string")}),
    # --- @base / RFC 3986 reference resolution ---
    ("base_document_style_and_dotdot",
     "@base <http://ex.org/a/b/c.ttl> .\n<d> <p> <../f> .",
     {("http://ex.org/a/b/d", "http://ex.org/a/b/p",
       "http://ex.org/a/f", "_IRI")}),
    ("base_fragment_and_empty_ref",
     "@base <http://ex.org/a/b/c.ttl> .\n<#x> <p> <> .",
     {("http://ex.org/a/b/c.ttl#x", "http://ex.org/a/b/p",
       "http://ex.org/a/b/c.ttl", "_IRI")}),
    ("base_absolute_path_ref",
     "@base <http://ex.org/a/b/> .\n<s> <p> </rooted> .",
     {("http://ex.org/a/b/s", "http://ex.org/a/b/p",
       "http://ex.org/rooted", "_IRI")}),
    ("relative_rebase_chain",
     "@base <http://ex.org/x/> .\n@base <y/> .\n<s> <p> <o> .",
     {("http://ex.org/x/y/s", "http://ex.org/x/y/p",
       "http://ex.org/x/y/o", "_IRI")}),
    ("prefix_iri_resolved_against_base",
     "@base <http://ex.org/dir/> .\n@prefix q: <voc#> .\nq:s q:p q:o .",
     {("http://ex.org/dir/voc#s", "http://ex.org/dir/voc#p",
       "http://ex.org/dir/voc#o", "_IRI")}),
    ("base_applies_to_datatype_position",
     "@base <http://ex.org/dt/> .\n<s> <p> \"1\"^^<int> .",
     {("http://ex.org/dt/s", "http://ex.org/dt/p", "1",
       "http://ex.org/dt/int")}),
    ("sparql_style_base_prefix",
     "BASE <http://ex.org/b/>\nPREFIX r: <http://a.example/>\n"
     "<s> r:p r:o .",
     {("http://ex.org/b/s", "http://a.example/p",
       "http://a.example/o", "_IRI")}),
]


@pytest.mark.parametrize("name,ttl,want",
                         CASES, ids=[c[0] for c in CASES])
def test_turtle_conformance_positive(name, ttl, want):
    assert triples(ttl) == want


def test_invalid_iri_escape_raises():
    with pytest.raises(TurtleError, match="invalid escape"):
        parse_turtle("<http://a.example/\\n> <http://a.example/p> "
                     "<http://a.example/o> .")


def test_turtle_uchar_surrogate_and_out_of_range_fail_fast():
    """Mirror of the N-Triples twin's codepoint validation (r4
    ADVICE): a lone surrogate or >U+10FFFF UCHAR in a Turtle IRI
    raises TurtleError at parse time — not an opaque
    UnicodeEncodeError later inside an executor task at the
    Arrow/parquet boundary (and never a bare ValueError from chr)."""
    for bad in ("\\uD800", "\\uDFFF", "\\U00110000"):
        with pytest.raises(TurtleError, match="UCHAR codepoint"):
            parse_turtle(f"<http://a.example/{bad}> "
                         "<http://a.example/p> <http://a.example/o> .")
    # boundary values that ARE valid still parse
    triples = parse_turtle("<http://a.example/\\U0010FFFF> "
                           "<http://a.example/p> <http://a.example/o> .")
    assert len(triples) == 1


def test_uchar_in_iri_reaches_statement_table(spark):
    """Spark-side: the unescaped IRI flows through import_turtle into
    CURIE-fied statements."""
    import pathlib
    import tempfile

    from ldtab_clj_spark.sources.turtle import import_turtle
    prefix_df = spark.createDataFrame(
        [("ex", "http://a.example/")], "prefix string, base string")
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "t.ttl"
        f.write_text("<http://a.example/\\u0073> <http://a.example/p> "
                     "<http://a.example/o> .")
        rows = import_turtle(spark, str(f), prefix_df).collect()
    assert [(r.subject, r.predicate, r.object) for r in rows] \
        == [("ex:s", "ex:p", "ex:o")]


def test_relative_iri_without_base_fails_fast():
    """No @base in scope → a relative IRIREF raises (no document URI
    exists in a distributed scan; minting relative subjects would
    corrupt the statement table) — same contract as the RDF/XML
    reader."""
    for ttl in ["<s> <http://a.example/p> <http://a.example/o> .",
                "<http://a.example/s> <http://a.example/p> <#frag> .",
                "<http://a.example/s> <http://a.example/p> <> ."]:
        with pytest.raises(TurtleError, match="no @base"):
            parse_turtle(ttl)


def test_non_hierarchical_base_fragment_ok_path_raises():
    """urn:/tag: bases: fragment and empty refs are well-defined and
    resolve; path-relative refs raise instead of silently passing the
    relative string through (urljoin's behavior for schemes outside
    its uses_relative list)."""
    got = triples("@base <urn:example:doc> .\n<#a> <#b> <> .")
    assert got == {("urn:example:doc#a", "urn:example:doc#b",
                    "urn:example:doc", "_IRI")}
    with pytest.raises(ValueError, match="non-hierarchical"):
        parse_turtle("@base <urn:example:doc> .\n<s> <#p> <#o> .")


BAD = [
    ("unterminated_statement", P + "p:s p:p p:o"),
    ("missing_object", P + "p:s p:p ."),
    ("bad_predicate_literal", P + 'p:s "lit" p:o .'),
    ("undefined_prefix", "q:s q:p q:o ."),
    ("unterminated_string", P + 'p:s p:p "abc .'),
    ("unclosed_bracket", P + "p:s p:p [ p:q p:o ."),
    ("unclosed_collection", P + "p:s p:p (p:a p:b ."),
    ("bad_directive", "@prefixes p: <http://a.example/> ."),
    ("double_dot", P + "p:s p:p p:o . ."),
    ("stray_semicolon_start", P + "; p:p p:o ."),
]


@pytest.mark.parametrize("name,ttl", BAD, ids=[b[0] for b in BAD])
def test_turtle_negative_syntax_raises(name, ttl):
    """Malformed documents raise TurtleError (never hang, crash the
    interpreter, or silently emit triples) — negative-syntax shapes
    from the W3C suite."""
    with pytest.raises(TurtleError):
        parse_turtle(ttl)
