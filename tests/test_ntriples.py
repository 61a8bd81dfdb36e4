"""N-Triples source + global blank-component closure: the format-level
round trip (statements → .nt text → re-import → same statements)."""

import pytest
from pyspark.sql import functions as F

from ldtab_clj_spark.operators.components import (assign_components,
                                                  blank_components)
from ldtab_clj_spark.operators.export import write_ntriples
from ldtab_clj_spark.plans.pipeline import build_statements
from ldtab_clj_spark.sources.ntriples import import_ntriples, parse_nt_line
from ldtab_clj_spark.synth import entity_dictionary, synth_docs

PREFIXES = [("ex", "http://example.com/"),
            ("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
            ("rdfs", "http://www.w3.org/2000/01/rdf-schema#"),
            ("owl", "http://www.w3.org/2002/07/owl#"),
            ("xsd", "http://www.w3.org/2001/XMLSchema#")]


@pytest.fixture(scope="module")
def prefix_df(spark):
    return spark.createDataFrame(PREFIXES, "prefix string, base string")


def test_parse_nt_line_variants():
    iri = parse_nt_line(
        "<http://example.com/a> <http://example.com/p> "
        "<http://example.com/b> .", PREFIXES)
    assert iri == ("ex:a", "ex:p", "ex:b", "_IRI", False, False)
    lang = parse_nt_line(
        '<http://example.com/a> '
        '<http://www.w3.org/2000/01/rdf-schema#label> "café"@en .',
        PREFIXES)
    assert lang == ("ex:a", "rdfs:label", "café", "@en", False, False)
    typed = parse_nt_line(
        '_:b1 <http://example.com/n> '
        '"5"^^<http://www.w3.org/2001/XMLSchema#int> .', PREFIXES)
    assert typed == ("_:b1", "ex:n", "5", "xsd:int", True, False)
    esc = parse_nt_line(
        '<http://x.org/a> <http://x.org/p> "l1\\nl2\\t\\"q\\"" .',
        PREFIXES)
    assert esc[2] == 'l1\nl2\t"q"'
    assert esc[0] == "<http://x.org/a>"  # unmatched base → wrapped
    assert parse_nt_line("# comment", PREFIXES) is None
    assert parse_nt_line("", PREFIXES) is None
    assert parse_nt_line("garbage line", PREFIXES) is None


def test_blank_components_closure(spark):
    # chain _:a → _:b → _:c plus a separate _:x; ground triple apart
    rows = [
        ("_:a", "ex:p", "_:b", "_JSONMAP", True, True, "", 0),
        ("_:b", "ex:p", "_:c", "_JSONMAP", True, True, "", 0),
        ("_:x", "ex:p", "ex:o", "_IRI", True, False, "", 0),
        ("ex:s", "ex:p", "ex:o", "_IRI", False, False, "", 0),
    ]
    from ldtab_clj_spark.schemas import THIN
    thin = spark.createDataFrame(rows, THIN)
    comp = {r.blank: r.component for r in blank_components(thin).collect()}
    assert comp["_:a"] == comp["_:b"] == comp["_:c"] == "_:a"
    assert comp["_:x"] == "_:x"
    grouped = assign_components(thin)
    keys = {r.subject: r.doc_id for r in grouped.collect()}
    assert keys["_:a"] == keys["_:b"] == "_:a"
    assert keys["ex:s"].startswith("g:")


def test_nt_format_roundtrip(spark, tmp_path, prefix_df):
    docs = synth_docs(spark, 60, seed=13)
    statements = build_statements(docs, entity_dictionary(spark)) \
        .localCheckpoint()
    nt_dir = str(tmp_path / "out_nt")
    write_ntriples(statements, prefix_df, nt_dir)
    again = import_ntriples(spark, nt_dir, prefix_df)

    def keys(df):
        return {(r.subject, r.predicate, r.object, r.datatype,
                 r.annotation) for r in df.collect()}

    orig, back = keys(statements), keys(again)
    tp = len(orig & back)
    p, r = tp / len(back), tp / len(orig)
    assert p >= 0.95 and r >= 0.95, (p, r, len(orig), len(back),
                                     list(orig - back)[:3],
                                     list(back - orig)[:3])


def test_parse_unicode_escapes():
    t = parse_nt_line(
        '<http://example.com/a> <http://example.com/p> '
        '"caf\\u00E9 \\U0001F600" .', PREFIXES)
    assert t[2] == "café 😀"


def test_literal_that_looks_like_blank_label(spark):
    """Regression: a literal "_:b1" must not hijack the real blank
    node _:b1's component."""
    from ldtab_clj_spark.schemas import THIN
    rows = [
        ("_:b1", "ex:p", "ex:o", "_IRI", True, False, "", 0),
        ("ex:s", "ex:note", "_:b1", "xsd:string", False, False, "", 0),
    ]
    thin = spark.createDataFrame(rows, THIN)
    grouped = {r.subject: r.doc_id
               for r in assign_components(thin).collect()}
    assert grouped["_:b1"] == "_:b1"
    assert grouped["ex:s"].startswith("g:")  # ground singleton


def test_nt_iri_uchar_escapes():
    """N-Triples IRIREF UCHAR escapes (\\uXXXX / \\UXXXXXXXX) unescape
    in every IRI position — subject, predicate, object, datatype —
    matching the Turtle reader and canonical NT tooling output."""
    from ldtab_clj_spark.sources.ntriples import parse_nt_line
    prefixes = [("ex", "http://example.com/")]
    t = parse_nt_line(
        '<http://example.com/\\u0073> <http://example.com/\\U00000070> '
        '"v"^^<http://example.com/\\u0064> .', prefixes)
    assert t[:4] == ("ex:s", "ex:p", "v", "ex:d")
    t2 = parse_nt_line(
        '<http://example.com/a> <http://example.com/p> '
        '<http://example.com/caf\\u00e9> .', prefixes)
    assert t2[2] == "ex:café"


def test_nt_malformed_uchar_skips_line():
    """Out-of-range or surrogate UCHAR codepoints make the LINE
    unparseable (skipped), never a task-killing exception or a lone
    surrogate that explodes later at the Arrow/parquet boundary."""
    from ldtab_clj_spark.sources.ntriples import parse_nt_line
    prefixes = [("ex", "http://example.com/")]
    good = '<http://example.com/s> <http://example.com/p> "ok" .'
    for bad in [
        '<http://example.com/\\U00110000> <http://example.com/p> "v" .',
        '<http://example.com/s> <http://example.com/p> "\\uD800" .',
    ]:
        assert parse_nt_line(bad, prefixes) is None
    assert parse_nt_line(good, prefixes) is not None


def test_nt_skipped_line_counter(spark, tmp_path, prefix_df):
    """r4 ADVICE: the stricter escape validation silently VANISHED
    escape-invalid literals from imports. The optional accumulator
    makes every dropped non-blank/non-comment line countable (exact
    after an action), while blank lines and comments stay free."""
    from ldtab_clj_spark.sources.ntriples import read_ntriples

    nt = tmp_path / "mixed.nt"
    nt.write_text(
        "# comment line\n"
        "\n"
        '<http://example.com/a> <http://example.com/p> "ok" .\n'
        '<http://example.com/a> <http://example.com/p> "bad\\z" .\n'
        "not a triple at all\n"
        '<http://example.com/b> <http://example.com/p> "\\uD800" .\n')
    acc = spark.sparkContext.accumulator(0)
    parsed = read_ntriples(spark, str(nt), prefix_df, skipped_acc=acc)
    assert parsed.count() == 1      # the action makes the count exact
    assert acc.value == 3           # bad ECHAR + garbage + surrogate
