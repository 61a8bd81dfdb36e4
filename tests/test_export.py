"""Export sinks + distributed round trip (SURVEY.md K2-K5, R10/R11)."""

import pytest
from pyspark.sql import functions as F

from ldtab_clj_spark.operators.export import (read_tsv, to_ntriples_lines,
                                              write_tsv)
from ldtab_clj_spark.plans.pipeline import build_statements, reimport
from ldtab_clj_spark.synth import entity_dictionary, synth_docs

N_DOCS = 80


@pytest.fixture(scope="module")
def statements(spark):
    docs = synth_docs(spark, N_DOCS, seed=7)
    return build_statements(docs, entity_dictionary(spark)) \
        .localCheckpoint()


def key_set(df):
    return {(r.graph, r.subject, r.predicate, r.object, r.datatype,
             r.annotation) for r in df.collect()}


def test_tsv_roundtrip_with_escaping(spark, tmp_path, statements):
    # inject a row with embedded newline/tab (export.clj:17-29 escapes)
    nasty = spark.createDataFrame(
        [(1, 0, "graph", "ex:n", "rdfs:comment", "line1\nline2\tend",
          "xsd:string", None)], statements.schema)
    df = statements.unionByName(nasty)
    out = str(tmp_path / "export.tsv")
    write_tsv(df, out, sort=True)
    back = read_tsv(spark, out)
    assert back.count() == df.count()
    # true round trip: escape on write, unescape on read
    esc = back.filter(F.col("predicate") == "rdfs:comment").collect()[0]
    assert esc.object == "line1\nline2\tend"
    # on-disk form carries the literal escapes (export.clj:17-29)
    import glob
    raw = "".join(open(f).read() for f in glob.glob(out + "/part-*"))
    assert r"line1\nline2\tend" in raw


def test_distributed_roundtrip_pr(statements):
    again = reimport(statements)
    orig, back = key_set(statements), key_set(again)
    tp = len(orig & back)
    p, r = tp / len(back), tp / len(orig)
    assert p >= 0.95 and r >= 0.95, (p, r, len(orig), len(back))


def test_ntriples_lines(spark, statements):
    prefix = spark.createDataFrame(
        [("ex", "http://example.com/"),
         ("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
         ("rdfs", "http://www.w3.org/2000/01/rdf-schema#"),
         ("owl", "http://www.w3.org/2002/07/owl#"),
         ("xsd", "http://www.w3.org/2001/XMLSchema#")],
        "prefix string, base string")
    lines = [r.value for r in
             to_ntriples_lines(statements, prefix).collect()]
    assert lines and all(line.endswith(" .") for line in lines)
    # every line has a subject node and an expanded predicate IRI
    assert all(line.startswith(("<", "_:")) for line in lines)
    assert any("<http://example.com/" in line for line in lines)
    # literals carry language/datatype tags
    assert any('"@en' in line.replace('"@en', '"@en') and '"' in line
               for line in lines)


def test_curify_expand_inverse(spark):
    from ldtab_clj_spark.functions.prefixes import (curie_to_iri_col,
                                                    curify_col)
    prefixes = [("ex", "http://example.com/"),
                ("exv", "http://example.com/vocab/")]
    df = spark.createDataFrame(
        [("http://example.com/vocab/W",),
         ("http://example.com/a/b",),
         ("http://other.org/x",)], "iri string")
    out = (df.withColumn("curie", curify_col(F.col("iri"), prefixes))
           .withColumn("back", curie_to_iri_col(F.col("curie"), prefixes)))
    rows = {r.iri: (r.curie, r.back) for r in out.collect()}
    assert rows["http://example.com/vocab/W"][0] == "exv:W"
    assert rows["http://example.com/a/b"][0] == "ex:a/b"
    assert rows["http://other.org/x"][0] == "<http://other.org/x>"
    for iri, (_, back) in rows.items():
        assert back == iri
