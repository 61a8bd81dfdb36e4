"""Memory-bounded group streaming (operators/batching.py): unit tests
for the carry-over logic, plus an end-to-end equivalence check that
stanza assembly and thick→thin expansion produce IDENTICAL output when
Arrow batches are tiny (forcing groups to straddle batch boundaries)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ldtab_clj_spark.operators.batching import grouped_batches


def _frames(rows, sizes):
    """Split a row list into frames of the given sizes."""
    out, i = [], 0
    for n in sizes:
        out.append(pd.DataFrame(rows[i:i + n], columns=["k", "v"]))
        i += n
    assert i == len(rows)
    return out


ROWS = [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("b", 5), ("c", 6)]


@pytest.mark.parametrize("sizes", [
    [6], [1, 5], [2, 4], [3, 3], [4, 2], [5, 1],
    [1, 1, 1, 1, 1, 1], [2, 2, 2], [2, 0, 4],
])
def test_grouped_batches_complete_groups(sizes):
    got = list(grouped_batches(iter(_frames(ROWS, sizes)), "k"))
    # every yielded frame holds only complete groups...
    seen = []
    for pdf in got:
        keys = list(pdf["k"])
        for g in dict.fromkeys(keys):
            assert g not in seen, f"group {g} split across yields"
        seen.extend(dict.fromkeys(keys))
    # ...and the concatenation is the original row stream
    cat = pd.concat(got, ignore_index=True)
    assert list(map(tuple, cat.itertuples(index=False))) == ROWS


def test_grouped_batches_empty():
    assert list(grouped_batches(iter([]), "k")) == []
    assert list(grouped_batches(iter([pd.DataFrame(columns=["k"])]),
                                "k")) == []


def test_single_giant_group():
    rows = [("x", i) for i in range(10)]
    got = list(grouped_batches(iter(_frames(rows, [3, 3, 3, 1])), "k"))
    assert len(got) == 1 and len(got[0]) == 10


@pytest.fixture()
def tiny_arrow_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _stmt_key_rows(df):
    return sorted(tuple(r) for r in df.select(
        "graph", "subject", "predicate", "object", "datatype",
        "annotation").collect())


def test_pipeline_invariant_to_arrow_batch_size(spark, tiny_arrow_batches):
    """Docs straddle Arrow batches at maxRecordsPerBatch=37; output must
    equal the single-node oracle exactly (VERDICT r1 item 3)."""
    from ldtab_clj_spark.plans.pipeline import build_statements
    from ldtab_clj_spark.plans.single_node import single_node_statements
    from ldtab_clj_spark.synth import entity_dictionary, synth_docs
    got = _stmt_key_rows(build_statements(synth_docs(spark, 60, seed=7),
                                          entity_dictionary(spark)))
    want = sorted((r["graph"], r["subject"], r["predicate"], r["object"],
                   r["datatype"], r["annotation"])
                  for r in single_node_statements(60, seed=7))
    assert got == want


def test_expand_invariant_to_arrow_batch_size(spark, tiny_arrow_batches):
    """Round trip (expand → re-import) with tiny Arrow batches."""
    from ldtab_clj_spark.plans.pipeline import build_statements, reimport
    from ldtab_clj_spark.synth import entity_dictionary, synth_docs
    stmts = build_statements(synth_docs(spark, 40, seed=9),
                             entity_dictionary(spark))
    stmts = stmts.persist()
    try:
        assert _stmt_key_rows(reimport(stmts)) == _stmt_key_rows(stmts)
    finally:
        stmts.unpersist()


def test_simhash_arrow_matches_sql(spark):
    """mode="arrow" (numpy md5 bit-count) must be bit-identical to the
    Catalyst oracle form — same shingle set, same majority rule."""
    from ldtab_clj_spark.operators.dedup import simhash_signatures
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sql = {(r.doc_id, r.simhash)
           for r in simhash_signatures(docs, mode="sql").collect()}
    arrow = {(r.doc_id, r.simhash)
             for r in simhash_signatures(docs, mode="arrow").collect()}
    assert sql == arrow and sql
    # edge cases: empty and single-word docs produce no signature
    tiny = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words")], "doc_id long, text string")
    assert {r.doc_id for r in
            simhash_signatures(tiny, mode="arrow").collect()} == {3}
    # whitespace-edge corpus: tabs / newlines / NBSP / NULL text must
    # produce IDENTICAL signatures in both modes (Java ASCII \s +
    # space-only trim + kept empty tokens — the exact Catalyst
    # tokenization), and an unknown mode must raise
    edge = spark.createDataFrame(
        [(1, "\tfoo bar"), (2, "foo\n"), (3, "a\u00a0b"),
         (4, None), (5, "x \t y\r\nz"), (6, "  padded  ")],
        "doc_id long, text string")
    sql_e = {(r.doc_id, r.simhash)
             for r in simhash_signatures(edge, mode="sql").collect()}
    arrow_e = {(r.doc_id, r.simhash)
               for r in simhash_signatures(edge, mode="arrow").collect()}
    assert sql_e == arrow_e, (sorted(sql_e - arrow_e),
                              sorted(arrow_e - sql_e))
    import pytest
    with pytest.raises(ValueError, match="unknown simhash mode"):
        simhash_signatures(edge, mode="numpy")


def test_near_dup_clusters_known_graph(spark):
    """Pairs (1-2)(2-3)(5-6) → components {1,2,3} rep 1 and {5,6}
    rep 5; doc 4 (no pair) absent — singletons are their own cluster."""
    from ldtab_clj_spark.operators.dedup import near_dup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    got = {(r.doc_id, r.cluster)
           for r in near_dup_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}


def test_minhash_arrow_matches_sql(spark):
    """mode="arrow" (hashlib min-digest) must be bit-identical to the
    Catalyst md5-min oracle form — same bigram shingle set, same
    md5('i:' || shingle) families, min over digest bytes == min over
    hex strings."""
    from ldtab_clj_spark.operators.dedup import (minhash_lsh_pairs,
                                                 minhash_signatures)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sql = {tuple(r) for r in
           minhash_signatures(docs, mode="sql").collect()}
    arrow = {tuple(r) for r in
             minhash_signatures(docs, mode="arrow").collect()}
    assert sql == arrow and sql
    # downstream pairs identical too (banding is shared JVM code)
    p_sql = {tuple(r) for r in
             minhash_lsh_pairs(docs, mode="sql").collect()}
    p_arrow = {tuple(r) for r in
               minhash_lsh_pairs(docs, mode="arrow").collect()}
    assert p_sql == p_arrow
    # whitespace-edge corpus (the _simhash_arrow tokenization-parity
    # rules): tabs / newlines / NBSP / NULL / empty / single word
    edge = spark.createDataFrame(
        [(1, "\tfoo bar"), (2, "foo\n"), (3, "a b"),
         (4, None), (5, "x \t y\r\nz"), (6, "  padded  "),
         (7, ""), (8, "one")],
        "doc_id long, text string")
    sql_e = {tuple(r) for r in
             minhash_signatures(edge, mode="sql").collect()}
    arrow_e = {tuple(r) for r in
               minhash_signatures(edge, mode="arrow").collect()}
    assert sql_e == arrow_e, (sorted(sql_e - arrow_e),
                              sorted(arrow_e - sql_e))
    import pytest
    with pytest.raises(ValueError, match="unknown minhash mode"):
        minhash_signatures(edge, mode="numpy")
