"""CLI end-to-end: init → prefix → import → export → diff (the
reference's Makefile round-trip workflow, cli.clj dispatch)."""

import pytest

from ldtab_clj_spark.cli import main
from ldtab_clj_spark.synth import synth_docs

PREFIX_TSV = "prefix\tbase\nex\thttp://example.com/\nrdf\thttp://www.w3.org/1999/02/22-rdf-syntax-ns#\nrdfs\thttp://www.w3.org/2000/01/rdf-schema#\nowl\thttp://www.w3.org/2002/07/owl#\nxsd\thttp://www.w3.org/2001/XMLSchema#\n"


def test_cli_workflow(spark, tmp_path, capsys):
    db = str(tmp_path / "db")
    docs_dir = str(tmp_path / "docs")
    synth_docs(spark, 40, seed=3).write.parquet(docs_dir)
    tsv_dir = tmp_path / "prefix_tsv"
    tsv_dir.mkdir()
    (tsv_dir / "prefix.tsv").write_text(PREFIX_TSV)

    assert main(["init", db]) == 0
    assert main(["init", db]) == 1  # already initialized → error
    assert main(["prefix", db, str(tsv_dir / "prefix.tsv")]) == 0
    assert main(["import", db, docs_dir]) == 0

    def keys(df):
        return {(r.subject, r.predicate, r.object, r.datatype,
                 r.annotation) for r in df.collect()}

    orig = keys(spark.read.parquet(f"{db}/statement"))
    n = len(orig)
    assert n > 0

    out_tsv = str(tmp_path / "dump.tsv")
    assert main(["export", db, out_tsv, "--sort"]) == 0
    out_nt = str(tmp_path / "dump.nt")
    assert main(["export", db, out_nt]) == 0
    assert main(["export", db, str(tmp_path / "dump.xyz")]) == 1

    # diff against a truncated TSV: drops become retractions
    from ldtab_clj_spark.operators.export import read_tsv, write_tsv
    dump = read_tsv(spark, out_tsv)
    write_tsv(dump.limit(n - 5), str(tmp_path / "new.tsv"))
    assert main(["diff", db, str(tmp_path / "new.tsv")]) == 0
    after = spark.read.parquet(f"{db}/statement")
    assert after.filter("retraction > 0").count() == 5
    # re-import of the NT dump reproduces the statement set (P/R oracle)
    db2 = str(tmp_path / "db2")
    assert main(["init", db2]) == 0
    assert main(["prefix", db2, str(tsv_dir / "prefix.tsv")]) == 0
    assert main(["import", db2, out_nt, "--nt"]) == 0
    again = keys(spark.read.parquet(f"{db2}/statement"))
    tp = len(orig & again)
    assert tp / len(again) >= 0.95 and tp / len(orig) >= 0.95
