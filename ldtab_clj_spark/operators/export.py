"""Export sinks + thick→thin expansion operator (SURVEY.md K2-K5,
R10/R11).

Reference: /root/reference/src/ldtab/export.clj (TSV + Turtle writers),
thick_rdf.clj:195-228 (row → RDF model). We emit:

* TSV statement dumps with the reference's newline/tab escaping
  (export.clj:17-29) and optional lexicographic sort (export.clj:50-52)
  — distributed ``df.write.csv``;
* thin-triple expansion (``expand_df``) as a ``mapInPandas`` UDTF —
  the round-trip path (export → re-import) used by the P/R oracle;
* N-Triples text lines (the Turtle-equivalent sink; Jena's prefix
  compaction is presentation-only) written distributedly as text.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.canonical import content_hash, curie_to_iri, curify_with
from ..core.expand import expand_statement_row, merge_existential_rows
from ..schemas import STATEMENT, THIN

STATEMENT_COLS = [f.name for f in STATEMENT.fields]


def escape_tsv(col):
    """export.clj:17-29 escapes \\n/\\r/\\t; we additionally escape the
    backslash itself — without it, JSON content (which is full of
    2-char ``\\n`` sequences) is ambiguous with the TSV escapes and the
    read side corrupts canonical JSON (reference flaw, fixed here)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def unescape_tsv(col):
    """Exact inverse of escape_tsv. A sentinel (U+0001, never present
    in canonical JSON/IRIs) holds escaped backslashes so ``\\\\n``
    decodes to backslash+n, not to a newline."""
    s = "\x01"
    out = F.replace(col, F.lit("\\\\"), F.lit(s))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    return F.replace(out, F.lit(s), F.lit("\\"))


def write_tsv(statements: DataFrame, path: str, sort: bool = False) -> None:
    """K2: TSV export sink. ``sort`` = reference --sort flag
    (lexicographic; a global range-partitioned sort in Spark)."""
    df = statements.select(
        *[escape_tsv(F.col(c).cast("string")).alias(c)
          if c in ("subject", "predicate", "object", "annotation")
          else F.col(c).cast("string").alias(c)
          for c in STATEMENT_COLS])
    if sort:
        df = df.orderBy(*STATEMENT_COLS)
    # quoting disabled: the reference format is raw TSV (tabs/newlines
    # already escaped above); CSV quoting would wrap every JSON field
    (df.write.mode("overwrite")
       .option("sep", "\t").option("header", True)
       .option("quote", "").option("escape", "")
       .option("emptyValue", "").csv(path))


def read_tsv(spark, path: str) -> DataFrame:
    """S5: TSV statement source (diff.clj:8-12)."""
    df = (spark.read.option("sep", "\t").option("header", True)
          .option("quote", "").option("escape", "")
          .csv(path))
    return df.select(
        F.col("assertion").cast("long"),
        F.col("retraction").cast("long"),
        "graph",
        unescape_tsv(F.col("subject")).alias("subject"),
        unescape_tsv(F.col("predicate")).alias("predicate"),
        unescape_tsv(F.col("object")).alias("object"),
        "datatype",
        unescape_tsv(F.col("annotation")).alias("annotation"))


def read_prefix_tsv(spark, path: str) -> DataFrame:
    """S4: prefix TSV source (prefix.clj:8-12, header dropped)."""
    return (spark.read.option("sep", "\t").option("header", True)
            .csv(path).select("prefix", "base"))


def expand_df(statements: DataFrame, typed_owl: bool = False) -> DataFrame:
    """R10/R11 as a distributed operator: statement rows → thin
    triples (one-to-many, Arrow-batched). Wiring-subject groups are
    merged first, so the input is repartitioned AND sorted by subject —
    each skolem group arrives as a contiguous run and batches stream
    through with memory O(Arrow batch + largest group), never
    O(partition) (wiring groups are 2-5 rows; the sort is JVM-side)."""
    from .batching import grouped_batches
    thin_cols = [f.name for f in THIN.fields]
    emit_every = 20_000

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in grouped_batches(batches, "subject"):
            for r in merge_existential_rows(pdf.to_dict("records")):
                # blank labels are row-content-hash-local (core.expand),
                # so each expanded row is a closed stanza component: its
                # hash becomes the re-import grouping key (doc_id slot)
                comp = content_hash("\x1f".join(
                    str(r.get(k)) for k in ("subject", "predicate",
                                            "object", "datatype",
                                            "annotation")))
                for t in expand_statement_row(r, typed_owl=typed_owl):
                    out.append((t["subject"], t["predicate"], t["object"],
                                t["datatype"], t["is_blank_s"],
                                t["is_blank_o"], comp, 0))
            if len(out) >= emit_every:
                yield pd.DataFrame(out, columns=thin_cols)
                out = []
        if out:
            yield pd.DataFrame(out, columns=thin_cols)

    return (statements.repartition(F.col("subject"))
            .sortWithinPartitions("subject")
            .mapInPandas(expand, THIN))


def nt_node(v: str, blank: bool, prefixes: dict) -> str:
    """One N-Triples subject/predicate term."""
    if blank:
        return v.replace("_:", "_:b")
    return f"<{curie_to_iri(v, prefixes)}>"


def nt_object(v: str, dt: str, blank: bool, prefixes: dict) -> str:
    """One N-Triples object term (IRI, blank, or escaped literal)."""
    if blank or dt == "_JSONMAP":
        return v.replace("_:", "_:b")
    if dt == "_IRI":
        return f"<{curie_to_iri(v, prefixes)}>"
    lex = (v.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r")
           .replace("\t", "\\t"))
    if dt.startswith("@"):
        return f'"{lex}"{dt}'
    return f'"{lex}"^^<{curie_to_iri(dt, prefixes)}>'


def to_ntriples_lines(statements: DataFrame, prefix_df: DataFrame,
                      typed_owl: bool = False) -> DataFrame:
    """K3/K4: flat-triple rows → N-Triples text lines (IRIs expanded
    via the broadcast prefix map, curie-2-uri semantics
    thick_rdf.clj:32-43). Compound rows are expanded by expand_df
    first; literals are quoted with datatype/lang tags."""
    prefixes = {r["prefix"]: r["base"] for r in prefix_df.collect()}
    thin = expand_df(statements, typed_owl=typed_owl)

    def fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def node(v: str, blank: bool) -> str:
            return nt_node(v, blank, prefixes)

        def obj(v: str, dt: str, blank: bool) -> str:
            return nt_object(v, dt, blank, prefixes)

        for pdf in batches:
            lines = [
                f"{node(s, bs)} <{curie_to_iri(p, prefixes)}> "
                f"{obj(o, dt, bo)} ."
                for s, p, o, dt, bs, bo in zip(
                    pdf["subject"], pdf["predicate"], pdf["object"],
                    pdf["datatype"], pdf["is_blank_s"], pdf["is_blank_o"])
            ]
            yield pd.DataFrame({"value": lines})

    return thin.mapInPandas(fmt, "value string")


def write_ntriples(statements: DataFrame, prefix_df: DataFrame,
                   path: str, typed_owl: bool = False) -> None:
    to_ntriples_lines(statements, prefix_df, typed_owl=typed_owl) \
        .write.mode("overwrite").text(path)


# neither PN_PREFIX nor PN_LOCAL may END with '.' (a trailing dot is
# the statement terminator) — the local case was caught by hypothesis
# (tests/test_property.py); the prefix case is the same grammar rule
_PN_OK = re.compile(
    r"^[A-Za-z_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?:"
    r"[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?$")


def turtle_term(v: str, blank: bool, prefixes: dict,
                prefix_list: list) -> str:
    """One Turtle term: blank label, prefixed name (when the compaction
    is PN-valid) or <iri>."""
    if blank:
        return v.replace("_:", "_:b")
    iri = curie_to_iri(v, prefixes)
    c = curify_with(iri, prefix_list)
    if c.startswith("<") or not _PN_OK.match(c):
        return f"<{iri}>"
    return c


def turtle_literal(v: str, dt: str, prefixes: dict,
                   prefix_list: list) -> str:
    """Quoted Turtle literal with escapes + lang/datatype tag."""
    lex = (v.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r")
           .replace("\t", "\\t"))
    if dt.startswith("@"):
        return f'"{lex}"{dt}'
    if dt in ("xsd:string",
              "<http://www.w3.org/2001/XMLSchema#string>"):
        return f'"{lex}"'
    return f'"{lex}"^^{turtle_term(dt, False, prefixes, prefix_list)}'


def to_turtle_lines(statements: DataFrame, prefix_df: DataFrame,
                    typed_owl: bool = False) -> DataFrame:
    """K3/K4 Turtle form (export.clj:59-70, thick_rdf.clj:217-228):
    thin-triple rows → Turtle lines with CURIE compaction against the
    broadcast prefix map. Distributed analog of Jena's TURTLE_BLOCKS
    stream writer: every PARTITION is a standalone valid Turtle
    document (its own ``@prefix`` header), so a directory of part files
    is a valid Turtle dataset and each part parses independently."""
    prefix_list = [(r["prefix"], r["base"]) for r in prefix_df.collect()]
    prefixes = dict(prefix_list)
    thin = expand_df(statements, typed_owl=typed_owl)
    header = [f"@prefix {p}: <{b}> ." for p, b in
              sorted(prefix_list)] + [""]

    def term(v: str, blank: bool) -> str:
        return turtle_term(v, blank, prefixes, prefix_list)

    def literal(v: str, dt: str) -> str:
        return turtle_literal(v, dt, prefixes, prefix_list)

    def fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            lines = [] if not first else list(header)
            first = False
            for s, p, o, dt, bs, bo in zip(
                    pdf["subject"], pdf["predicate"], pdf["object"],
                    pdf["datatype"], pdf["is_blank_s"], pdf["is_blank_o"]):
                if bo or dt == "_JSONMAP":
                    obj = o.replace("_:", "_:b")
                elif dt == "_IRI":
                    obj = term(o, False)
                else:
                    obj = literal(o, dt)
                lines.append(f"{term(s, bs)} {term(p, False)} {obj} .")
            if lines:
                yield pd.DataFrame({"value": lines})

    return thin.mapInPandas(fmt, "value string")


def write_turtle(statements: DataFrame, prefix_df: DataFrame,
                 path: str, typed_owl: bool = False) -> None:
    to_turtle_lines(statements, prefix_df, typed_owl=typed_owl) \
        .write.mode("overwrite").text(path)
