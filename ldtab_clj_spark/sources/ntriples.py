"""N-Triples source (SURVEY.md S1/S2 for the one RDF format parseable
without Jena).

Reference: import.clj:148-154 (streamed triple iterator) /
rdf_model.clj:42-51 (eager model load). A distributed text scan +
vectorized regex parse replaces the pull iterator; the blank-node
closure that Jena's Model gave the reference for free is
operators/components.py.

Lines → thin triples: IRIs are CURIE-fied against the prefix table
(longest match, thin2thick.clj:35-42); literals keep their lexical
form with ``@lang`` / datatype-CURIE tags (thin2thick.clj:120-142).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core.canonical import curify_with
from ..schemas import THIN

_IRI = r"<([^>]*)>"
_BLANK = r"(_:[^\s]+)"
_LIT = r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?'
NT_LINE = re.compile(
    rf"^\s*(?:{_IRI}|{_BLANK})\s+{_IRI}\s+"
    rf"(?:{_IRI}|{_BLANK}|{_LIT})\s*\.\s*(?:#.*)?$")

_UNESCAPE = {"\\n": "\n", "\\r": "\r", "\\t": "\t",
             "\\b": "\b", "\\f": "\f", "\\'": "'",
             '\\"': '"', "\\\\": "\\"}


def _unescape(s: str) -> str:
    """N-Triples string unescaping incl. \\uXXXX / \\UXXXXXXXX numeric
    escapes (canonical NT tooling escapes all non-ASCII).

    A backslash that starts neither an ECHAR nor a well-formed UCHAR
    (e.g. ``\\z``, ``\\u12``) is a syntax error in both grammars —
    raise instead of passing the raw backslash through (ValueError →
    parse_nt_line skips the line; the Turtle reader converts it to
    TurtleError). The trailing lone-backslash alternative in the regex
    is what catches them: valid escapes match the longer branches
    first."""
    def sub(m):
        tok = m.group(0)
        if tok in _UNESCAPE:
            return _UNESCAPE[tok]
        if tok == "\\":
            raise ValueError(f"invalid string escape in {s[:80]!r}")
        cp = int(tok[2:], 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            # lone surrogates / out-of-range: not encodable as UTF-8 —
            # reject the line (ValueError → parse_nt_line skips it)
            raise ValueError(f"invalid UCHAR codepoint U+{cp:X}")
        return chr(cp)
    return re.sub(r'\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}|\\[nrtbf\'"\\]'
                  r'|\\', sub, s)


_NT_UCHAR = re.compile(r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}")


def _iri_unescape(iri: str) -> str:
    """UCHAR (\\uXXXX / \\UXXXXXXXX) unescaping inside IRIREF — the
    only escapes the N-Triples grammar allows in IRIs (canonical NT
    tooling escapes all non-ASCII IRI characters this way).

    Raises ValueError for codepoints outside Unicode or in the
    surrogate block (a lone surrogate would fail UTF-8 encoding much
    later, at the Arrow/parquet boundary); parse_nt_line turns that
    into the standard skip-the-line behavior."""
    if "\\" not in iri:        # fast path: virtually all lines
        return iri

    def sub(m):
        cp = int(m.group(0)[2:], 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            raise ValueError(f"invalid UCHAR codepoint U+{cp:X}")
        return chr(cp)

    return _NT_UCHAR.sub(sub, iri)


def parse_nt_line(line: str, prefixes: list[tuple[str, str]]):
    """One N-Triples line → thin-triple tuple, or None for blank /
    comment / unparseable lines."""
    if not line or line.lstrip().startswith("#"):
        return None
    m = NT_LINE.match(line)
    if not m:
        return None
    (s_iri, s_blank, p_iri, o_iri, o_blank,
     o_lex, o_lang, o_dt) = m.groups()
    try:
        return _parse_groups(s_iri, s_blank, p_iri, o_iri, o_blank,
                             o_lex, o_lang, o_dt, prefixes)
    except ValueError:
        # malformed UCHAR (out-of-range / surrogate codepoint): the
        # line is unparseable — skip it like any other bad line
        # instead of failing the whole task
        return None


def _parse_groups(s_iri, s_blank, p_iri, o_iri, o_blank,
                  o_lex, o_lang, o_dt, prefixes):
    subject = s_blank if s_blank \
        else curify_with(_iri_unescape(s_iri), prefixes)
    predicate = curify_with(_iri_unescape(p_iri), prefixes)
    if o_blank:
        obj, dt = o_blank, "_JSONMAP"
    elif o_iri is not None:
        obj, dt = curify_with(_iri_unescape(o_iri), prefixes), "_IRI"
    else:
        obj = _unescape(o_lex)
        if o_lang:
            dt = f"@{o_lang}"
        elif o_dt:
            dt = curify_with(_iri_unescape(o_dt), prefixes)
        else:
            dt = "xsd:string"  # plain literal (Jena can't tell either,
            #                    thin2thick.clj:125)
    return (subject, predicate, obj, dt,
            subject.startswith("_:"), bool(o_blank))


def parse_nt_lines(lines: DataFrame,
                   prefixes: list[tuple[str, str]],
                   skipped_acc=None) -> DataFrame:
    """text lines DataFrame (column ``value``) → thin triples; shared
    by the batch reader and the streaming import.

    ``skipped_acc``: optional SparkContext accumulator incremented for
    every non-blank, non-comment line that fails to parse (grammar
    mismatch OR invalid escape — the r4 strictness change made escape-
    invalid literals vanish silently; the counter makes dropped lines
    visible, matching the fail-loudly principle). Accumulator value is
    exact only after an action has consumed the full scan."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            skipped = 0
            for line in pdf["value"]:
                t = parse_nt_line(line, prefixes)
                if t:
                    rows.append((*t, "", 0))
                elif line.strip() and not line.lstrip().startswith("#"):
                    skipped += 1
            if skipped_acc is not None and skipped:
                skipped_acc.add(skipped)
            yield pd.DataFrame(rows,
                               columns=[f.name for f in THIN.fields])

    return lines.mapInPandas(parse, THIN)


def read_ntriples(spark: SparkSession, path: str,
                  prefix_df: DataFrame,
                  skipped_acc=None) -> DataFrame:
    """Distributed N-Triples scan → thin triples (doc_id empty; run
    operators/components.assign_components before stanza assembly)."""
    prefixes = [(r["prefix"], r["base"]) for r in prefix_df.collect()]
    return parse_nt_lines(spark.read.text(path), prefixes, skipped_acc)


def import_ntriples(spark: SparkSession, path: str,
                    prefix_df: DataFrame,
                    skipped_acc=None) -> DataFrame:
    """Full `ldtab import file.nt` equivalent: parse → component
    closure → stanza assembly → dedup. Returns the statement table."""
    from ..operators.components import assign_components
    from ..operators.materialize import dedup_statements
    from ..operators.stanza import thin_to_thick_df
    thin = assign_components(
        read_ntriples(spark, path, prefix_df, skipped_acc))
    return dedup_statements(thin_to_thick_df(thin))
