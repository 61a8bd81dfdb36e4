"""Deduplication operators over a documents table — the training-data
pipeline ops that complement the KG engine at 100 TB scale.

All hashing is md5-based so every operator has an exact cross-engine
SQL oracle (DuckDB) — no engine-specific hash functions in results.

Scale notes:
* exact dedup: one hash-aggregate, map-side combinable — the cheapest
  possible shuffle; at 100 TB, group on ``md5(text)`` not ``text`` so
  shuffle keys are 32 bytes.
* MinHash+LSH: signatures are per-row (narrow), candidate generation
  shuffles on band keys only — the O(N²) all-pairs join never happens.
  This is the scale path; ``word_jaccard_pairs`` (exact) is the
  verifier/baseline and is quadratic in documents per shared word.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: (h, keep_id, dupes)."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("h"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("dupes")))


def doc_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, word) — the shingle relation used by the
    similarity family."""
    return (docs.select("doc_id",
                        F.explode(F.split(F.trim(F.col(text_col)),
                                          r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .distinct())


def word_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                       text_col: str = "text",
                       max_rows: int | None = None) -> DataFrame:
    """Exact word-set Jaccard near-dup pairs (doc_a < doc_b, jaccard).

    Candidate pairs via a self-join on shared words (SURVEY.md-style
    semi-join candidate generation); exact at test scale — quadratic
    per shared word — superseded by ``minhash_lsh_pairs`` at 100 TB.
    Guarded: refuses corpus-scale input (BruteForceScaleError).
    """
    from .guards import guard_brute_force
    guard_brute_force(docs, "word_jaccard_pairs", "minhash_lsh_pairs",
                      max_rows)
    # no cache(): both consumers (sizes, the self-join) reuse the same
    # shuffle output, and a pinned copy would leak storage memory in
    # long-lived sessions
    words = doc_words(docs, text_col)
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = words.alias("a")
    b = words.alias("b")
    inter = (a.join(b, "word")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    na = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("nb"))
    return (inter.join(na, "doc_a").join(nb, "doc_b")
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("na") + F.col("nb") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def repeated_segment_stats(docs: DataFrame, text_col: str = "text",
                           seg_words: int = 10,
                           min_docs: int = 3) -> DataFrame:
    """C4-style boilerplate detection: fixed ``seg_words``-word
    segments that recur across ≥ ``min_docs`` DISTINCT documents are
    boilerplate; returns (doc_id, n_segments, n_boilerplate) so a
    cleaner can drop or down-weight them.

    Scale shape: one explode to (doc_id, segment-md5), one
    count-distinct aggregation on the 32-byte hash, one hash join
    back — shuffle keys are hashes, never text; at 100 TB the
    boilerplate relation is small (only segments passing the
    threshold) and broadcasts."""
    from .parallel import widen_partitions
    docs = widen_partitions(docs.select("doc_id", text_col),
                            min_bytes=0)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    nseg = F.ceil(F.size(words) / seg_words).cast("int")
    seg = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(words, i * seg_words + 1, seg_words), " "))
    segs = (docs.select("doc_id", F.explode(seg).alias("segment"))
            .withColumn("h", F.md5("segment")).drop("segment"))
    boiler = (segs.groupBy("h")
              .agg(F.count_distinct("doc_id").alias("nd"))
              .filter(F.col("nd") >= min_docs)
              .select("h", F.lit(1).alias("is_b")))
    return (segs.join(boiler, "h", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_segments"),
                 F.count("is_b").alias("n_boilerplate")))


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components over
    the (doc_a, doc_b) edge set via the same iterative min-label
    propagation the blank-node closure uses (operators/components.py).
    Returns (doc_id, cluster) where cluster = the component's minimum
    doc_id — i.e. the representative a dedup pass keeps; every other
    row in the cluster is a drop candidate. Only docs that appear in a
    pair are returned (singletons are trivially their own cluster).

    Scale shape: the candidate-pair relation is tiny next to the
    corpus (it's already banded), so each round's self-join shuffles
    narrow (id, label) rows; rounds = O(log component diameter)."""
    from .components import min_label_components
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (e.unionByName(e.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
             .distinct().localCheckpoint())
    nodes = edges.select("a").distinct()
    return (min_label_components(edges, nodes)
            .select(F.col("a").alias("doc_id"),
                    F.col("component").alias("cluster")))


N_MINHASH = 8
BAND_SIZE = 2


def doc_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) word-bigram shingles — all JVM-side
    array ops (split → zip_with of adjacent slices), no Python.

    The input is widened to core count first: the explode + per-shingle
    md5 aggregations downstream are per-row-expensive, and a single-
    row-group scan would otherwise run them on one task
    (operators/parallel.py)."""
    from .parallel import widen_partitions
    docs = widen_partitions(docs.select("doc_id", text_col),
                            min_bytes=0)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = F.zip_with(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return (docs.select("doc_id", F.explode(bigrams).alias("shingle"))
            .filter(F.col("shingle").isNotNull())
            .distinct())


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_hashes: int = N_MINHASH,
                       mode: str = "sql") -> DataFrame:
    """Per-doc MinHash signature over bigram shingles:
    sig_i = min(md5(i || ':' || shingle)).

    A string-min MinHash — identical semantics to integer MinHash (any
    total order on a good hash works) and exactly reproducible in ANSI
    SQL for the oracle. ``mode="sql"`` is that Catalyst form — the
    right SHAPE, but min(string) buffers are not hash-aggregable, so
    the signature aggregation runs as a SortAggregate over the full
    shingle relation. ``mode="arrow"`` computes the identical
    signatures in one hashlib pass per doc (bit parity pinned by
    test_minhash_arrow_matches_sql) — the throughput path, same
    pattern as the SimHash/SRP/IVF arrow twins.
    """
    if mode == "arrow":
        return _minhash_arrow(docs, text_col, n_hashes)
    if mode != "sql":
        raise ValueError(f"unknown minhash mode {mode!r} "
                         "(use 'sql' or 'arrow')")
    shingles = doc_shingles(docs, text_col)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"sig{i}") for i in range(n_hashes)]
    return shingles.groupBy("doc_id").agg(*aggs)


def _minhash_arrow(docs: DataFrame, text_col: str,
                   n_hashes: int) -> DataFrame:
    """hashlib MinHash — BIT-IDENTICAL to the Catalyst form: same
    bigram shingle set (tokenization parity rules as _simhash_arrow:
    strip U+0020 only, ASCII-\\s split keeping empty tokens), same
    md5('i:' || shingle) families, and the min over DIGEST BYTES
    equals the min over lowercase-hex strings (both are the md5
    value's lexicographic byte order). Docs with no bigram emit no
    row, exactly like the empty groupBy group."""
    import hashlib

    import pandas as pd

    _ws = re.compile("[ \t\n\x0b\f\r]+")
    prefixes = [f"{i}:".encode() for i in range(n_hashes)]
    sig_cols = [f"sig{i}" for i in range(n_hashes)]

    def sig(batches):
        for pdf in batches:
            out_ids, out_sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None:
                    continue
                words = _ws.split(text.strip(" "))
                if len(words) < 2:
                    continue
                shingles = {f"{a} {b}".encode("utf-8")
                            for a, b in zip(words, words[1:])}
                mins = [None] * n_hashes
                for s in shingles:
                    for i, p in enumerate(prefixes):
                        d = hashlib.md5(p + s).digest()
                        if mins[i] is None or d < mins[i]:
                            mins[i] = d
                out_ids.append(doc_id)
                out_sigs.append([m.hex() for m in mins])
            yield pd.DataFrame(
                {"doc_id": out_ids,
                 **{c: [s[i] for s in out_sigs]
                    for i, c in enumerate(sig_cols)}})

    from .parallel import widen_partitions
    doc_type = dict(docs.dtypes)["doc_id"]
    schema = f"doc_id {doc_type}, " + ", ".join(
        f"{c} string" for c in sig_cols)
    return widen_partitions(docs.select("doc_id", text_col),
                            min_bytes=0).mapInPandas(
        sig, schema)


_HEX = "0123456789abcdef"
SIMHASH_NIBBLES = 16  # 64-bit signature as 16 hex nibbles


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       mode: str = "sql") -> DataFrame:
    """64-bit SimHash over bigram shingles as a 16-hex-char string.

    ``mode="sql"`` (oracle path): pure integer/string arithmetic (md5
    nibbles → bit sums → majority vote → hex), identical in Spark and
    ANSI SQL — no engine hash functions leak into results. All
    JVM-side; the per-doc aggregation is one map-side-combinable
    groupBy — the right SHAPE, but its 65 aggregate expressions are
    interpreted per shingle row. ``mode="arrow"`` computes the same
    bits in one numpy pass per doc (bit-identical, pinned by test) —
    the throughput path.
    """
    if mode == "arrow":
        return _simhash_arrow(docs, text_col)
    if mode != "sql":
        raise ValueError(f"unknown simhash mode {mode!r} "
                         "(use 'sql' or 'arrow')")
    sh = doc_shingles(docs, text_col).withColumn(
        "h", F.md5(F.col("shingle")))
    # bit sums: nibble p (1..16), bit j (0..3)
    aggs = [F.count("*").alias("cnt")]
    for p in range(1, SIMHASH_NIBBLES + 1):
        v = F.instr(F.lit(_HEX), F.substring("h", p, 1)) - 1
        for j in range(4):
            aggs.append(F.sum((v.cast("long") / (2 ** j)).cast("long") % 2)
                        .alias(f"s{p}_{j}"))
    agg = sh.groupBy("doc_id").agg(*aggs)
    chars = []
    for p in range(1, SIMHASH_NIBBLES + 1):
        nib = None
        for j in range(4):
            bit = F.when(2 * F.col(f"s{p}_{j}") >= F.col("cnt"), 1) \
                .otherwise(0) * (2 ** j)
            nib = bit if nib is None else nib + bit
        chars.append(F.substr(F.lit(_HEX), nib + 1, F.lit(1)))
    return agg.select("doc_id", F.concat(*chars).alias("simhash"))


def _simhash_arrow(docs: DataFrame, text_col: str) -> DataFrame:
    """numpy/hashlib SimHash — the throughput twin of the Catalyst
    form (65 aggregate expressions evaluate interpreted per shingle
    row; one md5 + bit-count pass per doc in a mapInPandas batch is
    the fast path). BIT-IDENTICAL output to ``mode="sql"`` (pinned by
    test): same bigram shingle set, same md5-nibble bit sums, same
    majority rule."""
    import hashlib

    import numpy as np
    import pandas as pd

    # EXACT tokenization parity with the Catalyst path: F.trim strips
    # U+0020 only, Java regex \s is ASCII-only, F.split keeps empty
    # tokens, and doc_shingles does NOT drop empty-word shingles —
    # unicode-\s Python splitting or an `if w` filter would emit
    # different signatures for docs with tabs/newlines/NBSP (pinned by
    # test_simhash_arrow_matches_sql's whitespace-edge corpus)
    _ws = re.compile("[ \t\n\x0b\f\r]+")

    def sig(batches):
        for pdf in batches:
            out_ids, out_sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None:
                    continue   # sql path: null split → no shingles
                words = _ws.split(text.strip(" "))
                shingles = {f"{a} {b}"
                            for a, b in zip(words, words[1:])}
                if not shingles:
                    continue
                # set iteration order is irrelevant: bit SUMS commute
                d = np.frombuffer(
                    b"".join(hashlib.md5(s.encode("utf-8")).digest()
                             for s in shingles),
                    dtype=np.uint8).reshape(-1, 16)[:, :8]
                nib = np.empty((len(d), 16), np.uint8)
                nib[:, 0::2] = d >> 4          # hex string nibble order
                nib[:, 1::2] = d & 0xF
                bits = (nib[:, :, None] >> np.arange(4)) & 1
                maj = (2 * bits.sum(axis=0) >= len(d))   # 16 × 4 bools
                vals = (maj << np.arange(4)).sum(axis=1)
                out_ids.append(doc_id)
                out_sigs.append("".join(_HEX[v] for v in vals))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sigs})

    from .parallel import widen_partitions
    doc_type = dict(docs.dtypes)["doc_id"]
    return widen_partitions(docs.select("doc_id", text_col),
                            min_bytes=0).mapInPandas(
        sig, f"doc_id {doc_type}, simhash string")


def _band_pairs(bands_df: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) → distinct candidate pairs (doc_a < doc_b)
    via a bucket-key self-join. SHUFFLE_HASH-hinted: the planner's
    broadcast choice computed the ENTIRE signature subplan (shingle
    explode + aggregation / MapInPandas) a second time for the build
    side and then collected it through a serial BroadcastExchange
    build — measured as the duplicated stanza in the r06 before-plans
    and a 8.6→5.0 s drop for simhash when hinted. With both sides
    shuffled on (band, bucket), the sides run as parallel shuffle
    stages (and being identical subplans, exchange reuse can dedupe
    them outright), and the hash join skips sort-merge sorts."""
    a, b = bands_df.alias("a"), bands_df.hint("shuffle_hash").alias("b")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")))
    # pair-keyed repartition BEFORE the dedup: near-dup corpora make
    # some buckets huge, so the join output is skewed and a plain
    # distinct runs its partial aggregate single-threaded on the hot
    # partitions (measured 5.0 s vs 3.6 s at 7.9M candidate pairs,
    # sf1.0). The explicit exchange spreads pairs evenly and already
    # satisfies the aggregate's distribution, so the dedup collapses
    # to one even HashAggregate. Width pinned for the same reason as
    # the SRP confirm (per-row cost; AQE would coalesce ~16-byte rows)
    sc = bands_df.sparkSession.sparkContext
    return (pairs.repartition(sc.defaultParallelism, "doc_a", "doc_b")
            .dropDuplicates())


def simhash_pairs(docs: DataFrame, text_col: str = "text",
                  bands: int = 4, mode: str = "sql") -> DataFrame:
    """Near-dup candidates: docs whose SimHash matches on any of
    ``bands`` contiguous nibble quarters (≈ small hamming distance).
    Same banded-LSH shuffle shape as minhash_lsh_pairs: one signature
    aggregation, one explode — not one aggregation per band."""
    sigs = simhash_signatures(docs, text_col, mode=mode)
    width = SIMHASH_NIBBLES // bands
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.substring("simhash", b * width + 1, width)
                 .alias("bucket"))
        for b in range(bands)])
    all_bands = (sigs.select("doc_id", F.explode(band_arr).alias("bb"))
                 .select("doc_id", "bb.band", "bb.bucket"))
    return _band_pairs(all_bands)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      n_hashes: int = N_MINHASH,
                      band_size: int = BAND_SIZE,
                      mode: str = "sql") -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band
    (band = concat of ``band_size`` adjacent signature slots).
    Shuffles on band keys only — never all-pairs. The per-band bucket
    ids are built as one array-of-structs on the aggregated signature
    row and exploded in a single Generate (one aggregation pass, was
    one per band via union). ``mode`` selects the signature path
    (see minhash_signatures); banding and pairing stay identical."""
    sigs = minhash_signatures(docs, text_col, n_hashes, mode=mode)
    n_bands = n_hashes // band_size
    band_arr = F.array(*[
        F.struct(F.lit(bi).alias("band"),
                 F.md5(F.concat_ws("|", *[
                     F.col(f"sig{bi * band_size + j}")
                     for j in range(band_size)])).alias("bucket"))
        for bi in range(n_bands)])
    all_bands = (sigs.select("doc_id", F.explode(band_arr).alias("bb"))
                 .select("doc_id", "bb.band", "bb.bucket"))
    return _band_pairs(all_bands)
