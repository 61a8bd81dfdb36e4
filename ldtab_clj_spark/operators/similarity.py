"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force top-k: broadcast the (small) query set,
  JVM-side ``zip_with``/``aggregate`` dot products (no Python), window
  rank per query. The exact baseline.
* ``lsh_cosine_topk`` — sign-random-projection (SimHash-style) bucketed
  variant: candidates only from matching hyperplane-sign buckets; the
  100 TB path (shuffle on short bucket keys instead of all-pairs).

Doubles throughout (cast from float32 first) so the DuckDB oracle's
arithmetic matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn(
        "_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding") -> DataFrame:
    """For each query vector: top-k nearest corpus vectors by cosine.

    Returns (query_id, neighbor_id, rnk). Ties broken by neighbor id;
    the similarity itself stays internal (floats don't hash stably
    across engines at the boundary, ranks do).
    """
    from .parallel import widen_partitions
    corpus = with_norm(widen_partitions(
        embeddings.select("vec_id", vec_col), min_bytes=0), vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "_v", "_norm")
    qs = with_norm(queries, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_q"), F.col("_norm").alias("_qnorm"))
    scored = (corpus.join(F.broadcast(qs),
                          F.col("neighbor_id") != F.col("query_id"))
              .withColumn("sim", _dot(F.col("_v"), F.col("_q"))
                          / (F.col("_norm") * F.col("_qnorm"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk"))


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          vec_col: str = "embedding",
                          max_rows: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b).

    Brute-force all-pairs at test scale (the exact baseline); the LSH
    path (``srp_banded_near_dup``) is the 100 TB candidate generator.
    Guarded: refuses corpus-scale input (BruteForceScaleError)."""
    from .guards import guard_brute_force
    guard_brute_force(embeddings, "cosine_near_dup_pairs",
                      "srp_banded_near_dup", max_rows)
    n = with_norm(embeddings, vec_col).select("vec_id", "_v", "_norm")
    a = n.select(F.col("vec_id").alias("vec_a"),
                 F.col("_v").alias("_va"), F.col("_norm").alias("_na"))
    b = n.select(F.col("vec_id").alias("vec_b"),
                 F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
            .withColumn("sim", _dot(F.col("_va"), F.col("_vb"))
                        / (F.col("_na") * F.col("_nb")))
            .filter(F.col("sim") >= threshold)
            .select("vec_a", "vec_b"))


_M64 = (1 << 64) - 1


def _coeff(t: int, k: int, d: int) -> int:
    """splitmix64-style avalanche over the (table, plane, dim) index —
    no linear stride, so NO parameter combination can alias one plane's
    coefficient subsequence into another's (a t*A+k*B+d scheme reuses
    subsequences as soon as k*B+dim crosses a stride)."""
    x = (t * 0x9E3779B97F4A7C15 + k * 0xBF58476D1CE4E5B9
         + d * 0x94D049BB133111EB + 0x2545F4914F6CDD1D) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return x % 21 - 10


def srp_plane_tables(n_tables: int = 8, k_planes: int = 3,
                     dim: int = 64) -> list[list[list[int]]]:
    """Deterministic integer hyperplanes for SRP-LSH (avalanche-mixed,
    range -10..10). Integer coefficients are exact in IEEE double, so
    bucket signs are bit-identical across engines — verified 0
    mismatches vs DuckDB over the synthetic corpus. ``k_planes`` per
    table controls selectivity (grow with corpus size ~ log N);
    ``n_tables`` OR-ed tables trade shuffle volume for recall."""
    return [[[_coeff(t, k, d) for d in range(dim)]
             for k in range(k_planes)]
            for t in range(n_tables)]


def _list_matrix(col):
    """Arrow list column → 2D float64 numpy matrix. Zero-copy reshape
    of the flat values buffer when every row has the same width (the
    fixed-dim embedding case) — np.stack over a million small per-row
    ndarrays was the measured cost of the pandas_udf confirm path;
    ragged input falls back to the per-row copy."""
    import numpy as np
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy()
    vals = col.values.to_numpy(zero_copy_only=False)
    widths = off[1:] - off[:-1]
    if len(widths) and (widths == widths[0]).all():
        d = int(widths[0])
        return (vals[off[0]:off[-1]]
                .reshape(-1, d).astype(np.float64, copy=False))
    return np.array([vals[a:b] for a, b in zip(off[:-1], off[1:])],
                    dtype=np.float64)


def _confirm_pairs_arrow(pairs: DataFrame, threshold: float) -> DataFrame:
    """Exact-cosine confirm of candidate pairs in one mapInArrow pass:
    float32 vectors cross the boundary raw (half the Arrow bytes of
    the former double-array transport; the float64 cast inside numpy
    is exact, so sims are bit-identical), the einsum dot and the
    dot/(na*nb) division reproduce the former JVM expression's IEEE
    sequence, and only the surviving (vec_a, vec_b) ids return to the
    JVM."""
    import numpy as np
    import pyarrow as pa

    def confirm(batches):
        for rb in batches:
            if not rb.num_rows:
                continue
            names = rb.schema.names
            va = _list_matrix(rb.column(names.index("_va")))
            vb = _list_matrix(rb.column(names.index("_vb")))
            na = rb.column(names.index("_na")).to_numpy(
                zero_copy_only=False)
            nb = rb.column(names.index("_nb")).to_numpy(
                zero_copy_only=False)
            sim = np.einsum("ij,ij->i", va, vb) / (na * nb)
            keep = pa.array(sim >= threshold)
            yield pa.RecordBatch.from_arrays(
                [rb.column(names.index("vec_a")).filter(keep),
                 rb.column(names.index("vec_b")).filter(keep)],
                names=["vec_a", "vec_b"])

    return pairs.mapInArrow(confirm, "vec_a long, vec_b long")


def _pair_dot_seq_udf():
    """Vectorized pair dot accumulating dimension-by-dimension in
    index order — BIT-identical to the Catalyst fold (einsum's blocked
    summation is only value-equal to the last ulp). Used where the
    arrow twin must preserve exact rank order, e.g. IVF probe scoring;
    still vectorized ACROSS rows, so ~dim numpy ops per batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def pair_dot(a, b):
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(len(A))
        for d in range(A.shape[1]):
            acc += A[:, d] * B[:, d]
        return pd.Series(acc)
    pair_dot.__annotations__ = {"a": pd.Series, "b": pd.Series,
                                "return": pd.Series}
    return pandas_udf(pair_dot, "double")


def _srp_bands_arrow(embeddings: DataFrame, plane_tables,
                     vec_col: str) -> DataFrame:
    """(vec_id, _v, _norm, tbl, bucket) via ONE numpy matmul per Arrow
    batch — the throughput path. The Catalyst form builds a fold
    expression per plane (O(tables × planes × dim) literal tree):
    bit-exact for the oracle but interpreted per element and expensive
    to even ANALYZE at L×k=64. Sign flips from summation-order
    differences can only nudge RECALL (candidates are exactly
    confirmed downstream), never precision."""
    import numpy as np
    import pandas as pd
    planes = np.array([p for t in plane_tables for p in t],
                      dtype=np.float64)                    # (L*k, dim)
    n_tables, k = len(plane_tables), len(plane_tables[0])
    weights = (1 << np.arange(k)).astype(np.int64)

    def bands(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding_d"].to_numpy())   # n × dim
            bits = (v @ planes.T) >= 0                    # n × (L*k)
            buckets = bits.reshape(len(pdf), n_tables, k) @ weights
            # NARROW output only — vectors never cross Arrow here (the
            # confirm stage joins them back per unique candidate pair)
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                "tbl": np.tile(np.arange(n_tables), len(pdf)),
                "bucket": buckets.reshape(-1),
            })

    from .parallel import widen_partitions
    src = widen_partitions(
        embeddings.select("vec_id",
                          _as_double(F.col(vec_col)).alias("embedding_d")),
        min_bytes=0)
    return src.mapInPandas(bands, "vec_id long, tbl int, bucket long")


def srp_banded_near_dup(embeddings: DataFrame,
                        plane_tables: list[list[list[float]]],
                        threshold: float = 0.95,
                        vec_col: str = "embedding",
                        mode: str = "sql") -> DataFrame:
    """Embedding near-dup pairs via multi-table SRP-LSH — the 100 TB
    path: candidates come only from same-(table, bucket) self-joins
    (shuffle on short keys, never all-pairs), then the exact cosine
    confirms. Single-pass: one array-of-structs explode per row, no
    per-table recompute. Recall < 1 by design (1-(1-p^k)^L); the
    brute-force ``cosine_near_dup_pairs`` is the test-scale verifier.

    ``mode``: "sql" = pure Catalyst expressions, bit-identical to the
    DuckDB oracle (the audited path); "arrow" = numpy-matmul bucketing
    + vectorized pair confirm (the throughput path — same pairs on the
    corpus, pinned by tests)."""
    if mode == "arrow":
        bands = _srp_bands_arrow(embeddings, plane_tables, vec_col)
    elif mode != "sql":
        raise ValueError(f"unknown srp mode {mode!r} "
                         "(use 'sql' or 'arrow')")
    else:
        from .parallel import widen_partitions
        n = with_norm(widen_partitions(
            embeddings.select("vec_id", vec_col), min_bytes=0), vec_col)
        structs = []
        for t, planes in enumerate(plane_tables):
            bits = []
            for p in planes:
                arr = F.array(*[F.lit(float(x)) for x in p])
                bits.append(F.when(_dot(F.col("_v"), arr) >= 0,
                                   F.lit("1")).otherwise(F.lit("0")))
            structs.append(F.struct(F.lit(t).alias("tbl"),
                                    F.concat(*bits).alias("bucket")))
        bands = (n.select("vec_id",
                          F.explode(F.array(*structs)).alias("bb"))
                 .select("vec_id", "bb.tbl", "bb.bucket"))
    # candidate pairs from the NARROW band relation, deduped BEFORE the
    # exact confirm: a true near-dup collides in several of the L
    # tables, so confirming per (tbl, bucket) duplicate would run the
    # dot product up to L times per pair AND drag the vectors through
    # the band shuffle; joining vectors back per UNIQUE pair is two
    # narrow hash joins instead
    # SHUFFLE_HASH hint: the broadcast self-join recomputed the whole
    # banding subplan (the numpy matmul MapInPandas, or the Catalyst
    # fold explode) for the build side and then serialized it through
    # a driver-side broadcast build; shuffling both sides on
    # (tbl, bucket) runs them as parallel shuffle stages instead —
    # see _band_pairs in dedup.py for the measured win
    a, b = bands.alias("a"), bands.hint("shuffle_hash").alias("b")
    cand = (a.join(b, ["tbl", "bucket"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b")))
    from .parallel import widen_partitions
    if mode == "arrow":
        # throughput path: no pre-confirm distinct — at bench scale the
        # table overlap is ~2%, so deduping candidates cost a full
        # exchange plus two hash aggregates over the 7M-pair relation
        # (its partial aggregate running on the SKEWED bucket-join
        # output) to avoid 2% of re-confirms. A pair-keyed hash
        # repartition of the narrow id pairs spreads the hot buckets
        # with a pure exchange instead (measured 8.1 s vs 10.3 s for
        # distinct-then-confirm, A/B'd in one session), vectors attach
        # to the even partitions, and the terminal distinct keeps the
        # exact set semantics (it must exist anyway for duplicate
        # input ids). The width is PINNED (explicit N): the confirm's
        # cost is per-row Python, and AQE's byte-based coalescing
        # would shrink the ~16-byte-per-row relation to a couple of
        # tasks (the round-5 stanza-stage lesson). Vectors cross Arrow
        # as raw float32 (exact cast to float64 in numpy) and only
        # surviving ids come back.
        sc = embeddings.sparkSession.sparkContext
        cand = cand.repartition(sc.defaultParallelism, "vec_a", "vec_b")
        vecs = with_norm(widen_partitions(
            embeddings.select("vec_id", vec_col), min_bytes=0), vec_col) \
            .select("vec_id", F.col(vec_col).alias("_raw"), "_norm")
        va = vecs.select(F.col("vec_id").alias("vec_a"),
                         F.col("_raw").alias("_va"),
                         F.col("_norm").alias("_na"))
        vb = vecs.select(F.col("vec_id").alias("vec_b"),
                         F.col("_raw").alias("_vb"),
                         F.col("_norm").alias("_nb"))
        pairs = (cand.join(va, "vec_a").join(vb, "vec_b")
                 .select("vec_a", "vec_b", "_va", "_vb", "_na", "_nb"))
        return _confirm_pairs_arrow(pairs, threshold).distinct()
    # oracle path: candidates deduped BEFORE the exact confirm (the
    # interpreted fold is expensive per pair), vectors joined back per
    # unique pair as double arrays, sim in pure Catalyst expressions
    cand = cand.distinct()
    vecs = with_norm(widen_partitions(
        embeddings.select("vec_id", vec_col), min_bytes=0), vec_col) \
        .select("vec_id", "_v", "_norm")
    va = vecs.select(F.col("vec_id").alias("vec_a"),
                     F.col("_v").alias("_va"),
                     F.col("_norm").alias("_na"))
    vb = vecs.select(F.col("vec_id").alias("vec_b"),
                     F.col("_v").alias("_vb"),
                     F.col("_norm").alias("_nb"))
    pairs = cand.join(va, "vec_a").join(vb, "vec_b")
    sim = _dot(F.col("_va"), F.col("_vb")) \
        / (F.col("_na") * F.col("_nb"))
    # terminal distinct: duplicate vec_ids in the INPUT (un-deduped
    # appends) would otherwise multiply pairs through the vector joins
    return (pairs.withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select("vec_a", "vec_b")
            .distinct())


def _minid_centroids(embeddings: DataFrame, n_centroids: int,
                     vec_col: str) -> DataFrame:
    """The ``n_centroids`` corpus vectors with the lowest vec_ids
    (orderBy + limit — id-dense or sparse alike): a deterministic
    stand-in for a k-means pass that any cross-engine oracle can
    reproduce exactly."""
    return (with_norm(embeddings.orderBy("vec_id").limit(n_centroids),
                      vec_col)
            .select(F.col("vec_id").alias("cent_id"),
                    F.col("_v").alias("_c"),
                    F.col("_norm").alias("_cnorm")))


def _assign_arrow(corpus: DataFrame, cent_rows) -> DataFrame:
    """Arrow-batched twin of the literal-fold assignment: one
    vectorized pass per batch instead of ~n_centroids × dim interpreted
    boxed multiply-adds per row (the round-3 hot-path finding).

    BIT-IDENTICAL to the sql mode, not merely equivalent: the dot
    products accumulate dimension-by-dimension in index order
    (``sims += V[:, d] ⊗ C[:, d]``), reproducing the Catalyst fold's
    left-to-right IEEE addition sequence exactly — a plain matmul's
    blocked summation could flip an argmax between two near-tied
    centroids. Ties and NaNs also match: centroids are ordered by
    cent_id and np.argmax takes the FIRST max (= lowest cent_id, the
    struct-order rule), and a NaN row argmaxes to its first NaN just
    as Spark's NaN-is-largest ordering does. Parity is pinned by
    tests/test_similarity.py on real corpora per the repo's
    Catalyst-parity rule for arrow twins."""
    import numpy as np
    import pandas as pd
    C = np.array([r["_c"] for r in cent_rows], dtype=np.float64)
    cnorm = np.array([float(r["_cnorm"]) for r in cent_rows])
    cent_ids = np.array([int(r["cent_id"]) for r in cent_rows],
                        dtype=np.int32)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            sims = np.zeros((len(pdf), len(C)))
            for d in range(C.shape[1]):  # fold-order accumulation
                sims += V[:, d, None] * C[None, :, d]
            sims /= (pdf["_norm"].to_numpy()[:, None] * cnorm[None, :])
            pdf = pdf.copy()
            pdf["cent_id"] = cent_ids[np.argmax(sims, axis=1)]
            yield pdf

    return corpus.select("vec_id", "_v", "_norm").mapInPandas(
        assign, "vec_id long, _v array<double>, _norm double, "
                "cent_id int")


def _assign_to_centroids(corpus: DataFrame, cent: DataFrame,
                         mode: str = "sql") -> DataFrame:
    """(vec_id, _v, _norm) → nearest-centroid assignment as a PURE MAP:
    the centroid table is broadcast-sized by definition, so it is
    collected (like a prefix table) and folded into a literal argmax
    expression — highest csim, lowest cent_id on ties, exactly the row
    the old row_number window picked. No join, no n_centroids-way row
    expansion, no aggregate, no shuffle, no sort: assignment fuses into
    the corpus scan's project (WholeStageCodegen), which is the plan
    you'd want at 10^12 rows. (A max_by aggregate was measured first:
    carrying the vector payload forces SortAggregate — a local sort of
    n_centroids × N rows — because array buffers aren't
    hash-aggregable.)"""
    cent_rows = sorted(cent.collect(), key=lambda r: r["cent_id"])
    if not cent_rows:
        raise ValueError("empty centroid table")
    if mode == "arrow":
        return _assign_arrow(corpus, cent_rows)
    if mode != "sql":
        raise ValueError(f"unknown assign mode {mode!r} "
                         "(use 'sql' or 'arrow')")
    # one candidate struct per centroid, argmax via array_max's
    # lexicographic struct order: highest csim, then highest -cent_id
    # (= lowest cent_id). Linear expression tree — a chained
    # when(best, cand) would duplicate `best` per level (exponential
    # blowup, measured as a driver OOM at 16 centroids × 64 dims).
    # The whole expression is rendered as ONE SQL string and parsed
    # JVM-side: building it from n_centroids × dim F.lit() Column
    # objects cost ~1 s of py4j round trips per query construction
    # (r06 measurement) for the identical Catalyst tree; repr() of a
    # Python float round-trips the exact double, so every literal is
    # bit-identical to the former F.lit(float(x)).
    def dot_sql(vec, coeffs):
        arr = ",".join(f"{float(x)!r}D" for x in coeffs)
        return (f"aggregate(zip_with({vec}, array({arr}), "
                "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")

    cands_sql = "array(" + ",".join(
        f"named_struct('csim', {dot_sql('_v', r['_c'])} / "
        f"(_norm * {float(r['_cnorm'])!r}D), "
        f"'neg', {-int(r['cent_id'])})"
        for r in cent_rows) + ")"
    return (corpus.withColumn(
        "cent_id", -F.expr(f"array_max({cands_sql})")["neg"])
        .select("vec_id", "_v", "_norm", "cent_id"))


def train_ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                        n_iter: int = 2,
                        vec_col: str = "embedding") -> DataFrame:
    """Seeded, fixed-iteration Lloyd's refinement of the minid
    centroids (spherical k-means): assign → per-dimension mean →
    re-norm, ``n_iter`` times. Fully distributed — the mean is a
    posexplode + (cent_id, pos) hash aggregate, never a collect; the
    centroid table itself stays n_centroids rows (broadcast-sized).

    Deterministic across partitionings: per-dimension means are
    rounded to 6 decimals each iteration, so float summation order
    cannot flip a downstream assignment. Empty or degenerate (zero
    mean) clusters keep their previous centroid. The minid stand-in
    remains the oracle mode; this is the opt-in quality path
    (``centroids="trained"``)."""
    corpus = with_norm(embeddings, vec_col) \
        .select("vec_id", "_v", "_norm").localCheckpoint()
    cent = _minid_centroids(embeddings, n_centroids, vec_col)
    for _ in range(n_iter):
        assigned = _assign_to_centroids(corpus, cent)
        means = (assigned.select("cent_id",
                                 F.posexplode("_v").alias("pos", "x"))
                 .groupBy("cent_id", "pos")
                 .agg(F.round(F.avg("x"), 6).alias("m"))
                 .groupBy("cent_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "m"))),
                     lambda s: s["m"]).alias("_cnew")))
        norm = F.sqrt(_dot(F.col("_cnew"), F.col("_cnew")))
        cent = (cent.join(means, "cent_id", "left")
                .withColumn("_cnorm_new", norm)
                .select("cent_id",
                        F.when(F.col("_cnorm_new") > 0, F.col("_cnew"))
                        .otherwise(F.col("_c")).alias("_c"),
                        F.when(F.col("_cnorm_new") > 0,
                               F.col("_cnorm_new"))
                        .otherwise(F.col("_cnorm")).alias("_cnorm"))
                .localCheckpoint())  # cut lineage per Lloyd's round
    return cent


def ivf_cosine_topk(embeddings: DataFrame, queries: DataFrame,
                    n_centroids: int = 16, n_probe: int = 2, k: int = 5,
                    vec_col: str = "embedding",
                    centroids: str = "minid",
                    n_iter: int = 2,
                    assign_mode: str = "sql") -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest
    centroid (the inverted-file bucket), search only the query's
    ``n_probe`` nearest buckets — the other classic bucketed ANN shape
    next to SRP-LSH (shuffle on centroid ids, never all-pairs).

    ``centroids="minid"`` (default) uses the deterministic lowest-id
    stand-in — the cross-engine oracle mode; ``centroids="trained"``
    runs a seeded fixed-iteration Lloyd's refinement first
    (``train_ivf_centroids``) — the opt-in quality mode. At scale,
    any externally-trained centroid table plugs in the same way (a
    small broadcast relation). Returns (query_id, neighbor_id, rnk);
    recall < 1 by design, ``cosine_topk`` is the exact verifier."""
    if centroids == "trained":
        cent = train_ivf_centroids(embeddings, n_centroids, n_iter,
                                   vec_col)
    else:
        cent = _minid_centroids(embeddings, n_centroids, vec_col)
    from .parallel import widen_partitions
    corpus = with_norm(widen_partitions(
        embeddings.select("vec_id", vec_col), min_bytes=0), vec_col) \
        .select("vec_id", "_v", "_norm")
    assigned = _assign_to_centroids(corpus, cent, mode=assign_mode)
    probes = (with_norm(queries, vec_col)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("_v").alias("_q"),
                      F.col("_norm").alias("_qnorm"))
              .join(F.broadcast(cent))
              .withColumn("csim", _dot(F.col("_q"), F.col("_c"))
                          / (F.col("_qnorm") * F.col("_cnorm")))
              .withColumn("crnk", F.row_number().over(
                  Window.partitionBy("query_id").orderBy(
                      F.desc("csim"), F.asc("cent_id"))))
              .filter(F.col("crnk") <= n_probe)
              .select("query_id", "_q", "_qnorm", "cent_id"))
    # probe scoring: arrow mode swaps the interpreted fold for the
    # fold-order-exact vectorized pair dot (same bit pattern, so the
    # rank order — pinned by the parity test — cannot drift)
    if assign_mode == "arrow":
        probe_dot = _pair_dot_seq_udf()(F.col("_v"), F.col("_q"))
    else:
        probe_dot = _dot(F.col("_v"), F.col("_q"))
    scored = (assigned.join(F.broadcast(probes), "cent_id")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("sim", probe_dot
                          / (F.col("_norm") * F.col("_qnorm"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "rnk"))


def srp_bucket(df: DataFrame, planes: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection bucket id: one bit per hyperplane."""
    v = _as_double(F.col(vec_col))
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(v, arr) >= 0, F.lit("1"))
                    .otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame,
                    planes: list[list[float]], k: int = 5,
                    vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: rank only candidates sharing the query's SRP
    bucket. Recall < 1 by design; at scale, multiple plane-sets (OR)
    trade shuffle for recall."""
    from .parallel import widen_partitions
    corpus = srp_bucket(with_norm(widen_partitions(
        embeddings.select("vec_id", vec_col), min_bytes=0), vec_col), planes, vec_col) \
        .select(F.col("vec_id").alias("neighbor_id"), "_v", "_norm",
                "bucket")
    qs = srp_bucket(with_norm(queries, vec_col), planes, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_q"), F.col("_norm").alias("_qnorm"), "bucket")
    scored = (corpus.join(F.broadcast(qs), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("sim", _dot(F.col("_v"), F.col("_q"))
                          / (F.col("_norm") * F.col("_qnorm"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk"))
