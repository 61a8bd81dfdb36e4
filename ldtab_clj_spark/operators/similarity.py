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


def _srp_bands_with_vecs_arrow(embeddings: DataFrame, plane_tables,
                               vec_col: str) -> DataFrame:
    """(vec_id, tbl, bucket, _raw float32, _norm) in one numpy pass:
    one numpy matmul per Arrow batch assigns the bucket bits, and
    the RAW vector and its norm ride along so the per-bucket confirm
    needs no vector join at all. The
    norm accumulates dimension-by-dimension in index order — the exact
    IEEE sequence of the JVM ``with_norm`` fold it replaces (pinned by
    the arrow-vs-sql parity test). Vector transport is L copies per
    vector on ONE (tbl, bucket) shuffle — linear in the corpus, vs the
    former per-candidate-pair attach which was quadratic (measured
    120 GB of confirm traffic at a 4× bench scale)."""
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
            raw = pdf[vec_col].to_numpy()
            v = np.stack(raw).astype(np.float64)           # n × dim
            bits = (v @ planes.T) >= 0                     # n × (L*k)
            buckets = bits.reshape(len(pdf), n_tables, k) @ weights
            nrm = np.zeros(len(pdf))
            for d in range(v.shape[1]):    # fold-order accumulation
                nrm += v[:, d] * v[:, d]
            nrm = np.sqrt(nrm)
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                "tbl": np.tile(np.arange(n_tables), len(pdf)),
                "bucket": buckets.reshape(-1),
                "_raw": np.repeat(raw, n_tables),
                "_norm": np.repeat(nrm, n_tables),
            })

    from .parallel import widen_partitions
    src = widen_partitions(embeddings.select("vec_id", vec_col),
                           min_bytes=0)
    return src.mapInPandas(
        bands, "vec_id long, tbl int, bucket long, "
               "_raw array<float>, _norm double")


def _confirm_bucket_stream(threshold: float,
                           chunk: int = 262_144):
    """Streaming per-(tbl, bucket) exact-cosine confirm for
    mapInPandas over a bucket-partitioned, bucket-sorted relation:
    grouped_batches re-chunks the Arrow stream into frames of complete
    ``_grp`` runs (one numpy slice per bucket — an applyInPandas
    variant paid ~1 ms of Arrow framing per group, which at L×2^k ≈
    2000 mostly-tiny buckets doubled the query at sf0.1), and every
    bucket confirms all its pairs (lower vec_id first) vectorized.
    The per-pair math is the SAME einsum/divide sequence as the former
    pair-level confirm (float32 → exact float64 cast, einsum
    'ij,ij->i' over row-gathered matrices, dot/(na*nb)), so sims are
    bit-identical; only the transport changed. Pair generation is
    chunked (CHUNK pairs per slab) so transient memory stays bounded
    for hot buckets; the quadratic TIME of a giant bucket is inherent
    to its candidate count."""
    import numpy as np
    import pandas as pd

    from .batching import grouped_batches
    CHUNK = chunk

    def confirm_run(ids, V, nrm, out_a, out_b):
        B = len(ids)
        bs = max(1, CHUNK // B)
        for i0 in range(0, B - 1, bs):
            i1 = min(i0 + bs, B - 1)
            r = np.arange(i0, i1)
            counts = B - 1 - r
            total = int(counts.sum())
            ii = np.repeat(r, counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            jj = (np.arange(total) - np.repeat(starts, counts)
                  + np.repeat(r + 1, counts))
            sim = (np.einsum("ij,ij->i", V[ii], V[jj])
                   / (nrm[ii] * nrm[jj]))
            keep = sim >= threshold
            ia, jb = ids[ii[keep]], ids[jj[keep]]
            ne = ia != jb   # duplicate input ids never self-pair
            out_a.append(np.minimum(ia[ne], jb[ne]))
            out_b.append(np.maximum(ia[ne], jb[ne]))

    def confirm(batches):
        for pdf in grouped_batches(batches, "_grp"):
            g = pdf["_grp"].to_numpy()
            change = np.flatnonzero(g[1:] != g[:-1]) + 1
            bounds = np.concatenate(([0], change, [len(g)]))
            ids_all = pdf["vec_id"].to_numpy()
            raw_all = pdf["_raw"].to_numpy()
            nrm_all = pdf["_norm"].to_numpy()
            out_a, out_b = [], []
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                if s1 - s0 < 2:
                    continue
                confirm_run(ids_all[s0:s1],
                            np.stack(raw_all[s0:s1]).astype(np.float64),
                            nrm_all[s0:s1], out_a, out_b)
            if out_a:
                yield pd.DataFrame({"vec_a": np.concatenate(out_a),
                                    "vec_b": np.concatenate(out_b)})

    return confirm


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
        # throughput path (restructured in r06 after a 4×-scale probe):
        # the former shape generated candidate PAIRS in a JVM bucket
        # self-join and re-attached both vectors per pair — transport
        # quadratic in bucket occupancy (7M pairs / 3.6 GB at sf1.0;
        # 115M pairs / ~120 GB at 4×, a 21× slowdown). Now the raw
        # float32 vector + JVM-fold-order norm ride the ONE
        # (tbl, bucket) shuffle (L copies per vector — linear), and
        # each bucket confirms ALL its pairs inside one vectorized
        # run of the grouped mapInPandas stream: same einsum/divide
        # bit sequence, only
        # surviving id pairs ever materialize as rows. The terminal
        # distinct collapses multi-table hits (and duplicate input
        # ids) exactly as before.
        bands_v = _srp_bands_with_vecs_arrow(embeddings, plane_tables,
                                             vec_col)
        sc = embeddings.sparkSession.sparkContext
        part = (bands_v
                .withColumn("_grp", F.concat_ws(":", "tbl", "bucket"))
                .repartition(sc.defaultParallelism, "tbl", "bucket")
                .sortWithinPartitions("_grp")
                .select("_grp", "vec_id", "_raw", "_norm"))
        return (part.mapInPandas(_confirm_bucket_stream(threshold),
                                 "vec_a long, vec_b long")
                .distinct())
    if mode != "sql":
        raise ValueError(f"unknown srp mode {mode!r} "
                         "(use 'sql' or 'arrow')")
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
    # oracle path: candidate pairs from the NARROW band relation via a
    # SHUFFLE_HASH self-join (the broadcast alternative recomputed the
    # banding subplan for the build side and serialized it through a
    # driver-side broadcast build — see _band_pairs in dedup.py),
    # deduped BEFORE the exact confirm (the interpreted fold is
    # expensive per pair), vectors joined back per unique pair as
    # double arrays, sim in pure Catalyst expressions
    a, b = bands.alias("a"), bands.hint("shuffle_hash").alias("b")
    cand = (a.join(b, ["tbl", "bucket"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"))
            .distinct())
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
