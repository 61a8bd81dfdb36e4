"""Similarity-search operators: brute-force vs SRP-LSH recall, and the
dedup family's pair semantics."""

import random

import pytest
from pyspark.sql import functions as F

from ldtab_clj_spark.operators.similarity import (cosine_near_dup_pairs,
                                                  cosine_topk,
                                                  lsh_cosine_topk,
                                                  srp_banded_near_dup,
                                                  srp_bucket,
                                                  srp_plane_tables)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def test_lsh_is_subset_of_bruteforce_candidates(spark, emb):
    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=50)
    approx = lsh_cosine_topk(emb, queries, planes, k=50)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert ap  # buckets are non-degenerate
    # every LSH result is a true (query, neighbor) pair with rank<=50
    # recall need not be 1, but bucket-mates must be genuine neighbors
    # in the candidate sense: same bucket as the query
    buckets = {r.vec_id: r.bucket
               for r in srp_bucket(emb, planes).collect()}
    for q, n in ap:
        assert buckets[q] == buckets[n]
    # recall sanity: with 4 planes (16 buckets over 500 vecs), the
    # approx top-k overlaps the exact top-k meaningfully
    recall = len(ex & ap) / len(ex)
    assert recall > 0.02, recall


def test_srp_banded_near_dup_recall(spark, emb):
    """The SRP-LSH near-dup scale path vs the brute-force verifier:
    every SRP pair must be a true near-dup (precision 1.0 — the exact
    cosine confirm guarantees it) and recall with L=8/k=3 tables must
    clear 0.8 on the synthetic corpus."""
    exact = {(r.vec_a, r.vec_b)
             for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()}
    approx = {(r.vec_a, r.vec_b)
              for r in srp_banded_near_dup(emb, srp_plane_tables(),
                                           threshold=0.4).collect()}
    assert approx <= exact          # precision 1.0
    assert exact, "degenerate corpus"
    assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_srp_arrow_confirm_matches_sql(spark, emb):
    """The vectorized-numpy confirm (throughput path) and the Catalyst
    fold (oracle path) must produce identical pair sets."""
    planes = srp_plane_tables()
    sql = {(r.vec_a, r.vec_b)
           for r in srp_banded_near_dup(emb, planes, 0.4,
                                        mode="sql").collect()}
    arrow = {(r.vec_a, r.vec_b)
             for r in srp_banded_near_dup(emb, planes, 0.4,
                                          mode="arrow").collect()}
    assert sql == arrow and sql


def test_ivf_assign_arrow_bit_parity(spark, emb):
    """The numpy assignment twin must be BIT-identical to the literal
    Catalyst fold — same (vec_id → cent_id) map AND same downstream
    top-k — because the arrow path reproduces the fold's left-to-right
    summation order per dimension (Catalyst-parity rule for arrow
    twins; a plain matmul's blocked sums could flip near-tied argmax)."""
    from ldtab_clj_spark.operators.similarity import (
        _assign_to_centroids, _minid_centroids, ivf_cosine_topk,
        with_norm)
    cent = _minid_centroids(emb, 16, "embedding")
    corpus = with_norm(emb, "embedding").select("vec_id", "_v", "_norm")
    sql_assign = {r.vec_id: r.cent_id for r in
                  _assign_to_centroids(corpus, cent, "sql").collect()}
    arrow_assign = {r.vec_id: r.cent_id for r in
                    _assign_to_centroids(corpus, cent, "arrow").collect()}
    assert sql_assign == arrow_assign and sql_assign
    assert len(set(sql_assign.values())) > 1, "degenerate assignment"
    queries = emb.filter(F.col("vec_id") < 5)
    sql_topk = sorted(map(tuple, ivf_cosine_topk(
        emb, queries, 16, 2, 5, assign_mode="sql").collect()))
    arrow_topk = sorted(map(tuple, ivf_cosine_topk(
        emb, queries, 16, 2, 5, assign_mode="arrow").collect()))
    assert sql_topk == arrow_topk and sql_topk


def test_ivf_assign_bad_mode_raises(spark, emb):
    from ldtab_clj_spark.operators.similarity import (
        _assign_to_centroids, _minid_centroids, with_norm)
    cent = _minid_centroids(emb, 4, "embedding")
    corpus = with_norm(emb, "embedding").select("vec_id", "_v", "_norm")
    with pytest.raises(ValueError, match="assign mode"):
        _assign_to_centroids(corpus, cent, "numpy")


def test_ivf_topk_recall_vs_exact(spark, emb):
    """IVF-bucketed ANN: results must be true neighbors from the
    probed buckets with correct ranks, and recall vs exact top-k must
    be meaningful with n_probe=2 of 16 centroids."""
    from ldtab_clj_spark.operators.similarity import ivf_cosine_topk
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx = ivf_cosine_topk(emb, queries, n_centroids=16, n_probe=2,
                             k=5).collect()
    # ranks per query are 1..n without gaps
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rnk)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    ap = {(r.query_id, r.neighbor_id) for r in approx}
    assert ap
    recall = len(exact & ap) / len(exact)
    assert recall >= 0.3, recall  # 2/16 buckets probed; exact is verifier


def test_srp_plane_tables_deterministic():
    a, b = srp_plane_tables(), srp_plane_tables()
    assert a == b
    assert all(-10 <= c <= 10 for t in a for p in t for c in p)
    # tables differ from each other (decorrelated LCG mixing)
    assert a[0] != a[1]


def test_lsh_rank_correct_within_bucket(spark, emb):
    rng = random.Random(1)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)]
    queries = emb.filter(F.col("vec_id") == 0)
    out = lsh_cosine_topk(emb, queries, planes, k=10).collect()
    ranks = sorted(r.rnk for r in out)
    assert ranks == list(range(1, len(ranks) + 1))


def test_brute_force_guards_trip(spark, emb):
    """Each quadratic verifier refuses corpus-scale input with a
    pointer to its bucketed twin; the default threshold passes test
    corpora untouched."""
    from ldtab_clj_spark.operators.dedup import word_jaccard_pairs
    from ldtab_clj_spark.operators.guards import BruteForceScaleError
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(BruteForceScaleError, match="srp_banded_near_dup"):
        cosine_near_dup_pairs(emb, max_rows=3).collect()
    with pytest.raises(BruteForceScaleError, match="minhash_lsh_pairs"):
        word_jaccard_pairs(docs, max_rows=3).collect()
    # at test scale both run fine under the default limit
    assert cosine_near_dup_pairs(emb, threshold=0.999).count() >= 0
    assert word_jaccard_pairs(docs.limit(20)).count() >= 0


def test_ivf_trained_centroids_recall_and_determinism(spark):
    """Opt-in Lloyd's-refined centroids: on a corpus with actual
    cluster structure, recall@5 vs exact top-k must beat the minid
    stand-in's (on the UNIFORM synthetic corpus the two are statistical
    ties — k-means has nothing to find there; measured 0.74 vs 0.75 at
    25 queries); and the trained centroid table must be identical
    across partitionings (6-decimal mean quantization pins the float
    summation order)."""
    import numpy as np

    from ldtab_clj_spark.operators.similarity import (ivf_cosine_topk,
                                                      train_ivf_centroids)
    rs = np.random.RandomState(0)
    centers = rs.normal(size=(16, 32)) * 4
    pts = [(centers[rs.randint(16)] + rs.normal(size=32)).tolist()
           for _ in range(480)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(pts)],
        "vec_id long, embedding array<double>").localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 25)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}

    def recall(mode):
        got = {(r.query_id, r.neighbor_id)
               for r in ivf_cosine_topk(emb, queries, n_centroids=16,
                                        n_probe=2, k=5,
                                        centroids=mode).collect()}
        return len(exact & got) / len(exact)

    r_minid, r_trained = recall("minid"), recall("trained")
    assert r_trained >= r_minid, (r_trained, r_minid)
    assert r_trained >= 0.95, r_trained  # measured 0.976 vs 0.928

    c1 = train_ivf_centroids(emb, 16, n_iter=2)
    c2 = train_ivf_centroids(emb.repartition(7), 16, n_iter=2)
    rows1 = {r.cent_id: (r._c, round(r._cnorm, 9)) for r in c1.collect()}
    rows2 = {r.cent_id: (r._c, round(r._cnorm, 9)) for r in c2.collect()}
    assert rows1 == rows2


def test_srp_bucket_confirm_chunked_matches_bruteforce(spark):
    """The bucket-stream confirm's chunked pair generation (engaged
    only for buckets larger than CHUNK/B rows — i.e. at bench scale,
    where no oracle runs) must emit exactly the brute-force pair set,
    and tiny chunks must agree with one-shot chunks."""
    import numpy as np

    from ldtab_clj_spark.operators.similarity import (
        _confirm_bucket_stream, srp_banded_near_dup, srp_plane_tables)

    rng = np.random.default_rng(11)
    n, dim = 600, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    tables = srp_plane_tables(n_tables=2, k_planes=1, dim=dim)
    thr = 0.3

    got = {(r.vec_a, r.vec_b) for r in srp_banded_near_dup(
        emb, tables, threshold=thr, mode="arrow").collect()}

    # brute force over the same bucketing (k=1 → 2 buckets per table)
    V = vecs.astype(np.float64)
    nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
    want = set()
    for planes in tables:
        P = np.array(planes, dtype=np.float64)
        buckets = ((V @ P.T) >= 0).astype(int)[:, 0]
        for b in (0, 1):
            idx = np.flatnonzero(buckets == b)
            for x in range(len(idx)):
                for y in range(x + 1, len(idx)):
                    i, j = int(idx[x]), int(idx[y])
                    sim = float(V[i] @ V[j] / (nrm[i] * nrm[j]))
                    if sim >= thr:
                        want.add((min(i, j), max(i, j)))
    assert got == want and got

    # tiny chunk (forces many slabs per bucket) == huge chunk
    from pyspark.sql import functions as F

    from ldtab_clj_spark.operators.similarity import \
        _srp_bands_with_vecs_arrow
    bands_v = _srp_bands_with_vecs_arrow(emb, tables, "embedding")
    part = (bands_v
            .withColumn("_grp", F.concat_ws(":", "tbl", "bucket"))
            .repartition(4, "tbl", "bucket")
            .sortWithinPartitions("_grp")
            .select("_grp", "vec_id", "_raw", "_norm"))
    small = {(r.vec_a, r.vec_b) for r in part.mapInPandas(
        _confirm_bucket_stream(thr, chunk=37),
        "vec_a long, vec_b long").distinct().collect()}
    assert small == got
