"""Similarity search over embedding columns.

- :func:`brute_knn` — exact top-k cosine.  The query set is broadcast (it's
  the small side); candidates are scanned once with a vectorized numpy
  GEMM per Arrow batch producing **partition-local top-k**, then a single
  groupBy merges partials — the classic partial/final aggregation shape, no
  all-pairs shuffle, no driver collect of candidates.
- :func:`lsh_knn` — scale path: random-hyperplane signatures bucket both
  sides; exact rerank only within buckets.  Recall < 1 by design; use
  multiple tables (``n_tables``) to trade compute for recall.
- :func:`ivf_knn` — the other scale path (IVF-flat): a seeded spherical
  k-means coarse quantizer trained on a bounded sample partitions the
  candidates; queries probe their ``n_probe`` nearest centroids and
  rerank exactly within.  Deterministic end to end.
- :func:`embedding_near_dup` — near-duplicate pairs by cosine ≥ threshold,
  LSH-bucketed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("cand_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_knn(cands: DataFrame, queries: pd.DataFrame, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              round_decimals: int | None = None) -> DataFrame:
    """Exact top-k cosine for each query row (pandas: id_col, vec_col).

    Returns (query_id, cand_id, score) with ties broken toward the smaller
    cand_id (stable, oracle-friendly).  Set ``round_decimals`` to round
    scores *before* ranking so results are reproducible across engines.

    Scale bound: the query matrix is closure-captured (broadcast with the
    UDF), so it must fit executor memory — hard-capped at 100k rows.  For
    larger query sets, batch the queries or use :func:`lsh_knn`.
    """
    if len(queries) > 100_000:
        raise ValueError(
            f"brute_knn broadcasts the query set; {len(queries)} rows "
            "exceeds the 100k bound — batch the queries or use lsh_knn")
    q_ids = queries[id_col].to_numpy()
    Q = _normalize(np.stack(queries[vec_col].to_numpy()).astype(np.float64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _normalize(np.stack(pdf[vec_col].to_numpy())
                           .astype(np.float64))
            c_ids = pdf[id_col].to_numpy()
            scores = Q @ C.T                       # (nq, batch)
            if round_decimals is not None:
                scores = np.round(scores, round_decimals)
            kk = min(k, scores.shape[1])
            # partition-local top-k per query (merged by the final agg).
            # Ties at the batch-local boundary must break the same way
            # as the global (score DESC, cand_id ASC) window — a bare
            # argpartition keeps an arbitrary tied candidate and can
            # drop the smaller cand_id before the merge sees it.
            rows = []
            for qi in range(len(q_ids)):
                order = np.lexsort((c_ids, -scores[qi]))[:kk]
                for ci in order:
                    rows.append((int(q_ids[qi]), int(c_ids[ci]),
                                 float(scores[qi, ci])))
            yield pd.DataFrame(rows, columns=["query_id", "cand_id",
                                              "score"])

    partial = cands.mapInPandas(run, schema=_TOPK_SCHEMA)
    w = F.row_number().over(
        Window.partitionBy("query_id")
        .orderBy(F.col("score").desc(), F.col("cand_id").asc()))
    return (partial.withColumn("rank", w)
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "score", "rank"))


def hyperplane_signatures(df: DataFrame, dim: int, n_bits: int = 16,
                          seed: int = 42, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Random-hyperplane LSH signature (int bucket id) per vector."""
    rs = np.random.RandomState(seed)
    H = rs.normal(size=(dim, n_bits))

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (M @ H) > 0
        out = np.zeros(len(M), dtype=np.int64)
        for b in range(n_bits):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return df.withColumn("bucket", sig(F.col(vec_col)))


def cosine_col(qv, cv):
    """Vectorized cosine of two embedding columns (Arrow-batched)."""
    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = _normalize(np.stack(a.to_numpy()).astype(np.float64))
        B = _normalize(np.stack(b.to_numpy()).astype(np.float64))
        return pd.Series(np.einsum("ij,ij->i", A, B))
    return cos(qv, cv)


def lsh_candidate_pairs(cands: DataFrame, queries: DataFrame, dim: int,
                        n_bits: int | None = None, n_tables: int = 4,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Candidate (query, cand) pairs from multi-table hyperplane LSH —
    the bucketed-join stage of :func:`lsh_knn`, exposed so callers can
    materialize or audit the candidate set (e.g. the driver oracle
    reranks exactly this set in SQL).

    ``n_bits=None`` scales the bucket count with the candidate set (one
    count job): ~2^n_bits buckets sized for ~64 vectors each, clamped to
    [4, 24] — a fixed small n_bits turns the bucket join into a skewed
    near-cross-join at 100x.  Returns (query_id, cand_id, qv, cv).
    """
    if n_bits is None:
        n_cands = cands.count()
        n_bits = int(min(24, max(4, np.ceil(np.log2(
            max(n_cands, 1) / 64 + 1)))))
    pairs = None
    for t in range(n_tables):
        qs = hyperplane_signatures(queries, dim, n_bits, seed=100 + t,
                                   vec_col=vec_col, id_col=id_col)
        cs = hyperplane_signatures(cands, dim, n_bits, seed=100 + t,
                                   vec_col=vec_col, id_col=id_col)
        p = (qs.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"), "bucket")
             .join(cs.select(F.col(id_col).alias("cand_id"),
                             F.col(vec_col).alias("cv"), "bucket"),
                   "bucket")
             .drop("bucket"))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates(["query_id", "cand_id"])


def lsh_knn(cands: DataFrame, queries: DataFrame, dim: int, k: int = 10,
            n_bits: int | None = None, n_tables: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: union of per-table bucket joins + exact rerank.

    Each table uses a different hyperplane seed; query/candidate pairs
    colliding in any table are scored exactly, then top-k per query.
    """
    pairs = lsh_candidate_pairs(cands, queries, dim, n_bits=n_bits,
                                n_tables=n_tables, vec_col=vec_col,
                                id_col=id_col)
    from pyspark.sql.window import Window
    scored = pairs.withColumn("score",
                              cosine_col(F.col("qv"), F.col("cv")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("cand_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "score", "rank"))


def embedding_near_dup(df: DataFrame, dim: int, threshold: float = 0.95,
                       n_bits: int = 12, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed."""
    sigs = hyperplane_signatures(df, dim, n_bits, vec_col=vec_col,
                                 id_col=id_col)
    l = sigs.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"), "bucket")
    r = sigs.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("vb"), "bucket")
    cand = (l.join(r, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]))

    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = _normalize(np.stack(va.to_numpy()).astype(np.float64))
        B = _normalize(np.stack(vb.to_numpy()).astype(np.float64))
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return (cand.withColumn("score", cos(F.col("va"), F.col("vb")))
            .where(F.col("score") >= threshold)
            .select("id_a", "id_b", "score"))


def brute_near_dup(df: DataFrame, threshold: float = 0.45,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_decimals: int | None = None) -> DataFrame:
    """Exact near-duplicate pairs (cosine ≥ threshold) — the brute
    baseline for :func:`embedding_near_dup`.

    One normalized copy of the table is closure-captured (broadcast with
    the UDF, like :func:`brute_knn`'s query side); each Arrow batch then
    GEMMs its rows against the full matrix and keeps ``id_a < id_b``
    pairs above threshold — a single scan, no Catalyst cross join and no
    shuffle of unfiltered pair candidates.  Hard-capped at 100k vectors
    on the broadcast side; beyond that use the LSH-bucketed
    :func:`embedding_near_dup`.  ``round_decimals`` rounds scores before
    thresholding for cross-engine reproducibility.
    """
    # bounded collect: limit(cap+1) caps driver memory BEFORE the
    # materialization, so the guard protects against the failure itself
    all_pdf = df.select(id_col, vec_col).limit(100_001).toPandas()
    if len(all_pdf) > 100_000:
        raise ValueError(
            "brute_near_dup broadcasts the table; >100k rows "
            "exceeds the bound — use embedding_near_dup")
    b_ids = all_pdf[id_col].to_numpy()
    B = _normalize(np.stack(all_pdf[vec_col].to_numpy()).astype(np.float64))

    schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _normalize(np.stack(pdf[vec_col].to_numpy())
                           .astype(np.float64))
            a_ids = pdf[id_col].to_numpy()
            scores = A @ B.T                       # (batch, n)
            if round_decimals is not None:
                scores = np.round(scores, round_decimals)
            # each unordered pair is emitted exactly once: by the batch
            # row with the smaller id
            keep = (scores >= threshold) & (a_ids[:, None] < b_ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({
                "id_a": a_ids[ai].astype(np.int64),
                "id_b": b_ids[bi].astype(np.int64),
                "score": scores[ai, bi],
            })

    return df.select(id_col, vec_col).mapInPandas(run, schema=schema)


def _spherical_kmeans(M: np.ndarray, n_centroids: int, seed: int = 42,
                      n_iter: int = 10) -> np.ndarray:
    """Deterministic seeded spherical k-means (Lloyd on normalized
    vectors, cosine assignment).  Driver-side over a bounded sample —
    the coarse-quantizer training step of IVF."""
    M = _normalize(M)
    rs = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(M))
    C = M[rs.choice(len(M), size=n_centroids, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(M @ C.T, axis=1)
        new_C = np.zeros_like(C)
        np.add.at(new_C, assign, M)
        counts = np.bincount(assign, minlength=n_centroids)
        C = _normalize(new_C)
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            # deterministic empty-cluster reseed against the fully
            # updated, normalized centroids: points farthest from their
            # centroid, one per empty cluster (no partially-updated mix)
            d = 1.0 - np.einsum("ij,ij->i", M, C[assign])
            far = np.argsort(-d, kind="stable")[:len(empty)]
            C[empty] = M[far]
    return C


def ivf_candidate_pairs(cands: DataFrame, queries: DataFrame, dim: int,
                        n_centroids: int | None = None, n_probe: int = 4,
                        seed: int = 42, train_sample: int = 50_000,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """IVF candidate (query, cand) pairs: a coarse spherical-k-means
    quantizer (trained driver-side on a bounded, deterministic sample)
    assigns every candidate to its nearest centroid; each query probes
    its ``n_probe`` nearest centroids and meets the candidates there via
    an equi-join on centroid id.

    Scale shape: the centroid table is closure-broadcast (tiny); the
    only shuffle is the bucket equi-join keyed by centroid id, sized by
    ``n_centroids`` (default ~sqrt(n) → ~sqrt(n) vectors per bucket).
    Returns (query_id, cand_id, qv, cv).
    """
    n_cands = cands.count()
    if n_centroids is None:
        n_centroids = int(min(4096, max(4, np.sqrt(n_cands))))
    n_centroids = int(min(n_centroids, n_cands))   # tiny candidate sets
    train = (cands.orderBy(id_col).limit(train_sample)
             .select(vec_col).toPandas())
    C = _spherical_kmeans(
        np.stack(train[vec_col].to_numpy()).astype(np.float64),
        n_centroids, seed=seed)

    @F.pandas_udf("integer")
    def nearest(vecs: pd.Series) -> pd.Series:
        M = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    probe_schema = "array<integer>"

    @F.pandas_udf(probe_schema)
    def probes(vecs: pd.Series) -> pd.Series:
        M = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        S = M @ C.T
        npb = min(n_probe, S.shape[1])
        part = np.argpartition(-S, npb - 1, axis=1)[:, :npb]
        return pd.Series([list(map(int, row)) for row in part])

    cs = cands.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).alias("cv"),
                      nearest(F.col(vec_col)).alias("cent"))
    qs = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv"),
                         probes(F.col(vec_col)).alias("_probes"))
          .withColumn("cent", F.explode("_probes")).drop("_probes"))
    return qs.join(cs, "cent").drop("cent")


def ivf_knn(cands: DataFrame, queries: DataFrame, dim: int, k: int = 10,
            n_centroids: int | None = None, n_probe: int = 4,
            seed: int = 42, vec_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: coarse-quantizer bucket join + exact cosine
    rerank within the probed buckets (the classic IVF-flat layout).
    Recall is tuned by ``n_probe`` (and ``n_centroids``)."""
    pairs = ivf_candidate_pairs(cands, queries, dim,
                                n_centroids=n_centroids, n_probe=n_probe,
                                seed=seed, vec_col=vec_col, id_col=id_col)
    from pyspark.sql.window import Window
    scored = pairs.withColumn("score",
                              cosine_col(F.col("qv"), F.col("cv")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("cand_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "cand_id", "score", "rank"))
