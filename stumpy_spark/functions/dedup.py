"""Deduplication operators for training-data pipelines.

Scale notes (the part that matters at 100 TB):

- exact: hash-groupBy on md5(text) — one shuffle on an (effectively) unique
  key, AQE-coalesced.  Never groups on raw text (wide shuffle rows).
- MinHash + LSH: shingle → xxhash64 (JVM built-in, no Python) → 64 minhash
  aggregations (one shuffle, map-side partial min) → band signature →
  self-join on (band, band_hash) buckets.  The band join is an equi-join on
  a high-cardinality key, so it sort-merge-joins cleanly; candidate pairs
  then get exact Jaccard verification.
- SimHash: 64-bit sign-of-weighted-bit-sums per doc, vectorized in a pandas
  UDF over Arrow batches; near-dup = hamming distance ≤ d on the signature
  (banded same as LSH for scale).
- n-gram Jaccard: exact verification on candidate pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic MinHash permutation parameters (universal hashing);
# 31-bit Mersenne prime keeps a*(x mod p)+b < 2^62 — no int64 overflow
# under Spark's ANSI arithmetic
_MERSENNE = (1 << 31) - 1


def _perm_params(num_hashes: int, seed: int = 42):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rs.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def exact_dedup_stats(df: DataFrame, text_col: str = "text",
                      by: str = "source") -> DataFrame:
    """Per-group exact-duplicate stats via md5 hash-groupBy."""
    h = F.md5(F.col(text_col).cast("binary")).alias("h")
    per_hash = (df.select(F.col(by), h)
                .groupBy(by, "h").agg(F.count("*").alias("n")))
    return (per_hash.groupBy(by)
            .agg(F.sum("n").alias("n_docs"),
                 F.count("*").alias("n_distinct"),
                 F.sum(F.when(F.col("n") > 1, F.col("n"))
                       .otherwise(F.lit(0))).alias("n_in_dup_groups")))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-duplicate group."""
    h = F.md5(F.col(text_col).cast("binary")).alias("_h")
    keep = (df.select(F.col(id_col), h)
            .groupBy("_h").agg(F.min(id_col).alias(id_col)))
    return df.join(keep, id_col, "left_semi")


def shingles(df: DataFrame, text_col: str = "text", k: int = 5,
             id_col: str = "doc_id") -> DataFrame:
    """Word k-shingle hashes per doc: (doc_id, shingle_hash:long).

    Shingling is a JVM-side expression chain: split → sliding slices via
    transform over an index sequence → concat_ws → xxhash64.
    """
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return (df.select(F.col(id_col), F.explode(sh).alias("shingle"))
            .select(id_col, F.xxhash64("shingle").alias("sh")))


def minhash_signatures(df: DataFrame, num_hashes: int = 64,
                       text_col: str = "text", k: int = 5,
                       id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """(doc_id, sig: array<long>[num_hashes]) via universal-hash min aggs."""
    a, b = _perm_params(num_hashes, seed)
    sh = shingles(df, text_col=text_col, k=k, id_col=id_col)
    # h_i(x) = (a_i * x + b_i) mod p, all JVM-side; pmod keeps it positive
    x = F.pmod(F.col("sh"), F.lit(_MERSENNE))
    mins = [
        F.min(F.pmod(x * F.lit(int(a[i])) + F.lit(int(b[i])),
                     F.lit(_MERSENNE))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy(id_col).agg(*mins)
    return sigs.select(
        id_col,
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and self-join buckets → candidate pairs."""
    rows_per_band = F.size(F.col("sig")) / bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.xxhash64(F.slice(
                F.col("sig"),
                (bnd * rows_per_band + 1).cast("int"),
                rows_per_band.cast("int"))))).alias("band", "bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right, [F.col("l.band") == F.col("r.band"),
                              F.col("l.bh") == F.col("r.bh"),
                              F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  k: int = 5, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step)."""
    sh = shingles(df, text_col=text_col, k=k, id_col=id_col).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (pairs.join(a, "id_a").join(b, ["id_b", "sh"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sza = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed(
        "sz", "sz_a")
    szb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed(
        "sz", "sz_b")
    return (inter.join(F.broadcast(sza), "id_a")
            .join(F.broadcast(szb), "id_b")
            .select("id_a", "id_b",
                    (F.col("inter").cast("double") /
                     (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
                    .alias("jaccard")))


def ngram_dedup_pairs(df: DataFrame, k: int = 3, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_df: int | None = 1000) -> DataFrame:
    """n-gram Jaccard near-dup pairs via an inverted shingle index —
    exact Jaccard values, exact recall up to the ``max_df`` stop-shingle
    cap (pass ``max_df=None`` for recall exact by construction).

    Unlike :func:`minhash_dedup_pairs` (probabilistic candidate
    generation), candidates here are every pair sharing at least one
    sufficiently-rare word k-gram — the join key is the shingle hash
    itself, and the whole pipeline is two shuffles (shingle groupBy +
    pair groupBy), all JVM-side.

    Scale knob: ``max_df`` (default 1000) drops shingles occurring in
    more than that many documents from *candidate generation* (the
    standard stop-shingle cap) — without it one boilerplate k-gram
    shared by 1M docs turns the self-join into a 10^12-row hot key;
    pass ``max_df=None`` explicitly to opt out at small scale.  Reported
    Jaccard values are always exact (the verify step recomputes the
    intersection over the full shingle sets); only pairs whose *every*
    common shingle is above the cap can be missed — boilerplate-only
    overlap, by definition below any useful threshold when the cap is
    sane.
    """
    sh = shingles(df, text_col=text_col, k=k, id_col=id_col).distinct()
    join_sh = sh
    if max_df is not None:
        rare = (sh.groupBy("sh").agg(F.count("*").alias("df"))
                .where(F.col("df") <= max_df).select("sh"))
        join_sh = sh.join(rare, "sh", "left_semi")
        cand = (join_sh.withColumnRenamed(id_col, "id_a")
                .join(join_sh.withColumnRenamed(id_col, "id_b"), "sh")
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        verified = ngram_jaccard(df, cand, text_col=text_col, k=k,
                                 id_col=id_col)
        return verified.where(F.col("jaccard") >= threshold)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (a.join(b, "sh")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sza = sizes.select(F.col(id_col).alias("id_a"),
                       F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col(id_col).alias("id_b"),
                       F.col("sz").alias("sz_b"))
    return (inter.join(F.broadcast(sza), "id_a")
            .join(F.broadcast(szb), "id_b")
            .select("id_a", "id_b",
                    (F.col("inter").cast("double") /
                     (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_dedup_pairs(df: DataFrame, num_hashes: int = 64,
                        bands: int = 16, threshold: float = 0.8,
                        text_col: str = "text", k: int = 5,
                        id_col: str = "doc_id") -> DataFrame:
    """Full near-dup pipeline: minhash → LSH buckets → exact verify."""
    sigs = minhash_signatures(df, num_hashes, text_col=text_col, k=k,
                              id_col=id_col)
    cand = lsh_candidate_pairs(sigs, bands=bands, id_col=id_col)
    verified = ngram_jaccard(df, cand, text_col=text_col, k=k,
                             id_col=id_col)
    return verified.where(F.col("jaccard") >= threshold)


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc, entirely JVM-side (zero per-row Python).

    Tokens are exploded and hashed with the built-in ``xxhash64``; the
    64 per-bit majority votes are plain long-sum aggregations with
    map-side partial combine (one shuffle on doc id).  The signed long
    signature is recomposed from the vote bits with the top bit handled
    as two's complement.
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("_tok"))
            .where(F.col("_tok") != "")
            .withColumn("_h", F.xxhash64("_tok")))
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.shiftrightunsigned("_h", i).bitwiseAND(F.lit(1)))
        .alias(f"_o{i}")
        for i in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*aggs)
    # bit i set iff ones*2 > n_tokens (strict-majority vote, ties -> 0,
    # matching sign(votes) > 0); bit 63 contributes -2^63 (two's compl.)
    n = F.col("_n")
    sig = F.lit(0).cast("long")
    for i in range(63):
        sig = sig + F.when(F.col(f"_o{i}") * 2 > n,
                           F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    sig = sig + F.when(F.col("_o63") * 2 > n,
                       F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0))
    sigs = votes.select(F.col(id_col), sig.alias("simhash"))
    # docs with zero tokens vanish in the groupBy: restore them as sig 0
    return (df.select(id_col).join(sigs, id_col, "left")
            .select(id_col, F.coalesce("simhash",
                                       F.lit(0).cast("long"))
                    .alias("simhash")))


def ensure_simhash_fixture(spark, sf_dir: str) -> str:
    """Materialize the per-doc simhash signatures for a scale dir as a
    parquet fixture (idempotent), so a DuckDB oracle can brute-force the
    exact hamming-distance pairs and verify the banded join's recall."""
    import os
    from ..sources.tokseq import FIXTURE_ROOT, sf_name
    path = os.path.join(FIXTURE_ROOT, f"simhash_{sf_name(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = (spark.read.parquet(os.path.join(sf_dir,
                                                "documents.parquet"))
                .withColumn("doc_id", F.col("doc_id").cast("string")))
        simhash_signatures(docs).write.mode("overwrite").parquet(path)
    return path


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded for scale.

    The signature is split into ``max_hamming + 1`` bit segments, so by
    pigeonhole any pair with hamming <= max_hamming shares at least one
    exact band — recall is guaranteed for every requested radius (fixing
    the fixed-4-band variant that silently dropped pairs for radius > 3).
    Larger radii mean narrower bands and bigger buckets: with b bands a
    random pair collides on a band with probability ~ b / 2^(64/b), so
    keep max_hamming <= ~6 at the 100 TB scale.
    """
    nb = max_hamming + 1
    base, rem = divmod(64, nb)
    widths = [base + (1 if i < rem else 0) for i in range(nb)]
    offs = [sum(widths[:i]) for i in range(nb)]
    band_cols = [
        (F.shiftrightunsigned(F.col("simhash"), offs[i])
         .bitwiseAND(F.lit((1 << widths[i]) - 1))).alias(f"b{i}")
        for i in range(nb)
    ]
    banded = sigs.select(id_col, "simhash", *band_cols)
    banded = banded.unpivot(
        [id_col, "simhash"], [f"b{i}" for i in range(nb)], "band", "bh")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (l.join(r, [F.col("l.band") == F.col("r.band"),
                       F.col("l.bh") == F.col("r.bh"),
                       F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.simhash").alias("sig_a"),
                    F.col("r.simhash").alias("sig_b"))
            .distinct())
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def connected_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Connected components over near-dup edges: (id, cluster_id).

    ``pairs`` is any (id_a, id_b) edge relation (e.g. the output of
    :func:`minhash_dedup_pairs` / :func:`ngram_dedup_pairs` /
    :func:`simhash_near_pairs`); ``cluster_id`` is the minimum id
    reachable from each node, so every duplicate group gets one stable
    canonical label.  This is the step a real pipeline runs *after*
    pair emission: near-dup relations are not transitive, so keeping
    "one doc per pair" under-deletes — you dedup per component.

    Scale design (100 TB):
    - min-label propagation + pointer halving, two shuffles per round:
      (1) join the symmetrized edge list with current labels on ``src``
      and take the per-``dst`` min (map-side partial min); (2) shortcut
      each label through its own label (``label(label(i))``, a
      self-join on the closed label set).  Halving doubles the distance
      a min label covers per round, so rounds are O(log diameter) even
      on adversarial path graphs (the same effect as
      large-star/small-star, Kiveris et al. SoCC'14), while dedup's
      near-clique components still converge in 2-3 rounds.
    - ``localCheckpoint`` after every round truncates the lineage so
      the plan doesn't deepen with iterations (on a cluster, use a
      reliable ``checkpoint`` dir instead).
    - convergence test is a driver-side ``sum(cluster_id hash)``
      aggregation, not a collect: labels only ever decrease, so an
      unchanged sum is a fixpoint proof.
    """
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct())
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("cluster_id", F.col("id"))
              .localCheckpoint(eager=True))
    edges = edges.localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_rounds):
        prop = (edges.join(labels, edges["src"] == labels["id"])
                .select(F.col("dst").alias("id"), F.col("cluster_id")))
        stepped = (labels.select("id", "cluster_id").union(prop)
                   .groupBy("id").agg(F.min("cluster_id")
                                      .alias("cluster_id"))
                   .localCheckpoint(eager=True))
        # pointer halving: shortcut through label(label(i)).  Labels are
        # node ids, so the lookup side is the label set itself
        # (checkpointed above — also breaks self-join ambiguity).
        lookup = stepped.select(F.col("id").alias("_lid"),
                                F.col("cluster_id").alias("_lcid"))
        labels = (stepped.join(lookup,
                               stepped["cluster_id"] == lookup["_lid"],
                               "left")
                  .select(F.col("id"),
                          F.least(F.col("cluster_id"),
                                  F.coalesce(F.col("_lcid"),
                                             F.col("cluster_id")))
                          .alias("cluster_id"))
                  # materialize: consumed 3x (checksum action, next
                  # round's prop join, next round's union) — without
                  # this the halving join recomputes each time
                  .localCheckpoint(eager=True))
        # labels decrease monotonically -> unchanged checksum = fixpoint
        cur = labels.agg(
            F.sum(F.xxhash64("id", "cluster_id").cast("decimal(38,0)"))
            .alias("s")).collect()[0]["s"]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        # never hit the fixpoint within max_rounds: pointer halving
        # converges in O(log n) rounds, so 50 covers any graph up to
        # ~2^50 nodes — exhausting it means the labeling is incomplete
        # and must not be returned silently
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            f"rounds (label checksum still changing); component labels "
            f"would be incorrect. Raise max_rounds.")
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every doc a duplicate-cluster label and cluster size.

    Docs in no pair are singletons (cluster_id = own id, size 1).
    Output: (id_col, cluster_id, cluster_size).  ``is_canonical``
    (keep-list) is ``id == cluster_id``.
    """
    cc = connected_components(pairs)
    assigned = (df.select(F.col(id_col))
                .join(cc, df[id_col] == cc["id"], "left")
                .select(F.col(id_col),
                        F.coalesce("cluster_id", F.col(id_col))
                        .alias("cluster_id")))
    sizes = (assigned.groupBy("cluster_id")
             .agg(F.count("*").alias("cluster_size")))
    return assigned.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size")


def streaming_dedup_exact(stream_df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          ts_col: str | None = None,
                          watermark: str | None = None) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST occurrence of each
    text hash across micro-batches.

    Spark-native ``dropDuplicates`` keeps per-key state in the state
    store; with ``ts_col`` + ``watermark`` the state is bounded (a
    duplicate arriving after the watermark passes its first
    occurrence's event time is re-emitted — the standard
    bounded-memory tradeoff, document per retention window).  Without a
    watermark, state grows with the distinct-hash count: one 16-byte
    md5 per unique doc, the streaming twin of :func:`dedup_exact`'s
    keep-min-id batch contract (streaming keeps first-SEEN instead —
    arrival order replaces id order as the tiebreak).

    Only the hash enters the state store — raw text never does.
    """
    if (watermark is None) != (ts_col is None):
        raise ValueError("watermark and ts_col must be given together "
                         "(a watermark without an event-time column "
                         "would silently fall back to unbounded state)")
    out = stream_df.withColumn(
        "_h", F.md5(F.col(text_col).cast("binary")))
    if watermark is not None and ts_col is not None:
        # dropDuplicatesWithinWatermark evicts a hash's state once the
        # watermark passes its first occurrence — bounded state
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
    return out.dropDuplicates(["_h"]).drop("_h")
