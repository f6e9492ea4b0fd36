"""Dedup / text-analysis / similarity-search tests with pure-python oracles."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from stumpy_spark.functions import dedup, simsearch, textfns

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet") \
        .withColumn("doc_id", F.col("doc_id").cast("string")).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_exact_dedup_stats(docs, docs_pdf):
    got = dedup.exact_dedup_stats(docs).toPandas().set_index("source")
    for src, grp in docs_pdf.groupby("source"):
        counts = grp.text.value_counts()
        assert got.loc[src].n_docs == len(grp)
        assert got.loc[src].n_distinct == grp.text.nunique()
        assert got.loc[src].n_in_dup_groups == counts[counts > 1].sum()


def test_dedup_exact_keeps_one_per_group(docs, docs_pdf):
    kept = dedup.dedup_exact(docs).toPandas()
    assert len(kept) == docs_pdf.text.nunique()
    assert kept.text.nunique() == len(kept)
    # representative = min doc_id per text group
    exp = docs_pdf.groupby("text").doc_id.min()
    got = kept.set_index("text").doc_id
    assert (exp.astype(str).sort_index() == got.astype(str).sort_index()).all()


def _py_shingles(text, k=5):
    toks = text.split()
    if len(toks) <= k:
        return {" ".join(toks[:k])}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def test_minhash_jaccard_approximates(docs, docs_pdf):
    """MinHash similarity ≈ true Jaccard on the most similar pair."""
    sigs = dedup.minhash_signatures(docs, num_hashes=64).toPandas()
    sig_map = {r.doc_id: np.array(r.sig) for r in sigs.itertuples()}
    texts = docs_pdf.set_index(docs_pdf.doc_id.astype(str)).text
    ids = list(sig_map)
    rs = np.random.RandomState(0)
    worst = 0.0
    for _ in range(200):
        a, b = rs.choice(len(ids), 2, replace=False)
        ia, ib = ids[a], ids[b]
        est = float((sig_map[ia] == sig_map[ib]).mean())
        sa, sb = _py_shingles(texts[ia]), _py_shingles(texts[ib])
        true = len(sa & sb) / max(len(sa | sb), 1)
        worst = max(worst, abs(est - true))
    assert worst <= 0.35      # 64 hashes → se ~0.06; loose bound


def test_minhash_finds_exact_dups(spark):
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(6)],
        "text": ["the quick brown fox jumps over the lazy dog " * 5,
                 "the quick brown fox jumps over the lazy dog " * 5,
                 "совершенно другой текст " * 10,
                 "yet another completely different document body " * 6,
                 "the quick brown fox jumps over the lazy dog extra " * 5,
                 "unrelated words here that match nothing else at all " * 4],
    })
    df = spark.createDataFrame(pdf)
    pairs = dedup.minhash_dedup_pairs(df, threshold=0.5).toPandas()
    assert (("d0", "d1") in set(zip(pairs.id_a, pairs.id_b)))
    j = pairs.set_index(["id_a", "id_b"]).jaccard
    assert j.loc[("d0", "d1")] == 1.0


def test_simhash(spark, docs):
    sigs = dedup.simhash_signatures(docs).toPandas()
    # synthetic docs share vocabulary, so collisions happen; just require
    # meaningful spread
    assert sigs.simhash.nunique() > len(sigs) * 0.3
    # identical text -> identical simhash, near text -> near simhash
    pdf = pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["alpha beta gamma delta epsilon zeta " * 10] * 2})
    s = dedup.simhash_signatures(spark.createDataFrame(pdf)).toPandas()
    assert s.simhash.iloc[0] == s.simhash.iloc[1]
    near = dedup.simhash_near_pairs(
        dedup.simhash_signatures(spark.createDataFrame(pdf)),
        max_hamming=3).toPandas()
    assert len(near) == 1 and near.hamming.iloc[0] == 0


def test_simhash_band_recall_planted(spark):
    """Pigeonhole recall guarantee: every planted pair within the requested
    hamming radius must be found — including pairs whose differing bits are
    spread one-per-16-bit-band (which a fixed 4-band split would miss)."""
    base = 0x0123456789ABCDEF
    variants = {
        "v0": base,                                    # hamming 0
        "v4spread": base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)),
        "v8spread": base ^ sum(1 << (8 * i) for i in range(8)),
        "v8hi": base ^ (0xFF << 56),                   # hamming 8, top byte
        "far": base ^ ((1 << 20) - 1),                 # hamming 20
    }

    def to_signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    pdf = pd.DataFrame({
        "doc_id": ["base"] + list(variants),
        "simhash": [to_signed(base)] + [to_signed(v)
                                        for v in variants.values()],
    })
    sigs = spark.createDataFrame(pdf)
    got = dedup.simhash_near_pairs(sigs, max_hamming=8).toPandas()
    found = {tuple(sorted(t)) for t in zip(got.id_a, got.id_b)}
    # brute-force oracle over all pairs
    expected = set()
    rows = list(zip(pdf.doc_id, pdf.simhash))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ham = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
            if ham <= 8:
                expected.add(tuple(sorted((rows[i][0], rows[j][0]))))
    assert found == expected
    assert ("base", "v8spread") in found
    assert ("base", "v8hi") in found


def test_text_quality_and_lang(spark):
    pdf = pd.DataFrame({
        "doc_id": ["e", "d", "f", "u"],
        "text": ["the cat and the dog is in the house",
                 "der Hund und die Katze ist nicht hier",
                 "le chat et les chiens est la",
                 "xyzzy plugh 12345"],
    })
    df = textfns.lang_id(spark.createDataFrame(pdf))
    got = {r.doc_id: r.lang_pred for r in df.collect()}
    assert got == {"e": "en", "d": "de", "f": "fr", "u": "und"}
    q = textfns.quality_score(spark.createDataFrame(pdf)).toPandas()
    assert ((q.quality_score >= 0) & (q.quality_score <= 1)).all()
    row = q.set_index("doc_id").loc["e"]
    assert row.n_tokens == 9


def test_fingerprint_deterministic(spark):
    pdf = pd.DataFrame({"text": ["a b c", "a b c", "a b d", "", None]})
    df = spark.createDataFrame(pdf).withColumn(
        "fp", textfns.doc_fingerprint(F.col("text")))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1] != fps[2]
    assert fps[3] == 0
    assert fps[4] == 0       # NULL text keeps the fingerprints-to-0 contract


def test_brute_knn_matches_numpy(emb):
    pdf = emb.toPandas()
    M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    queries = pdf.head(5)
    got = simsearch.brute_knn(emb, queries, k=5).toPandas()
    S = (Mn[:5] @ Mn.T)
    for qi in range(5):
        order = np.lexsort((pdf.vec_id.to_numpy(), -S[qi]))[:5]
        exp_ids = pdf.vec_id.to_numpy()[order]
        g = got[got.query_id == pdf.vec_id[qi]].sort_values("rank")
        assert list(g.cand_id) == list(exp_ids)
        np.testing.assert_allclose(np.sort(S[qi])[::-1][:5],
                                   g.score.to_numpy(), rtol=1e-9)


def test_lsh_knn_recall(emb):
    pdf = emb.toPandas()
    queries = emb.limit(10)
    exact = simsearch.brute_knn(emb, pdf.head(10), k=5).toPandas()
    approx = simsearch.lsh_knn(emb, queries, dim=64, k=5, n_bits=4,
                               n_tables=8).toPandas()
    hits = 0
    total = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].cand_id)
        a = set(approx[approx.query_id == qid].cand_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.5      # recall with 6×8-bit tables


def test_embedding_near_dup_self(spark, emb):
    # duplicate a vector under a new id → must be caught
    pdf = emb.limit(3).toPandas()
    dup = pdf.copy()
    dup["vec_id"] = dup["vec_id"] + 1_000_000
    both = spark.createDataFrame(pd.concat([pdf, dup]))
    pairs = simsearch.embedding_near_dup(both, dim=64, threshold=0.999,
                                         n_bits=8).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for vid in pdf.vec_id:
        assert (vid, vid + 1_000_000) in found


def test_ivf_knn_recall_and_determinism(emb):
    pdf = emb.toPandas()
    queries = emb.limit(10)
    exact = simsearch.brute_knn(emb, pdf.head(10), k=5).toPandas()
    a1 = simsearch.ivf_knn(emb, queries, dim=64, k=5, n_centroids=16,
                           n_probe=4).toPandas()
    a2 = simsearch.ivf_knn(emb, queries, dim=64, k=5, n_centroids=16,
                           n_probe=4).toPandas()
    # deterministic across runs (seeded quantizer, deterministic sample)
    pd.testing.assert_frame_equal(
        a1.sort_values(["query_id", "rank"]).reset_index(drop=True),
        a2.sort_values(["query_id", "rank"]).reset_index(drop=True))
    hits = total = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].cand_id)
        a = set(a1[a1.query_id == qid].cand_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.5      # 4 of 16 buckets probed
    # self is always found (probe contains own centroid)
    for qid in a1.query_id.unique():
        assert qid in set(a1[a1.query_id == qid].cand_id)


def test_ivf_tiny_candidate_set(spark):
    # n_centroids floor must not exceed the population (was a crash)
    pdf = pd.DataFrame({"vec_id": [0, 1],
                        "embedding": [list(np.ones(8)),
                                      list(np.arange(8.0))]})
    df = spark.createDataFrame(pdf)
    got = simsearch.ivf_knn(df, df, dim=8, k=1, n_probe=1).toPandas()
    assert set(got.query_id) == {0, 1}


def test_brute_knn_boundary_ties_deterministic(spark):
    """Rounded tied scores at the per-batch top-k boundary must keep the
    smaller cand_id, matching the global window order (so partial and
    global top-k agree on the truth set)."""
    rs = np.random.RandomState(3)
    base = rs.normal(size=8)
    rows = [(0, list(base))]
    # many exact duplicates -> all tie at score 1.0
    for i in range(1, 40):
        rows.append((i, list(base)))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    df = spark.createDataFrame(pdf).repartition(8)   # ties split batches
    got = simsearch.brute_knn(df, pdf.head(1), k=5,
                              round_decimals=6).toPandas()
    assert sorted(got.cand_id) == [0, 1, 2, 3, 4]


def test_ngram_dedup_pairs_exact(docs, docs_pdf):
    """Inverted-index pairs equal brute-force all-pairs shingle Jaccard."""
    got = dedup.ngram_dedup_pairs(docs, k=3, threshold=0.5).toPandas()
    texts = docs_pdf.set_index(docs_pdf.doc_id.astype(str)).text
    ids = sorted(texts.index)
    sh = {i: _py_shingles(texts[i], k=3) for i in ids}
    exp = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / len(sh[a] | sh[b])
                if j >= 0.5:
                    exp[(a, b)] = j
    got_map = {(r.id_a, r.id_b): r.jaccard for r in got.itertuples()}
    assert got_map.keys() == exp.keys()
    for key, j in exp.items():
        assert abs(got_map[key] - j) < 1e-12


def test_ngram_dedup_pairs_max_df_recall(docs, docs_pdf):
    """The stop-shingle cap must keep every ≥-threshold pair on this
    fixture (near-dup overlap is dominated by rare shingles) and report
    the same exact Jaccard values as the uncapped run."""
    full = dedup.ngram_dedup_pairs(docs, k=3, threshold=0.5).toPandas()
    capped = dedup.ngram_dedup_pairs(docs, k=3, threshold=0.5,
                                     max_df=10).toPandas()
    key = ["id_a", "id_b"]
    f = full.sort_values(key).reset_index(drop=True)
    c = capped.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, c, check_like=True)


def test_brute_near_dup_matches_numpy(emb):
    got = simsearch.brute_near_dup(emb, threshold=0.4,
                                   round_decimals=6).toPandas()
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(M @ M.T, 6)
    exp = {}
    for x in range(len(ids)):
        for y in range(len(ids)):
            if ids[x] < ids[y] and S[x, y] >= 0.4:
                exp[(ids[x], ids[y])] = S[x, y]
    got_map = {(r.id_a, r.id_b): r.score for r in got.itertuples()}
    assert got_map.keys() == exp.keys()
    for k2, v in exp.items():
        assert got_map[k2] == v


def test_brute_near_dup_cap(spark):
    big = spark.range(100_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"))
    with pytest.raises(ValueError, match="100k"):
        simsearch.brute_near_dup(big)
