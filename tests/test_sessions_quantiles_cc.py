"""Tests for sessionization, histogram quantiles, connected-components
dedup clustering, and heavy hitters — pure-python oracles."""

import math
from collections import Counter
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import functions as F

from stumpy_spark.functions import dedup, textfns
from stumpy_spark.rollup.quantiles import bucket_quantiles
from stumpy_spark.rollup.sessions import sessionize

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    return {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}


def test_connected_components_chain_and_triangle(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    # pair 20-21
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (20, 21)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {r["id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    nodes = sorted({x for e in edges for x in e})
    want = _uf_components(edges, nodes)
    assert got == want


def test_dedup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6]}))
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]}))
    out = dedup.dedup_clusters(docs, pairs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["cluster_id"]) == [1, 1, 1, 4, 5, 6]
    assert list(out["cluster_size"]) == [3, 3, 3, 1, 1, 1]


def test_connected_components_string_ids(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": ["b", "c"], "id_b": ["a", "b"]}))
    got = {r["id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def test_sessionize_gap_boundary(spark):
    t0 = datetime(2025, 1, 1, 0, 0, 0)
    gap = 60
    us = 1_000_000
    rows = [
        # user 1: second event exactly at the gap boundary STAYS in
        # session (windows merge when they touch); third is 1us past
        # the boundary from the second -> new session
        (1, t0, 1.0),
        (1, t0 + timedelta(seconds=gap), 2.0),
        (1, t0 + timedelta(seconds=2 * gap, microseconds=1), 3.0),
        # user 2: within-gap chain stays one session
        (2, t0, 5.0),
        (2, t0 + timedelta(seconds=gap - 1), 6.0),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
    out = sessionize(ev, gap_seconds=gap).toPandas() \
        .sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    assert list(out["user_id"]) == [1, 1, 2]
    assert list(out["n_events"]) == [2, 1, 2]
    assert list(out["sum_value"]) == [3.0, 3.0, 11.0]
    # exact microsecond spans (absolute epoch is tz-dependent locally)
    spans = (out["session_end_us"] - out["session_start_us"]).tolist()
    assert spans == [gap * us, 0, (gap - 1) * us]


def test_sessionize_events_fixture_python_oracle(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = sessionize(ev, gap_seconds=1800).toPandas()
    pdf = ev.select("user_id", "ts", "value").toPandas() \
        .sort_values(["user_id", "ts"])
    want = []
    for uid, g in pdf.groupby("user_id"):
        ts = g["ts"].astype("int64").tolist()  # ns
        vals = g["value"].tolist()
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > 1800 * 10**9:
                want.append((uid, len(vals[start:i]),
                             round(sum(vals[start:i]), 3)))
                start = i
    got = sorted(zip(out["user_id"], out["n_events"], out["sum_value"]))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# histogram quantiles
# ---------------------------------------------------------------------------

def test_bucket_quantiles_matches_type1(spark):
    from stumpy_spark.sources.tokseq import read_tokseq
    df = read_tokseq(spark, SF)
    out = bucket_quantiles(df, qs=(0.5, 0.95, 0.99), tier="1d")
    got = out.toPandas()
    pdf = df.select("source", F.date_trunc("day", "event_ts")
                    .alias("bucket"), "n_tok").toPandas()
    for _, row in got.iterrows():
        vals = sorted(pdf[(pdf["source"] == row["source"]) &
                          (pdf["bucket"] == row["bucket"])]["n_tok"])
        n = len(vals)
        for q, col in ((0.5, "q50"), (0.95, "q95"), (0.99, "q99")):
            want = vals[math.ceil(q * n) - 1]
            assert row[col] == want, (row["source"], row["bucket"], q)


# ---------------------------------------------------------------------------
# heavy hitters
# ---------------------------------------------------------------------------

def test_top_tokens_matches_counter(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textfns.top_tokens(docs, k=5).toPandas()
    pdf = docs.select("source", "text").toPandas()
    for src, g in pdf.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(w for w in (t or "").split() if w)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        sub = out[out["source"] == src].sort_values("rank")
        got = list(zip(sub["token"], sub["n"]))
        assert got == want, src


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_join_matches_merge_asof(spark):
    from stumpy_spark.operators.asof import asof_join
    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id", "value")
    got = asof_join(left, right, key="user_id", ts_col="ts",
                    tiebreak="event_id").toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts") \
        .rename(columns={"event_id": "event_id_right",
                         "value": "value_right", "ts": "ts_right"})
    want = pd.merge_asof(lp, rp, left_on="ts", right_on="ts_right",
                         by="user_id", direction="backward") \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got["event_id"]) == list(want["event_id"])
    assert got["event_id_right"].fillna(-1).tolist() == \
        want["event_id_right"].fillna(-1).tolist()
    assert got["ts_right"].tolist() == want["ts_right"].tolist()


def test_asof_join_tolerance_and_boundary(spark):
    from stumpy_spark.operators.asof import asof_join
    from datetime import datetime, timedelta
    t0 = datetime(2025, 1, 1)
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 1, 2], "ts": [t0 + timedelta(seconds=s)
                                for s in (10, 100, 5)],
         "lid": [1, 2, 3]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 1, 2], "ts": [t0 + timedelta(seconds=s)
                                for s in (10, 50, 9)],
         "rid": [7, 8, 9]}))
    out = asof_join(left, right, key="k", ts_col="ts",
                    tolerance_us=20_000_000, tiebreak="rid") \
        .toPandas().sort_values("lid")
    # lid=1: right at exactly ts (<= matches), in tolerance -> rid 7
    # lid=2: last right is t+50, 50s gap > 20s tolerance -> null
    # lid=3: no right row <= t+5 -> null
    assert out["rid_right"].fillna(-1).tolist() == [7, -1, -1]


def test_connected_components_random_graphs(spark):
    """Randomized adversarial graphs (long paths + dense blobs) vs the
    union-find oracle — exercises multi-round convergence."""
    import numpy as np
    rs = np.random.RandomState(7)
    for trial in range(3):
        n = 40
        # a long path (worst-case diameter) + random extra edges
        path = [(i, i + 1) for i in range(n - 1)]
        extra = [(int(rs.randint(n)), int(rs.randint(n)))
                 for _ in range(10)]
        edges = [(a, b) for a, b in path + extra if a != b]
        pairs = spark.createDataFrame(
            pd.DataFrame(edges, columns=["id_a", "id_b"]))
        got = {r["id"]: r["cluster_id"]
               for r in dedup.connected_components(pairs).collect()}
        nodes = sorted({x for e in edges for x in e})
        assert got == _uf_components(edges, nodes), trial


# ---------------------------------------------------------------------------
# deterministic splits
# ---------------------------------------------------------------------------

def test_hash_split_deterministic_and_stable(spark):
    from stumpy_spark.functions.splits import (hash_split,
                                               deterministic_sample)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, w).select("doc_id", "split").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = hash_split(docs, w).select("doc_id", "split").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()          # re-run stable
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9                 # ~proportional
    # growing a split keeps previously-assigned rows (prefix property)
    w2 = {"train": 0.9, "val": 0.05, "test": 0.05}
    c = hash_split(docs, w2).select("doc_id", "split").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    was_train = a["split"] == "train"
    assert (c.loc[was_train.values, "split"] == "train").all()
    # deterministic_sample == the bucket filter it claims to be
    s1 = set(deterministic_sample(docs, 0.25).toPandas()["doc_id"])
    s2 = set(deterministic_sample(docs, 0.5).toPandas()["doc_id"])
    assert s1 <= s2                                  # nested samples


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_planted(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail me at john.doe+spam@sub.example.co.uk today",
            "call +1 (555) 123-4567 or 555 987 6543 now",
            "server at 192.168.0.1 and 10.0.0.255 up",
            "nothing sensitive here",
        ]})
    out = textfns.redact_pii(spark.createDataFrame(pdf)) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_redactions"]) == [1, 2, 2, 0]
    assert out.loc[0, "text"] == "mail me at [PII] today"
    assert out.loc[1, "text"] == "call [PII] or [PII] now"
    assert out.loc[2, "text"] == "server at [PII] and [PII] up"
    assert out.loc[3, "text"] == "nothing sensitive here"
