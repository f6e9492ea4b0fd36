"""Streaming tier aggregation parity: the watermarked streaming rollup
over micro-batched input must equal the batch tier over the same rows —
including a late batch that re-aggregates already-seen buckets."""

import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from stumpy_spark.rollup import tiers as RT
from stumpy_spark.rollup.streaming import streaming_rollup
from stumpy_spark.sources import tokseq


@pytest.fixture(scope="module")
def toks(spark):
    df = tokseq.tokseq_df(spark, 300, partitions=4).cache()
    df.count()
    return df


def test_streaming_rollup_equals_batch_with_late_batch(spark, toks,
                                                       tmp_path):
    # split: "late" rows (every 3rd doc) arrive in the second micro-batch
    is_late = F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0
    indir = tmp_path / "in"
    indir.mkdir()

    def write_batch(df, name):
        out = tmp_path / f"stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(out))
        import shutil
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, indir / f"{name}.parquet")

    write_batch(toks.where(~is_late), "batch0")
    time.sleep(1.1)
    write_batch(toks.where(is_late), "batch1")

    stream = (spark.readStream.schema(toks.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    agg = streaming_rollup(stream, tier="1m", m=25,
                           watermark="365 days")
    q = (agg.writeStream.format("memory").queryName("stream_1m")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.sql("SELECT * FROM stream_1m").toPandas()
           .sort_values(["source", "bucket"]).reset_index(drop=True))
    raw = RT.per_sequence_stats_fused(toks, m=25)
    exp = (RT.rollup_tier(raw, "1m").toPandas()
           .sort_values(["source", "bucket"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("n_seq", "sum_n_tok", "sum_window_sums"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    np.testing.assert_array_equal(got.min_mean.to_numpy(),
                                  exp.min_mean.to_numpy())
    # window(event_ts, '1 minute').start == date_trunc('minute', ...)
    assert (got.bucket.to_numpy() == exp.bucket.to_numpy()).all()


def test_streaming_sessionize_equals_batch_with_late_batch(spark,
                                                           tmp_path):
    """Watermarked streaming session_window over micro-batches equals
    batch sessionize — including late events that MERGE (or bridge)
    sessions already formed by the first batch."""
    import shutil
    from stumpy_spark.rollup.sessions import sessionize, \
        streaming_sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts", "value").cache()
    ev.count()
    # every 3rd event arrives late: holes inside sessions, so the
    # second micro-batch must merge/bridge existing session state
    is_late = F.pmod(F.xxhash64(F.col("ts").cast("string")),
                     F.lit(3)) == 0
    indir = tmp_path / "in"
    indir.mkdir()

    def write_batch(df, name):
        out = tmp_path / f"stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, indir / f"{name}.parquet")

    write_batch(ev.where(~is_late), "batch0")
    time.sleep(1.1)
    write_batch(ev.where(is_late), "batch1")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    agg = streaming_sessionize(stream, gap_seconds=1800,
                               watermark="365 days")
    q = (agg.writeStream.format("memory").queryName("stream_sess")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.sql("SELECT * FROM stream_sess").toPandas()
           .sort_values(["user_id", "session_start_us"])
           .reset_index(drop=True))
    exp = (sessionize(ev, gap_seconds=1800).toPandas()
           .sort_values(["user_id", "session_start_us"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("user_id", "session_start_us", "session_end_us",
                "n_events", "sum_value"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_streaming_dedup_exact_first_occurrence(spark, tmp_path):
    """Streaming exact dedup emits exactly one row per distinct text
    across micro-batches — cross-batch duplicates are suppressed by the
    state store, and the survivor is the first-arriving occurrence."""
    import shutil
    from stumpy_spark.functions.dedup import streaming_dedup_exact

    pdf0 = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["aa bb", "cc dd", "aa bb"]})
    pdf1 = pd.DataFrame({"doc_id": [4, 5],
                         "text": ["aa bb", "ee ff"]})  # 4 is a cross-batch dup
    indir = tmp_path / "in"
    indir.mkdir()
    for name, pdf in (("b0", pdf0), ("b1", pdf1)):
        out = tmp_path / f"stage_{name}"
        spark.createDataFrame(pdf).coalesce(1).write \
            .mode("overwrite").parquet(str(out))
        shutil.copy(next(out.glob("part-*.parquet")),
                    indir / f"{name}.parquet")
        time.sleep(1.1)

    schema = spark.createDataFrame(pdf0).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    q = (streaming_dedup_exact(stream).writeStream
         .format("memory").queryName("stream_dedup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.sql("SELECT * FROM stream_dedup").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    # one row per distinct text; within-batch dup 3 and cross-batch dup 4
    # both suppressed
    assert sorted(got["text"]) == ["aa bb", "cc dd", "ee ff"]
    assert set(got["doc_id"]) == {1, 2, 5}


def test_streaming_sessionize_dst_safe(spark, tmp_path):
    """Batch/streaming session parity must hold under a non-UTC session
    timezone across a DST transition: the streaming watermark column is
    built from epoch-micros, never an ntz->ltz wall-clock cast (which
    stretches the 2025-11-02 01:45 -> 02:10 NTZ gap from 25 to 85
    minutes in America/New_York and would split the session)."""
    import shutil
    from datetime import datetime
    from stumpy_spark.rollup.sessions import sessionize, \
        streaming_sessionize

    pdf = pd.DataFrame({
        "user_id": [1, 1],
        "ts": [datetime(2025, 11, 2, 1, 45, 0),
               datetime(2025, 11, 2, 2, 10, 0)],
        "value": [1.0, 2.0]})
    ev = spark.createDataFrame(pdf)
    indir = tmp_path / "in_dst"
    indir.mkdir()
    out = tmp_path / "stage_dst"
    ev.coalesce(1).write.mode("overwrite").parquet(str(out))
    shutil.copy(next(out.glob("part-*.parquet")), indir / "b0.parquet")

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(indir)))
        agg = streaming_sessionize(stream, gap_seconds=1800,
                                   watermark="365 days")
        q = (agg.writeStream.format("memory").queryName("stream_dst")
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "ckpt_dst"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = spark.sql("SELECT * FROM stream_dst").toPandas()
        exp = sessionize(ev, gap_seconds=1800).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert len(exp) == 1        # batch: one 25-min session
    assert len(got) == 1        # streaming must agree under NY tz
    assert (got.sort_index(axis=1).values ==
            exp.sort_index(axis=1).values).all()


def test_streaming_histogram_quantiles_equal_batch(spark, toks,
                                                   tmp_path):
    """The watermarked streaming value-histogram over micro-batches,
    finished with the shared quantile stage, equals batch
    bucket_quantiles — including late rows that re-aggregate existing
    (bucket, value) cells."""
    import shutil
    from stumpy_spark.rollup.quantiles import (bucket_quantiles,
                                               quantiles_from_hist,
                                               streaming_value_histogram)

    ev = toks.select("source", "event_ts", "n_tok")
    is_late = F.pmod(F.xxhash64("event_ts"), F.lit(3)) == 0
    indir = tmp_path / "in_hist"
    indir.mkdir()

    def write_batch(df, name):
        out = tmp_path / f"stage_h_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(out))
        shutil.copy(next(out.glob("part-*.parquet")),
                    indir / f"{name}.parquet")

    write_batch(ev.where(~is_late), "b0")
    time.sleep(1.1)
    write_batch(ev.where(is_late), "b1")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    hist = streaming_value_histogram(stream, tier="1d",
                                     watermark="365 days")
    q = (hist.writeStream.format("memory").queryName("stream_hist")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (quantiles_from_hist(spark.sql("SELECT * FROM stream_hist"))
           .toPandas().sort_values(["source", "bucket"])
           .reset_index(drop=True))
    exp = (bucket_quantiles(toks, tier="1d").toPandas()
           .sort_values(["source", "bucket"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("source", "q50", "q95", "q99"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (got["bucket"].to_numpy() == exp["bucket"].to_numpy()).all()
