"""Exact per-bucket quantiles over a bounded integer domain.

Percentile rollups (p50/p95/p99 of sequence length per source/day) are
a standard tier in a token-pipeline observability stack.  The naive
Spark ``percentile`` aggregate buffers every value per group — fine for
small groups, a per-group OOM at 100 TB where one (source, day) bucket
can hold billions of rows.

This module instead computes EXACT quantiles through a count histogram,
exploiting that the value domain (token counts) is bounded integers:

1. :func:`value_histogram` — ``groupBy(keys, value)`` count, a
   partial-aggregated shuffle whose key cardinality is |buckets| x
   |distinct values|, independent of row count (the "sketch" is exact
   because the domain is discrete).  :func:`streaming_value_histogram`
   is the watermarked Structured-Streaming twin: the histogram tier is
   maintained incrementally and late rows inside the watermark
   re-aggregate their (bucket, value) cell.
2. :func:`quantiles_from_hist` — a cumulative sum over the per-bucket
   histogram (tiny: one row per distinct value per bucket) and the
   type-1 / lower-quantile pick ``min{ v : cum_count >= ceil(q*n) }``.

Stage 2's window runs over histogram rows, not data rows, so the sort
is bounded by the domain size, not the data size — and it can run as a
cheap batch read over the continuously-maintained streaming histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
_WINDOW = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def value_histogram(df: DataFrame, value_col: str = "n_tok",
                    tier: str = "1d", by: str = "source",
                    ts_col: str = "event_ts") -> DataFrame:
    """(by, bucket, v, c) exact count histogram per tier bucket."""
    bucket = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket")
    return (df.select(F.col(by), bucket, F.col(value_col).alias("v"))
            .groupBy(by, "bucket", "v")
            .agg(F.count("*").alias("c")))


def streaming_value_histogram(stream_df: DataFrame,
                              value_col: str = "n_tok",
                              tier: str = "1d", by: str = "source",
                              ts_col: str = "event_ts",
                              watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`value_histogram`.

    ``window(ts, tier).start`` is epoch-aligned, so it equals
    ``date_trunc`` and a complete-mode run over the same rows matches
    the batch histogram bit-for-bit (asserted in tests); in append mode
    a (bucket, v) cell emits once the watermark passes the bucket.

    The watermark column is built from epoch-micros of the NTZ input
    (wall clock as UTC) and the bucket converted back the same way —
    tz-independent, so parity with the batch ``date_trunc`` holds under
    any session timezone (same DST rationale as sessions.py).
    """
    from .sessions import epoch_us
    win = F.window(F.col("_evt"), _WINDOW[tier]).alias("_win")
    bucket_ntz = F.expr(
        "timestampadd(MICROSECOND, unix_micros(_win.start), "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    return (stream_df
            .withColumn("_evt", F.timestamp_micros(epoch_us(ts_col)))
            .withWatermark("_evt", watermark)
            .groupBy(F.col(by), win, F.col(value_col).alias("v"))
            .agg(F.count("*").alias("c"))
            .withColumn("bucket", bucket_ntz)
            .select(by, "bucket", "v", "c"))


def quantiles_from_hist(hist: DataFrame,
                        qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                        by: str = "source") -> DataFrame:
    """Type-1 quantiles from a (by, bucket, v, c) histogram."""
    w = (Window.partitionBy(by, "bucket").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(by, "bucket")
    cum = (hist.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(wt)))
    aggs = []
    for q in qs:
        name = f"q{int(round(q * 100))}"
        thresh = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(F.min(F.when(F.col("cum") >= thresh, F.col("v")))
                    .cast("long").alias(name))
    return cum.groupBy(by, "bucket").agg(*aggs)


def bucket_quantiles(df: DataFrame, qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                     value_col: str = "n_tok", tier: str = "1d",
                     by: str = "source",
                     ts_col: str = "event_ts") -> DataFrame:
    """Exact type-1 quantiles of ``value_col`` per (by, tier bucket).

    Output: (by, bucket, q50, q95, ... one long column per requested
    quantile, named q<100*q>).
    """
    return quantiles_from_hist(
        value_histogram(df, value_col, tier, by, ts_col), qs, by=by)
