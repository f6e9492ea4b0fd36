"""Exact per-bucket quantiles over a bounded integer domain.

Percentile rollups (p50/p95/p99 of sequence length per source/day) are
a standard tier in a token-pipeline observability stack.  The naive
Spark ``percentile`` aggregate buffers every value per group — fine for
small groups, a per-group OOM at 100 TB where one (source, day) bucket
can hold billions of rows.

This module instead computes EXACT quantiles through a count histogram,
exploiting that the value domain (token counts) is bounded integers:

1. ``groupBy(keys, value)`` count  — partial-aggregated shuffle whose
   key cardinality is |buckets| x |distinct values|, independent of row
   count (the "sketch" is exact because the domain is discrete).
2. a cumulative sum over the per-bucket histogram (tiny: one row per
   distinct value per bucket) and the type-1 / lower-quantile pick
   ``min{ v : cum_count >= ceil(q * n) }``.

Stage 2's window runs over histogram rows, not data rows, so the sort
is bounded by the domain size, not the data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}


def bucket_quantiles(df: DataFrame, qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                     value_col: str = "n_tok", tier: str = "1d",
                     by: str = "source",
                     ts_col: str = "event_ts") -> DataFrame:
    """Exact type-1 quantiles of ``value_col`` per (by, tier bucket).

    Output: (by, bucket, q50, q95, ... one long column per requested
    quantile, named q<100*q>).
    """
    bucket = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket")
    hist = (df.select(F.col(by), bucket, F.col(value_col).alias("v"))
            .groupBy(by, "bucket", "v")
            .agg(F.count("*").alias("c")))
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
    return (cum.groupBy(by, "bucket").agg(*aggs))
