"""Deterministic dataset splitting / downsampling for training pipelines.

Repeatable train/val/test assignment must be a pure function of a
stable key — never ``rand()`` (re-rolls on retry/recompute, breaks
exactly-once semantics across jobs) and never ``randomSplit`` (depends
on partitioning).  Assignment here is a pure Catalyst expression over
the id column: zero shuffle, survives AQE re-planning, identical on
every cluster size — the property that matters when the same 100 TB
corpus is split by many independent jobs.

Two bucket functions:

- ``xxhash64`` (default): Spark's built-in 64-bit hash with a salt
  column — high-quality mixing for arbitrary id types.
- ``mcg``: a multiplicative-congruential bucket over integer ids,
  ``((id mod M) * 7919 + salt) mod M`` with M=10000.  Weaker mixing
  (documented), but expressible bit-for-bit in any SQL engine — this
  is what the DuckDB oracle checks, closing the loop on the whole
  split pipeline rather than trusting an engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 10000


def split_bucket(id_col: Column, method: str = "xxhash64",
                 salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10000) for split thresholds."""
    if method == "xxhash64":
        return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_M))
    if method == "mcg":
        # ((id mod M) * 7919 + salt) mod M: all intermediates < 8e7,
        # safe under ANSI arithmetic, identical in any engine
        return F.pmod(F.pmod(id_col, F.lit(_M)) * F.lit(7919)
                      + F.lit(salt), F.lit(_M))
    raise ValueError(f"unknown method {method!r}")


def hash_split(df: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id", method: str = "xxhash64",
               salt: int = 0) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name -> fraction (must sum to <= 1; any
    remainder is assigned to the last split).  Assignment is by
    cumulative bucket thresholds, so enlarging one split keeps every
    row's previous assignment stable where ranges overlap (the standard
    hash-partitioned holdout property).
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError("weights sum to > 1")
    # NOTE: any remainder (1 - total) goes to the LAST split; for a
    # fractional subset with nothing assigned to the rest, use
    # deterministic_sample instead.
    b = split_bucket(F.col(id_col), method=method, salt=salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < F.lit(int(round(acc * _M)))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         method: str = "xxhash64",
                         salt: int = 0) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows: pure filter on the
    bucket, no shuffle, stable across re-runs and cluster sizes."""
    b = split_bucket(F.col(id_col), method=method, salt=salt)
    return df.where(b < F.lit(int(round(fraction * _M))))
