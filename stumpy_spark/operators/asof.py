"""As-of (nearest-preceding) join — the canonical timeseries join.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group (backward as-of, the
DuckDB / pandas ``merge_asof`` default).

Spark-first plan (no UDF, no range self-join):

1. union the two sides with a side tag, carrying the right side's
   payload columns as nulls on left rows;
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal timestamps so ties match, per ASOF ``<=``;
3. ``last_value(..., ignorenulls=True)`` propagates the latest right
   payload forward onto each left row;
4. filter back to left rows.

Cost: ONE shuffle on the key column; the window is a per-key sorted
stream (no buffering beyond the running last value), so a hot key
degrades to a single sorted scan, never a cross product.  Contrast the
naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max-per-row
plan, which is quadratic per key.  A ``tolerance`` bound is applied as
a post-filter on the matched timestamp, which keeps the single-shuffle
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              ts_col: str = "ts", right_cols: list[str] | None = None,
              tolerance_us: int | None = None,
              suffix: str = "_right",
              tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join; left rows keep all columns, matched right
    payload columns arrive as ``<col><suffix>`` (null when no earlier
    right row exists, or the match is outside ``tolerance_us``).

    ``tiebreak`` names a right-side column that deterministically picks
    the winner among right rows sharing (key, ts) — the highest value
    wins (ASOF over duplicate timestamps is otherwise ambiguous in any
    engine)."""
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in (key, ts_col)]
    payload = [f"{c}{suffix}" for c in right_cols]
    ts_r = f"{ts_col}{suffix}"

    lt = left.select(
        F.col(key), F.col(ts_col), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_cols, payload)],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(ts_r))
    rt = right.select(
        F.col(key), F.col(ts_col), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts_col)],
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        F.col(ts_col).alias(ts_r))

    order = [F.col(ts_col), F.col("_side")]
    if tiebreak is not None:
        tb = (f"{tiebreak}{suffix}" if tiebreak in right_cols
              else tiebreak)
        order.append(F.col(tb).asc_nulls_first())
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = lt.unionByName(rt)
    for p in payload + [ts_r]:
        u = u.withColumn(p, F.last(p, ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1).drop("_side")
    if tolerance_us is not None:
        # timestampdiff is type-correct for both TIMESTAMP and
        # TIMESTAMP_NTZ inputs (an ntz->ltz cast would reinterpret wall
        # clock in the session tz — not gap-preserving across DST)
        gap = F.expr(
            f"timestampdiff(MICROSECOND, {ts_r}, {ts_col})")
        in_tol = F.col(ts_r).isNotNull() & (gap <= F.lit(tolerance_us))
        for p in payload + [ts_r]:
            out = out.withColumn(p, F.when(in_tol, F.col(p)))
    return out
