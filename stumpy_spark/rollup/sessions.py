"""Gap-based sessionization over an event stream.

The canonical training-pipeline / timeseries op the rollup tiers don't
cover: group events into per-user sessions separated by >= gap of
inactivity, then aggregate per session.

Scale design (100 TB):
- the aggregate path uses Spark's native ``F.session_window`` — a
  *groupBy aggregation*, not a window function, so it gets map-side
  partial aggregation and never materializes a per-user sorted row
  stream.  One shuffle on (user, merged-window).
- session membership depends only on timestamp gaps, so the result is
  deterministic even with duplicate timestamps (ties land in the same
  session by definition: gap 0 < any positive gap).
- the same call works under Structured Streaming (session_window +
  watermark) — this module is the batch twin.
- per-user skew: a user with millions of events still aggregates
  map-side per partition before the merge; no per-user global sort.

Semantics (matches Spark's session_window, measured): an event extends
the current session iff ``ts <= prev_ts + gap`` — windows merge when
they touch, so a gap of exactly ``gap_seconds`` stays in-session and
only ``> gap_seconds`` starts a new one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_us(col_sql: str) -> Column:
    """Exact integer epoch-microseconds of a TIMESTAMP_NTZ expression,
    timezone-independent (never routes through an ntz->ltz cast, whose
    wall-clock reinterpretation is not gap-preserving across DST in a
    non-UTC session timezone)."""
    return F.expr("timestampdiff(MICROSECOND, "
                  f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_sql})") \
        .cast("long")


def _session_aggs(ts_col: str, value_col: str) -> list[Column]:
    """The shared batch/streaming session aggregate contract."""
    return [
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum(value_col), 3).alias("sum_value"),
        epoch_us(f"min({ts_col})").alias("session_start_us"),
        epoch_us(f"max({ts_col})").alias("session_end_us"),
    ]

_OUT = ["session_start_us", "session_end_us", "n_events", "sum_value"]


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Per-(user, session) aggregate rows.

    Output: (user_col, session_start_us, session_end_us, n_events,
    sum_value) — session bounds as exact integer epoch-microseconds
    (timezone-independent for TIMESTAMP_NTZ inputs, and bit-comparable
    across engines, unlike string-formatted or float-second stamps).
    """
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (events
            .groupBy(F.col(user_col), sw.alias("_w"))
            .agg(*_session_aggs(ts_col, value_col))
            .select(user_col, *_OUT))


def streaming_sessionize(stream_df: DataFrame, gap_seconds: int = 1800,
                         user_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value",
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`sessionize`.

    ``session_window`` is natively stateful under Structured Streaming:
    the watermark bounds session state, late events inside it merge
    into (or bridge!) existing sessions, and append mode emits a
    session once the watermark passes its close.  Columns match the
    batch function exactly — a complete-mode run over the same rows
    equals batch ``sessionize`` bit-for-bit (asserted in tests).
    """
    # watermarks require TIMESTAMP (with-tz); build the instant from
    # epoch-micros, NOT an ntz->ltz cast — the cast reinterprets wall
    # clock in the session timezone, which is not gap-preserving across
    # DST transitions and would break batch/streaming session parity
    sw = F.session_window(F.col("_evt"), f"{gap_seconds} seconds")
    return (stream_df
            .withColumn("_evt", F.timestamp_micros(epoch_us(ts_col)))
            .withWatermark("_evt", watermark)
            .groupBy(F.col(user_col), sw.alias("_w"))
            .agg(*_session_aggs(ts_col, value_col))
            .select(user_col, *_OUT))
