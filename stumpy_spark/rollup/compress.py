"""Gorilla-compressed storage of rolled-up points.

``compress_tier`` groups a tier by (source, day) and packs each group's
(bucket_ts, value) stream into one Gorilla-encoded ``binary`` cell via
``applyInPandas`` — encoding happens executor-side in Arrow batches; the
driver never sees point data.  ``decompress_tier`` is the inverse (used by
reads and the roundtrip tests).

The (source, day) chunk key mirrors the tier partitioning, so the shuffle
that feeds compression is the same one the tier write already performs —
compression adds no extra exchange at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import gorilla

_CHUNK_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("day", T.DateType()),
    T.StructField("metric", T.StringType()),
    T.StructField("n_points", T.IntegerType()),
    T.StructField("raw_bytes", T.LongType()),
    T.StructField("encoded_bytes", T.LongType()),
    T.StructField("blob", T.BinaryType()),
])

_POINT_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("metric", T.StringType()),
    T.StructField("bucket", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def compress_tier(tier_df: DataFrame, metrics: list[str]) -> DataFrame:
    """Pack each (source, day, metric) series into one Gorilla blob."""
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        ts = (pdf["bucket"].astype("int64") // 10 ** 9).to_numpy()
        src = pdf["source"].iloc[0]
        day = pdf["bucket"].dt.date.iloc[0]
        rows = []
        for metric in metrics:
            vals = pdf[metric].astype(np.float64).to_numpy()
            blob = gorilla.encode(ts, vals)
            rows.append((src, day, metric, len(ts), 16 * len(ts),
                         len(blob), blob))
        return pd.DataFrame(rows, columns=[
            "source", "day", "metric", "n_points", "raw_bytes",
            "encoded_bytes", "blob"])

    keyed = tier_df.withColumn("day", F.to_date("bucket"))
    return keyed.groupBy("source", "day").applyInPandas(
        pack, schema=_CHUNK_SCHEMA)


def decompress_tier(chunks: DataFrame) -> DataFrame:
    """Inverse of :func:`compress_tier`: explode blobs back into points."""
    def unpack(pdfs):
        for pdf in pdfs:
            out = []
            for r in pdf.itertuples(index=False):
                ts, vals = gorilla.decode(r.blob)
                out.append(pd.DataFrame({
                    "source": r.source,
                    "metric": r.metric,
                    "bucket": pd.to_datetime(ts, unit="s"),
                    "value": vals,
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return chunks.mapInPandas(unpack, schema=_POINT_SCHEMA)
