"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures, and the metadata fast path — while the actual media codecs
are stubbed (this container has no image/audio libraries): decode raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-hash-seeded fake decoder so the downstream feature
pipeline is fully testable.

Design for 100 TB: media bytes ride in ``binary`` columns next to their
metadata struct; metadata-only predicates (width/duration/mime filters)
prune row groups without touching the blobs (parquet column pruning — the
scan never reads the binary column unless a UDF needs it).  Decode /
resize / frame-sample run as ``mapInPandas`` over Arrow batches with
``maxRecordsPerBatch`` bounding batch memory = rows × max blob size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("mime", T.StringType(), False),
    T.StructField("width", T.IntegerType()),       # images/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),  # audio/video
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("blob", T.BinaryType(), False),
])

_EMB_DIM = 64

_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("decode_ok", T.BooleanType()),
])


def _fake_decode(blob: bytes, dim: int = _EMB_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector seeded
    by the content hash.  Same bytes → same features, any partitioning."""
    h = hashlib.sha256(blob).digest()
    seed = int.from_bytes(h[:8], "little") % (2 ** 32)
    rs = np.random.RandomState(seed)
    return rs.normal(size=dim).astype(np.float32)


def decode_features(df: DataFrame, fake: bool = False,
                    dim: int = _EMB_DIM) -> DataFrame:
    """Decode blobs → feature vectors (mapInPandas over Arrow batches).

    Real decode is stubbed: pass ``fake=True`` for the deterministic fake,
    otherwise NotImplementedError surfaces per-batch (the plumbing —
    schema, batching, partition flow — is the tested part).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            ok = []
            for blob in pdf["blob"]:
                if not fake:
                    raise NotImplementedError(
                        "media codecs unavailable in this environment; "
                        "pass fake=True for the deterministic stub")
                feats.append(_fake_decode(bytes(blob), dim))
                ok.append(True)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "feature": feats,
                "decode_ok": ok,
            })

    return df.select("media_id", "mime", "blob").mapInPandas(
        run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    (media_id, frame_ts_ms) rows from *metadata only* — the blob column is
    pruned from this scan entirely; actual frame extraction would join
    back to blobs in a later mapInPandas stage."""
    return (df.where(F.col("mime").startswith("video/"))
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  fake: bool = False) -> DataFrame:
    """Resize plumbing for image rows: same MEDIA_SCHEMA out, width/height
    rewritten to the target, blob replaced by the resized encoding.

    The actual pixel work is stubbed like :func:`decode_features`:
    ``fake=True`` substitutes a deterministic content-hash-seeded blob of
    size ∝ out_w·out_h (same bytes → same output under any partitioning),
    otherwise NotImplementedError surfaces per batch.  Non-image rows are
    filtered before the scan so their blobs are never read.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf["blob"]:
                if not fake:
                    raise NotImplementedError(
                        "media codecs unavailable in this environment; "
                        "pass fake=True for the deterministic stub")
                h = hashlib.sha256(bytes(blob)).digest()
                seed = int.from_bytes(h[:8], "little") % (2 ** 32)
                rs = np.random.RandomState(seed)
                blobs.append(bytearray(
                    rs.bytes(max(out_w * out_h // 64, 16))))
            out = pdf.copy()
            out["width"] = pd.array([out_w] * len(pdf), dtype="Int32")
            out["height"] = pd.array([out_h] * len(pdf), dtype="Int32")
            out["blob"] = blobs
            out["n_bytes"] = np.asarray([len(b) for b in blobs],
                                        dtype=np.int64)
            yield out

    imgs = df.where(F.col("mime").startswith("image/"))
    return imgs.mapInPandas(run, schema=MEDIA_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate: never touches the binary column."""
    return (df.groupBy("mime")
            .agg(F.count("*").alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.avg("duration_ms").alias("avg_duration_ms")))


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rs = np.random.RandomState(seed)
    rows = []
    mimes = ["image/png", "audio/wav", "video/mp4"]
    for i in range(n):
        mime = mimes[i % 3]
        blob = rs.bytes(rs.randint(64, 512))
        rows.append((
            f"media{i:06d}", mime,
            int(rs.randint(16, 1024)) if mime != "audio/wav" else None,
            int(rs.randint(16, 1024)) if mime != "audio/wav" else None,
            int(rs.randint(1000, 60000)) if mime != "image/png" else None,
            len(blob), bytearray(blob)))
    pdf = pd.DataFrame(rows, columns=[
        "media_id", "mime", "width", "height", "duration_ms", "n_bytes",
        "blob"])
    # pandas upcasts int+None object columns to float64, which Spark's
    # IntegerType verifier rejects — use the nullable Int32 extension dtype
    for c in ("width", "height", "duration_ms"):
        pdf[c] = pd.array(pdf[c].to_numpy(dtype=object), dtype="Int32")
    pdf["n_bytes"] = pdf["n_bytes"].astype("int64")
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def media_fixture_path(n: int = 300) -> str:
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".fixtures")
    return os.path.join(root, f"media_{n}")


def ensure_media_fixture(spark, n: int = 300, seed: int = 42) -> str:
    """Materialize the synthetic media table as parquet (idempotent) so the
    DuckDB oracle can recompute media_stats from the same bytes."""
    import os
    path = media_fixture_path(n)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synthetic_media_df(spark, n, seed).write.mode(
            "overwrite").parquet(path)
    return path
