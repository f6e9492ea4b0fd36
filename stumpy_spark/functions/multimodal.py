"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures, and the metadata fast path — and so is decode for three
formats via :mod:`stumpy_spark.functions.codecs`: **PNG** (pure-stdlib
zlib inflate + unfilter), **WAV** (PCM16), and **y4m video**
(YUV4MPEG2 uncompressed-frame container, mono).  Compressed video
containers (mp4 etc.) have no codec in this container and stay a
documented ``decode_ok=False`` data path; ``fake=True`` substitutes a
deterministic content-hash-seeded fake decoder so the downstream feature
pipeline is testable for unsupported formats too.

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

# Fixture schema = MEDIA_SCHEMA + pre-encode ground truth (null for the
# opaque video stub): lets an oracle verify the decoders end-to-end —
# decode(blob) must reproduce sums computed on the raw pixels/samples
# BEFORE they were encoded.  For video/y4m, `n_frames`/`frame_px_sums`
# carry the per-frame luma-sum truth and `px_sum` the total.
FIXTURE_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields + [
        T.StructField("px_sum", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_px_sums", T.ArrayType(T.LongType())),
    ])

_DECODE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("dec_width", T.IntegerType()),
    T.StructField("dec_height", T.IntegerType()),
    T.StructField("dec_px_sum", T.LongType()),
    T.StructField("dec_n_samples", T.LongType()),
    T.StructField("dec_sample_sum", T.LongType()),
    T.StructField("dec_n_frames", T.LongType()),
    T.StructField("decode_ok", T.BooleanType()),
])

_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_px_sum", T.LongType()),
])

_Y4M_FPS = 4  # fixture fps: 250 ms per frame, integer ms timestamps


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

    Real decode for ``image/png`` (zlib inflate + unfilter → 8×8
    mean-pooled greyscale) and ``audio/wav`` (PCM16 → 64-bin amplitude
    envelope); other formats (video) have no codec in this container and
    yield ``decode_ok=False`` — unless ``fake=True``, which substitutes
    the deterministic content-hash fake for every row.
    """
    from stumpy_spark.functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            ok = []
            for mime, blob in zip(pdf["mime"], pdf["blob"]):
                if fake:
                    feats.append(_fake_decode(bytes(blob), dim))
                    ok.append(True)
                    continue
                try:
                    if mime == "image/png":
                        feats.append(codecs.image_feature(
                            codecs.png_decode(bytes(blob))))
                        ok.append(True)
                    elif mime == "audio/wav":
                        samples, _ = codecs.wav_decode(bytes(blob))
                        feats.append(codecs.audio_feature(samples))
                        ok.append(True)
                    elif mime == "video/y4m":
                        frames, _ = codecs.y4m_decode(bytes(blob))
                        # temporal mean frame -> spatial 8x8 pooling
                        feats.append(codecs.image_feature(
                            frames.mean(axis=0)))
                        ok.append(True)
                    else:  # no codec for compressed video containers
                        feats.append(None)
                        ok.append(False)
                except Exception:  # malformed blob → not decodable
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "feature": feats,
                "decode_ok": ok,
            })

    return df.select("media_id", "mime", "blob").mapInPandas(
        run, schema=_FEATURE_SCHEMA)


def decode_meta(df: DataFrame) -> DataFrame:
    """Decode blobs and emit verifiable facts about the decoded content:
    image dims + pixel sum, audio sample count + sample sum.

    This is the oracle surface for the real codecs: the media fixture
    stores the same quantities computed on the raw arrays *before*
    encoding, so ``decode_meta(fixture) == stored truth`` proves the full
    encode→parquet→decode path bit-exact.  ``video/y4m`` decodes for real
    (frame dims, frame count, total luma sum); compressed containers
    (``video/mp4``) have no codec here and come back ``decode_ok=False``
    with null facts.
    """
    from stumpy_spark.functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, blob in zip(pdf["media_id"], pdf["mime"],
                                       pdf["blob"]):
                w = h = pxs = ns = ss = nf = None
                ok = False
                try:
                    if mime == "image/png":
                        arr = codecs.png_decode(bytes(blob))
                        h, w = int(arr.shape[0]), int(arr.shape[1])
                        pxs = int(arr.astype(np.int64).sum())
                        ok = True
                    elif mime == "audio/wav":
                        samples, _ = codecs.wav_decode(bytes(blob))
                        ns = int(len(samples))
                        ss = int(samples.astype(np.int64).sum())
                        ok = True
                    elif mime == "video/y4m":
                        frames, _ = codecs.y4m_decode(bytes(blob))
                        nf = int(frames.shape[0])
                        h, w = int(frames.shape[1]), int(frames.shape[2])
                        pxs = int(frames.astype(np.int64).sum())
                        ok = True
                except Exception:  # malformed blob → not decodable
                    ok = False
                rows.append((mid, mime, w, h, pxs, ns, ss, nf, ok))
            yield pd.DataFrame(rows, columns=[
                "media_id", "mime", "dec_width", "dec_height",
                "dec_px_sum", "dec_n_samples", "dec_sample_sum",
                "dec_n_frames", "decode_ok"])

    return df.select("media_id", "mime", "blob").mapInPandas(
        run, schema=_DECODE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    (media_id, frame_ts_ms) rows from *metadata only* — the blob column is
    pruned from this scan entirely; :func:`extract_frames` is the real
    decode stage over the same timestamp grid."""
    return (df.where(F.col("mime").startswith("video/"))
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def extract_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling for ``video/y4m`` rows: decode the y4m stream
    and emit one row per sampled timestamp (the same grid as
    :func:`frame_sample_plan`) with the frame's luma sum — the verifiable
    per-frame fact the fixture stores pre-encode.

    Each blob is decoded exactly once per row (never once per timestamp
    — no blob-to-timestamp join), inside ``mapInPandas`` Arrow batches;
    at 100 TB the work is embarrassingly parallel per video and the
    output carries no binary columns.
    """
    from stumpy_spark.functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, tss, idxs, sums = [], [], [], []
            for mid, dur, blob in zip(pdf["media_id"], pdf["duration_ms"],
                                      pdf["blob"]):
                try:
                    frames, fps = codecs.y4m_decode(bytes(blob))
                except Exception:  # corrupt stream → contributes no rows
                    continue
                fsums = frames.astype(np.int64).sum(axis=(1, 2))
                nf = len(fsums)
                for ts in range(0, max(int(dur), 1), every_ms):
                    idx = min(ts * fps // 1000, nf - 1)
                    if idx < 0:
                        continue
                    mids.append(mid)
                    tss.append(ts)
                    idxs.append(idx)
                    sums.append(int(fsums[idx]))
            yield pd.DataFrame({
                "media_id": mids,
                "frame_ts_ms": np.asarray(tss, dtype=np.int64),
                "frame_idx": np.asarray(idxs, dtype=np.int64),
                "frame_px_sum": np.asarray(sums, dtype=np.int64),
            })

    return (df.where(F.col("mime") == "video/y4m")
            .select("media_id", "duration_ms", "blob")
            .mapInPandas(run, schema=_FRAME_SCHEMA))


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  fake: bool = False) -> DataFrame:
    """Resize image rows for real: PNG-decode → nearest-neighbour resample
    → PNG-re-encode, width/height/n_bytes rewritten to the result.

    ``fake=True`` keeps the old deterministic content-hash-seeded blob
    (for tests of the plumbing alone).  The real path only handles
    ``image/png`` (the one image codec in this container); other image
    mimes are filtered out before the scan, and a corrupt PNG passes
    through UNCHANGED rather than failing the whole Arrow batch.
    """
    from stumpy_spark.functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, widths, heights = [], [], []
            for blob, w0, h0 in zip(pdf["blob"], pdf["width"],
                                    pdf["height"]):
                if not fake:
                    try:
                        arr = codecs.png_decode(bytes(blob))
                        blobs.append(bytearray(codecs.png_encode(
                            codecs.resize_nearest(arr, out_w, out_h))))
                        widths.append(out_w)
                        heights.append(out_h)
                    except Exception:  # corrupt blob → pass through
                        blobs.append(blob)
                        widths.append(w0)
                        heights.append(h0)
                    continue
                h = hashlib.sha256(bytes(blob)).digest()
                seed = int.from_bytes(h[:8], "little") % (2 ** 32)
                rs = np.random.RandomState(seed)
                blobs.append(bytearray(
                    rs.bytes(max(out_w * out_h // 64, 16))))
                widths.append(out_w)
                heights.append(out_h)
            out = pdf.copy()
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["blob"] = blobs
            out["n_bytes"] = np.asarray([len(b) for b in blobs],
                                        dtype=np.int64)
            yield out

    mime_pred = (F.col("mime") == "image/png") if not fake else \
        F.col("mime").startswith("image/")
    imgs = df.where(mime_pred).select(
        *[f.name for f in MEDIA_SCHEMA.fields])
    return imgs.mapInPandas(run, schema=MEDIA_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate: never touches the binary column."""
    return (df.groupBy("mime")
            .agg(F.count("*").alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.avg("duration_ms").alias("avg_duration_ms")))


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: REAL PNG, WAV and
    y4m-video blobs (decodable by any conforming decoder) plus an opaque
    compressed-video stub, with pre-encode ground truth (px_sum /
    n_samples / sample_sum / frame_px_sums) stored alongside so decode
    can be oracle-verified end-to-end."""
    from stumpy_spark.functions import codecs
    rs = np.random.RandomState(seed)
    rows = []
    mimes = ["image/png", "audio/wav", "video/y4m", "video/mp4"]
    for i in range(n):
        mime = mimes[i % 4]
        width = height = duration = px_sum = None
        n_samples = sample_sum = n_frames = frame_px_sums = None
        if mime == "image/png":
            height = int(rs.randint(8, 48))
            width = int(rs.randint(8, 48))
            channels = int(rs.choice([1, 3, 4]))
            arr = rs.randint(0, 256, size=(height, width, channels)
                             ).astype(np.uint8)
            if channels == 1:
                arr = arr[:, :, 0]
            px_sum = int(arr.astype(np.int64).sum())
            blob = codecs.png_encode(arr)
        elif mime == "audio/wav":
            rate = 16000
            duration = int(rs.randint(50, 2000))
            n_samples = duration * rate // 1000
            samples = rs.randint(-32768, 32768, n_samples
                                 ).astype(np.int16)
            sample_sum = int(samples.astype(np.int64).sum())
            blob = codecs.wav_encode(samples, rate)
        elif mime == "video/y4m":  # REAL uncompressed-frame container
            height = int(rs.randint(8, 32))
            width = int(rs.randint(8, 32))
            n_frames = int(rs.randint(8, 40))
            frames = rs.randint(0, 256, size=(n_frames, height, width)
                                ).astype(np.uint8)
            sums = frames.astype(np.int64).sum(axis=(1, 2))
            frame_px_sums = [int(s) for s in sums]
            px_sum = int(sums.sum())
            duration = n_frames * 1000 // _Y4M_FPS
            blob = codecs.y4m_encode(frames, fps=_Y4M_FPS)
        else:  # opaque stub — no compressed-container codec here
            width = int(rs.randint(16, 1024))
            height = int(rs.randint(16, 1024))
            duration = int(rs.randint(1000, 60000))
            blob = rs.bytes(int(rs.randint(64, 512)))
        rows.append((
            f"media{i:06d}", mime, width, height, duration,
            len(blob), bytearray(blob), px_sum, n_samples, sample_sum,
            n_frames, frame_px_sums))
    pdf = pd.DataFrame(rows, columns=[
        "media_id", "mime", "width", "height", "duration_ms", "n_bytes",
        "blob", "px_sum", "n_samples", "sample_sum", "n_frames",
        "frame_px_sums"])
    # pandas upcasts int+None object columns to float64, which Spark's
    # IntegerType verifier rejects — use nullable extension dtypes
    for c in ("width", "height", "duration_ms"):
        pdf[c] = pd.array(pdf[c].to_numpy(dtype=object), dtype="Int32")
    for c in ("px_sum", "n_samples", "sample_sum", "n_frames"):
        pdf[c] = pd.array(pdf[c].to_numpy(dtype=object), dtype="Int64")
    pdf["n_bytes"] = pdf["n_bytes"].astype("int64")
    return spark.createDataFrame(pdf, schema=FIXTURE_SCHEMA)


def media_fixture_path(n: int = 300) -> str:
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".fixtures")
    # v3: adds real video/y4m blobs + per-frame ground truth
    return os.path.join(root, f"media_{n}_v3")


def ensure_media_fixture(spark, n: int = 300, seed: int = 42) -> str:
    """Materialize the synthetic media table as parquet (idempotent) so the
    DuckDB oracle can recompute media_stats from the same bytes."""
    import os
    path = media_fixture_path(n)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synthetic_media_df(spark, n, seed).write.mode(
            "overwrite").parquet(path)
    return path
