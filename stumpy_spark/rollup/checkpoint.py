"""Per-partition checkpoints, lineage, and resume.

Long rollup jobs over 10^12 sequences must survive restarts without
recomputing finished work.  The unit of progress is an **input partition
slice** (here: a contiguous doc-id range; on a real Iceberg table: a file
scan task / partition).  After each slice is rolled up and committed, a
manifest row is appended:

    (job_id, slice_id, input_fingerprint, row_count, metrics_json, wall_sec,
     committed_at)

``input_fingerprint`` is a content hash of the slice's input keys (xxhash64
aggregated with bit-xor — order-insensitive, computed distributed), standing
in for the Iceberg snapshot-id + partition hash named in the north rule.
Resume = anti-join pending slices against committed slice_ids **for the same
fingerprint** — a changed input invalidates the checkpoint automatically.

The manifest itself is an append-only parquet directory (one file per
commit, atomic-rename semantics), i.e. the same shape as an Iceberg
manifest; swap `_append` for a MERGE on Iceberg in production.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType([
    T.StructField("job_id", T.StringType()),
    T.StructField("slice_id", T.LongType()),
    T.StructField("input_fingerprint", T.LongType()),
    T.StructField("row_count", T.LongType()),
    T.StructField("metrics", T.StringType()),
    T.StructField("wall_sec", T.DoubleType()),
    T.StructField("committed_at", T.DoubleType()),
])


@dataclass
class Manifest:
    path: str

    def _dir(self) -> Path:
        p = Path(self.path)
        p.mkdir(parents=True, exist_ok=True)
        return p

    def append(self, spark: SparkSession, job_id: str, slice_id: int,
               fingerprint: int, row_count: int, metrics: dict,
               wall_sec: float) -> None:
        row = [(job_id, slice_id, fingerprint, row_count,
                json.dumps(metrics, sort_keys=True), wall_sec, time.time())]
        df = spark.createDataFrame(row, MANIFEST_SCHEMA)
        out = self._dir() / f"commit-{uuid.uuid4().hex}"
        df.coalesce(1).write.mode("overwrite").parquet(str(out))

    def read(self, spark: SparkSession) -> DataFrame:
        d = self._dir()
        parts = [str(p) for p in d.glob("commit-*")]
        if not parts:
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        return spark.read.parquet(*parts)

    def completed_slices(self, spark: SparkSession, job_id: str) -> DataFrame:
        return (self.read(spark)
                .where(F.col("job_id") == job_id)
                .select("slice_id", "input_fingerprint")
                .distinct())


def slice_fingerprint(df: DataFrame, key_col: str = "doc_id") -> int:
    """Order-insensitive content hash of a slice's input keys.

    Distributed: xxhash64 per row, bit-xor aggregated — no collect of data,
    one scalar back to the driver.
    """
    row = df.select(
        F.bit_xor(F.xxhash64(F.col(key_col))).alias("fp")).first()
    return int(row.fp) if row.fp is not None else 0


def pending_slices(spark: SparkSession, manifest: Manifest, job_id: str,
                   all_slices: list[int],
                   fingerprints: dict[int, int]) -> list[int]:
    """Slices still to run: not committed, or committed with a different
    input fingerprint (stale checkpoint)."""
    done = {(r.slice_id, r.input_fingerprint)
            for r in manifest.completed_slices(spark, job_id).collect()}
    return [s for s in all_slices
            if (s, fingerprints.get(s)) not in done]


def run_with_checkpoints(spark: SparkSession, manifest: Manifest,
                         job_id: str, slices: dict[int, DataFrame],
                         process, key_col: str = "doc_id") -> list[int]:
    """Run `process(slice_id, slice_df) -> (row_count, metrics)` per
    pending slice, committing a manifest row after each.  Returns slices
    actually run.

    ``process`` receives the slice id so its writes can target a
    deterministic slice-keyed location with overwrite semantics: a crash
    between the data write and the manifest commit then makes the re-run
    idempotent (the slice directory is simply rewritten) instead of
    silently appending duplicate rows.
    """
    fingerprints = {s: slice_fingerprint(df, key_col)
                    for s, df in slices.items()}
    todo = pending_slices(spark, manifest, job_id, sorted(slices),
                          fingerprints)
    for s in todo:
        t0 = time.time()
        row_count, metrics = process(s, slices[s])
        manifest.append(spark, job_id, s, fingerprints[s], row_count,
                        metrics, time.time() - t0)
    return todo
