"""Deterministic synthetic `tokseq` base table (FIXTURES.md F1).

Schema (the BASELINE.json ``input_hint`` shape, exactly):
``doc_id:string, tokens:array<int32>, n_tok:int32, source:string`` plus a
derived ``event_ts:timestamp`` time axis for rollups.

Generation is **distributed and partition-invariant**: row ``i`` is produced
from a counter-based Philox stream keyed by ``(seed, i)``, so any executor
produces identical bytes for the same row id regardless of how
``spark.range`` splits the id space.  This is the property that lets the
10^12-row version of this table be generated (or re-generated for resume)
on a 1000-executor cluster with no coordination.

Mirrors the reference's seeded-fixture methodology
(/root/reference/tests/test_stump.py:12-24) at table scale.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB = 50257
LEN_MIN, LEN_MAX = 8, 2048
SOURCES = ["web", "books", "code", "wiki", "chat", "news", "forum", "paper"]
ZIPF_ALPHA = 1.5
WEEK_SECONDS = 7 * 24 * 3600
EPOCH = np.datetime64("2025-01-01T00:00:00")

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("event_ts", T.TimestampType(), False),
])

# zipf-skewed source probabilities: p_k ∝ 1/k^alpha → `web` is the hot key
_ranks = np.arange(1, len(SOURCES) + 1, dtype=np.float64)
_probs = (1.0 / _ranks ** ZIPF_ALPHA)
_probs /= _probs.sum()
_CUM_PROBS = np.cumsum(_probs)


def _gen_rows(ids: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Generate tokseq rows for the given doc ids (pure numpy)."""
    n = len(ids)
    doc_id = np.array([f"doc{i:08d}" for i in ids])
    lengths = np.empty(n, dtype=np.int64)
    tokens = []
    ts_off = np.empty(n, dtype=np.int64)
    src_idx = np.empty(n, dtype=np.int64)
    log_lo, log_hi = math.log(LEN_MIN), math.log(LEN_MAX)
    for j, i in enumerate(ids):
        g = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
        L = min(int(math.exp(g.uniform(log_lo, log_hi))), LEN_MAX)
        lengths[j] = L
        tokens.append(g.integers(0, VOCAB, size=L, dtype=np.int32))
        src_idx[j] = int(np.searchsorted(_CUM_PROBS, g.uniform()))
        ts_off[j] = int(g.integers(0, WEEK_SECONDS))
    return pd.DataFrame({
        "doc_id": doc_id,
        "tokens": tokens,
        "n_tok": lengths.astype(np.int32),
        "source": np.array(SOURCES, dtype=object)[src_idx],
        "event_ts": EPOCH + ts_off.astype("timedelta64[s]"),
    })


def tokseq_df(spark: SparkSession, n_docs: int, seed: int = SEED,
              partitions: int | None = None) -> DataFrame:
    """Distributed deterministic tokseq DataFrame of ``n_docs`` rows."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # bound each emitted Arrow batch
            for s in range(0, len(ids), 2048):
                yield _gen_rows(ids[s:s + 2048], seed)

    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(gen, schema=TOKSEQ_SCHEMA))


# -- fixture materialization (small scales, for tests / driver oracles) -----

_SF_DOCS = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 200_000,
            "scaling": 400_000, "sf1": 2_000_000}
FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".fixtures")


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def n_docs_for(sf_dir: str) -> int:
    return _SF_DOCS.get(sf_name(sf_dir), 10_000)


def tokseq_path(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, f"tokseq_{sf_name(sf_dir)}")


def ensure_tokseq(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the tokseq fixture parquet for a scale dir (idempotent)."""
    path = tokseq_path(sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (tokseq_df(spark, n_docs_for(sf_dir))
         .write.mode("overwrite").parquet(path))
    return path


def read_tokseq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_tokseq(spark, sf_dir))
