"""Per-sequence matrix-profile / MASS / sliding-stat operators.

Spark-first design (SURVEY §2.3): one input row = one sequence, so these are
**mapInPandas** operators — zero shuffle, each Arrow batch processed
independently by a vectorized numpy kernel.  The reference's thread-chunked
diagonal scheme (stumpy/stump.py:252-506) maps to "one task per Arrow batch
of sequences"; its Dask scatter/gather (stumpy/stumped.py:13-203) maps to
Spark's own task scheduling — no driver-side collect anywhere.

Sequences longer than ``config.MAX_SEQ_LEN_PER_TASK`` go through the
chunked scale path in :mod:`stumpy_spark.plans.longseq` (overlapping
segments + seam merge); at the fixture scale (max 2048) every sequence is a
single kernel call.

Column contract: ``id_col`` (string), ``tokens_col`` (array<numeric>).
Outputs are exploded long-form ``(doc_id, i, ...)`` or per-sequence
summaries, both with explicit aliases so oracle SQL can mirror them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels

_PROFILE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("i", T.IntegerType()),
    T.StructField("P", T.ArrayType(T.DoubleType())),
    T.StructField("I", T.ArrayType(T.LongType())),
    T.StructField("IL", T.LongType()),
    T.StructField("IR", T.LongType()),
])

_SUMMARY_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("min_p", T.DoubleType()),
    T.StructField("max_p", T.DoubleType()),
    T.StructField("motif_i", T.LongType()),
    T.StructField("motif_j", T.LongType()),
])

_MASS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("min_d", T.DoubleType()),
    T.StructField("min_idx", T.LongType()),
    T.StructField("max_d", T.DoubleType()),
])

_SLIDING_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("sum_window_sums", T.LongType()),
    T.StructField("min_mean", T.DoubleType()),
    T.StructField("max_mean", T.DoubleType()),
    T.StructField("min_std", T.DoubleType()),
    T.StructField("max_std", T.DoubleType()),
])


def _seq_iter(batches: Iterator[pd.DataFrame], id_col: str, tokens_col: str):
    for pdf in batches:
        if len(pdf) == 0:
            continue
        yield pdf[id_col].to_numpy(), pdf[tokens_col].to_numpy()


def stump(df: DataFrame, m: int, k: int = 1, normalize: bool = True,
          p: float = 2.0, id_col: str = "doc_id",
          tokens_col: str = "tokens") -> DataFrame:
    """Self-join matrix profile per sequence, exploded long form.

    Semantics of stumpy/stump.py:513-753 (``ignore_trivial=True``) with the
    ``normalize=False`` reroute to the aamp kernel (core.py:72-152) folded
    in as a parameter.  Returns (doc_id, i, P[k], I[k], IL, IR).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for ids, seqs in _seq_iter(batches, id_col, tokens_col):
            out = []
            for did, toks in zip(ids, seqs):
                a = np.asarray(toks, dtype=np.float64)
                if len(a) < 2 * m:
                    continue
                if normalize:
                    P, I, IL, IR = kernels.matrix_profile(a, m, k=k)
                else:
                    P, I, IL, IR = kernels.matrix_profile_absolute(
                        a, m, p=p, k=k)
                l = P.shape[0]
                out.append(pd.DataFrame({
                    "doc_id": np.repeat(did, l),
                    "i": np.arange(l, dtype=np.int32),
                    "P": list(P),
                    "I": list(I),
                    "IL": IL,
                    "IR": IR,
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return df.select(id_col, tokens_col).mapInPandas(
        run, schema=_PROFILE_SCHEMA)


def profile_summary(df: DataFrame, m: int, normalize: bool = True,
                    p: float = 2.0, id_col: str = "doc_id",
                    tokens_col: str = "tokens") -> DataFrame:
    """Per-sequence matrix-profile summary: motif (min P) and discord (max
    finite P) with positions.  One output row per input sequence — the
    shape rollup tiers consume."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for ids, seqs in _seq_iter(batches, id_col, tokens_col):
            rows = []
            for did, toks in zip(ids, seqs):
                a = np.asarray(toks, dtype=np.float64)
                if len(a) < 2 * m:
                    continue
                if normalize:
                    P, I, _, _ = kernels.matrix_profile(
                        a, m, compute_left_right=False)
                else:
                    P, I, _, _ = kernels.matrix_profile_absolute(a, m, p=p)
                p0 = P[:, 0]
                finite = np.isfinite(p0)
                if not finite.any():
                    continue
                mi = int(np.argmin(np.where(finite, p0, np.inf)))
                ma = int(np.argmax(np.where(finite, p0, -np.inf)))
                rows.append((did, len(p0), float(p0[mi]), float(p0[ma]),
                             mi, int(I[mi, 0])))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "n_windows", "min_p", "max_p",
                    "motif_i", "motif_j"])

    return df.select(id_col, tokens_col).mapInPandas(
        run, schema=_SUMMARY_SCHEMA)


def aamp(df: DataFrame, m: int, p: float = 2.0, k: int = 1,
         id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Non-normalized matrix profile (stumpy/aamp.py:334-441)."""
    return stump(df, m, k=k, normalize=False, p=p,
                 id_col=id_col, tokens_col=tokens_col)


def mass(df: DataFrame, Q, normalize: bool = True, p: float = 2.0,
         id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Broadcast 1×N join: distance profile of one query vs every sequence.

    Semantics of core.py:1651-1833 (``mass``) / core.py:1369-1462
    (``mass_absolute``); the query rides in the UDF closure — the Spark
    analog of the reference's Dask ``scatter(broadcast=True)``
    (stumped.py:127-146).  Returns per-sequence (min_d, min_idx, max_d).
    """
    Qa = np.asarray(Q, dtype=np.float64)
    m = len(Qa)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for ids, seqs in _seq_iter(batches, id_col, tokens_col):
            rows = []
            for did, toks in zip(ids, seqs):
                a = np.asarray(toks, dtype=np.float64)
                if len(a) < m:
                    continue
                if normalize:
                    D = kernels.mass(Qa, a)
                else:
                    D = kernels.mass_absolute(Qa, a, p=p)
                finite = np.isfinite(D)
                if not finite.any():
                    continue
                j = int(np.argmin(np.where(finite, D, np.inf)))
                jm = int(np.argmax(np.where(finite, D, -np.inf)))
                rows.append((did, len(D), float(D[j]), j, float(D[jm])))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "n_windows", "min_d", "min_idx", "max_d"])

    return df.select(id_col, tokens_col).mapInPandas(run, schema=_MASS_SCHEMA)


def sliding_stats(df: DataFrame, m: int, id_col: str = "doc_id",
                  tokens_col: str = "tokens") -> DataFrame:
    """Sliding mean/std summary per sequence via the integer cumsum trick.

    Contract of core.py:1018-1100 (``compute_mean_std``) specialized to
    integer token streams: window sums are exact int64, so ``mean`` and the
    ``E[x^2]-E[x]^2`` variance are **bit-exact** against a SQL oracle that
    uses the same integer-sum formulation (see __spark_entry__.oracle_sql).

    Emits per-sequence: n_windows, sum of all window sums (int64, exact),
    min/max window mean, min/max window std.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for ids, seqs in _seq_iter(batches, id_col, tokens_col):
            rows = []
            for did, toks in zip(ids, seqs):
                t = np.asarray(toks, dtype=np.int64)
                n = len(t)
                if n < m:
                    continue
                cs = np.concatenate(([0], np.cumsum(t)))
                cs2 = np.concatenate(([0], np.cumsum(t * t)))
                ws = cs[m:] - cs[:-m]                # int64 exact
                ws2 = cs2[m:] - cs2[:-m]             # int64 exact
                mean = ws.astype(np.float64) / m
                var = ws2.astype(np.float64) / m - mean * mean
                np.maximum(var, 0.0, out=var)
                std = np.sqrt(var)
                rows.append((did, n - m + 1, int(ws.sum()),
                             float(mean.min()), float(mean.max()),
                             float(std.min()), float(std.max())))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "n_windows", "sum_window_sums",
                    "min_mean", "max_mean", "min_std", "max_std"])

    return df.select(id_col, tokens_col).mapInPandas(
        run, schema=_SLIDING_SCHEMA)
