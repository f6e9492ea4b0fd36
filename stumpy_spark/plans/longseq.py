"""Distributed matrix profile for a single long sequence.

The scale path for series too long for one task (> config.MAX_SEQ_LEN_PER
_TASK) — the Spark restatement of the reference's distributed plan
(stumpy/stumped.py:13-203): *scatter* the series + stats once
(``sc.broadcast``), split the distance-matrix workload into **tiles**, and
reduce partial per-row minima with a commutative merge (`groupBy(i)` +
``min_by`` — Catalyst's partial/final aggregation).

Differences from the reference's decomposition, on purpose:

- the reference chunks *diagonals* weighted by per-diagonal work
  (core.py:2424-2466 ``_get_array_ranges``); a Spark stage wants
  coarse-grained independent tasks, so we tile the (row, col) index plane.
  Upper-triangle tiles are enumerated only once and each tile emits
  contributions for both its row range and its col range (the symmetric
  update the reference does per diagonal cell, stump.py:219-230).
- tile size bounds per-task memory (tile_rows × tile_cols doubles);
  AQE coalesces the small final merge.

The shuffle is O(l × n_col_tiles) small rows — for n = 10^7 and 8192-wide
tiles that's ~10^7 × 1221 … no: each row index i receives one partial row
per *tile-row it appears in* (n_col_tiles per row band), so the merge input
is l × (n / tile) rows of 40 bytes; for very long series raise ``tile``
accordingly (tile 65536 → 153 partials per row at n=10^7).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("p", T.DoubleType()),
    T.StructField("j", T.LongType()),
    T.StructField("pl", T.DoubleType()),
    T.StructField("jl", T.LongType()),
    T.StructField("pr", T.DoubleType()),
    T.StructField("jr", T.LongType()),
])


def distributed_matrix_profile(spark: SparkSession, T_arr, m: int,
                               tile: int = 8192,
                               T_B=None) -> DataFrame:
    """Exact top-1 matrix profile of one long series, tiled across the
    cluster.  Self-join when ``T_B is None`` (with exclusion zone and
    left/right profiles), AB-join otherwise (``ignore_trivial=False``
    semantics: no exclusion, IL/IR reported as -1).
    Returns DataFrame (i, P, I, PL, IL, PR, IR)."""
    T_arr = np.asarray(T_arr, dtype=np.float64)
    self_join = T_B is None
    n = len(T_arr)
    l = n - m + 1
    ez = kernels.excl_zone(m) if self_join else -1

    Tc, M_T, Sigma_T, isfinite_w, isconstant = kernels.preprocess(T_arr, m)
    if self_join:
        prepB = (Tc, M_T, Sigma_T, isfinite_w, isconstant)
        lb = l
    else:
        prepB = kernels.preprocess(np.asarray(T_B, dtype=np.float64), m)
        lb = len(prepB[1])
    sc = spark.sparkContext
    b = sc.broadcast(((Tc, M_T, Sigma_T, isfinite_w, isconstant), prepB,
                      self_join))

    n_tiles = (l + tile - 1) // tile
    nb_tiles = (lb + tile - 1) // tile
    if self_join:
        tiles = [(r, c) for r in range(n_tiles)
                 for c in range(r, n_tiles)]
    else:
        tiles = [(r, c) for r in range(n_tiles) for c in range(nb_tiles)]
    tiles_df = spark.createDataFrame(
        pd.DataFrame(tiles, columns=["tr", "tc"]))
    # spread tiles across the cluster; tile count >> cores keeps AQE happy
    tiles_df = tiles_df.repartition(
        min(len(tiles), spark.sparkContext.defaultParallelism * 4))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        (Ta, mu, sig, fin, con), (Tb2, mub, sigb, finb, conb), sj = b.value
        windows = np.lib.stride_tricks.sliding_window_view(Ta, m)
        windows_B = windows if sj else \
            np.lib.stride_tricks.sliding_window_view(Tb2, m)

        def block(r0, r1, c0, c1):
            rho = kernels._pearson_block(
                windows[r0:r1], windows_B[c0:c1],
                mu[r0:r1], sig[r0:r1], mub[c0:c1], sigb[c0:c1], m)
            D2 = np.abs(2.0 * m * (1.0 - rho))
            ca = con[r0:r1][:, None]
            cb = conb[c0:c1][None, :]
            D2 = np.where(ca & cb, 0.0, D2)
            D2 = np.where(ca ^ cb, float(m), D2)
            D2[~fin[r0:r1], :] = np.inf
            D2[:, ~finb[c0:c1]] = np.inf
            D2 = kernels.snap_to_zero(D2)
            D = np.sqrt(D2)
            if sj:
                rows = np.arange(r0, r1)[:, None]
                cols = np.arange(c0, c1)[None, :]
                D[np.abs(cols - rows) <= ez] = np.inf
            return D

        def partials(D, i0, axis_rows, j0):
            """Per-row top-1 + left/right from a tile block."""
            nr = D.shape[0]
            idx = np.arange(D.shape[1]) + j0
            jmin = np.argmin(D, axis=1)
            r = np.arange(nr)
            p = D[r, jmin]
            jabs = idx[jmin]
            rows_abs = np.arange(i0, i0 + nr)
            left_mask = idx[None, :] < rows_abs[:, None]
            DL = np.where(left_mask, D, np.inf)
            DR = np.where(~left_mask, D, np.inf)
            jl = np.argmin(DL, axis=1)
            jr = np.argmin(DR, axis=1)
            pl = DL[r, jl]
            pr = DR[r, jr]
            return pd.DataFrame({
                "i": rows_abs, "p": p,
                "j": np.where(np.isfinite(p), jabs, -1),
                "pl": pl, "jl": np.where(np.isfinite(pl), idx[jl], -1),
                "pr": pr, "jr": np.where(np.isfinite(pr), idx[jr], -1),
            })

        for pdf in batches:
            out = []
            for tr, tc in zip(pdf["tr"], pdf["tc"]):
                r0, r1 = tr * tile, min((tr + 1) * tile, l)
                c0, c1 = tc * tile, min((tc + 1) * tile, lb)
                D = block(r0, r1, c0, c1)
                out.append(partials(D, r0, True, c0))
                if sj and tr != tc:
                    out.append(partials(D.T, c0, False, r0))
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = tiles_df.mapInPandas(run, schema=_PARTIAL_SCHEMA)
    # final commutative merge (the reference's gather + _merge_topk_PI,
    # stumped.py:181-197, as a Catalyst aggregation)
    return (partial.groupBy("i").agg(
        F.min("p").alias("P"),
        F.min_by("j", F.struct(F.col("p"), F.col("j"))).alias("I"),
        F.min("pl").alias("PL"),
        F.min_by("jl", F.struct(F.col("pl"), F.col("jl"))).alias("IL"),
        F.min("pr").alias("PR"),
        F.min_by("jr", F.struct(F.col("pr"), F.col("jr"))).alias("IR"),
    ))
