"""Distributed matrix profile for a single long sequence.

The scale path for series too long for one task (> config.MAX_SEQ_LEN_PER
_TASK) — the Spark restatement of the reference's distributed plans
(stumpy/stumped.py:13-203 z-norm, stumpy/aamped.py:334-441 p-norm):
*scatter* the series + stats once (``sc.broadcast``), split the
distance-matrix workload into **tiles**, and reduce partial per-row
results with a commutative merge (Catalyst partial/final aggregation).

Differences from the reference's decomposition, on purpose:

- the reference chunks *diagonals* weighted by per-diagonal work
  (core.py:2424-2466 ``_get_array_ranges``); a Spark stage wants
  coarse-grained independent tasks, so we tile the (row, col) index plane.
  Upper-triangle tiles are enumerated only once and each tile emits
  contributions for both its row range and its col range (the symmetric
  update the reference does per diagonal cell, stump.py:219-230).
- tile size bounds per-task memory (tile_rows × tile_cols doubles);
  AQE coalesces the small final merge.

Top-k (``k > 1``): each tile emits its per-row k smallest (p, j)
candidates; because the tiles partition the column space for any row, a
(i, j) cell is produced exactly once, so the global top-k is simply the k
smallest candidates per row — an ``array_sort`` + ``slice`` over the
collected partials (the Catalyst form of the reference's
``core._merge_topk_PI``, core.py:3325-3394 / stumped.py:184-197; ties
break to the smaller j, deterministic under any merge order).

The shuffle is O(l × n_col_tiles × k) small rows; for very long series
raise ``tile`` accordingly (tile 65536 → 153 partials per row at n=10^7).
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

_PARTIAL_SCHEMA_TOPK = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("p", T.DoubleType()),
    T.StructField("j", T.LongType()),
])


def distributed_matrix_profile(spark: SparkSession, T_arr, m: int,
                               tile: int = 8192, T_B=None, k: int = 1,
                               normalize: bool = True,
                               p: float = 2.0) -> DataFrame:
    """Exact matrix profile of one long series, tiled across the cluster.

    Self-join when ``T_B is None`` (with exclusion zone and, for k == 1,
    left/right profiles), AB-join otherwise (``ignore_trivial=False``
    semantics: no exclusion, PL/PR = inf and IL/IR = -1, matching
    ``kernels.matrix_profile``).  ``normalize=False`` computes the p-norm
    (aamp/aamped) profile instead — same tiling, non-normalized distances.

    Returns DataFrame (i, P, I, PL, IL, PR, IR) for k == 1, else
    (i, P: array<double>, I: array<long>) with rows sorted ascending by
    distance (ties to the smaller index).
    """
    T_arr = np.asarray(T_arr, dtype=np.float64)
    self_join = T_B is None
    n = len(T_arr)
    l = n - m + 1
    ez = kernels.excl_zone(m) if self_join else -1

    if normalize:
        prepA = kernels.preprocess(T_arr, m)
        prepB = prepA if self_join else kernels.preprocess(
            np.asarray(T_B, dtype=np.float64), m)
    else:
        # aamp preprocessing (aamp.py:38-55): finite mask + nan_to_num;
        # window square-sums for the p == 2 GEMM expansion
        def prep_abs(X):
            fin = kernels.rolling_isfinite(X, m)
            Xc = np.nan_to_num(X)
            cs = np.concatenate(([0.0], np.cumsum(Xc * Xc)))
            return Xc, cs[m:] - cs[:-m], None, fin, None
        prepA = prep_abs(T_arr)
        prepB = prepA if self_join else prep_abs(
            np.asarray(T_B, dtype=np.float64))
    lb = len(prepB[3])
    sc = spark.sparkContext
    b = sc.broadcast((prepA, prepB, self_join))

    n_tiles = (l + tile - 1) // tile
    nb_tiles = (lb + tile - 1) // tile
    if self_join:
        tiles = [(r, c) for r in range(n_tiles)
                 for c in range(r, n_tiles)]
    else:
        tiles = [(r, c) for r in range(n_tiles) for c in range(nb_tiles)]

    # weighted work assignment (the Spark analog of the reference's
    # per-diagonal work weighting, core.py:2424-2466): tile work = actual
    # cell count (remainder tiles are smaller; diagonal-crossing tiles
    # lose the excluded band), greedily LPT-binned so every stage
    # partition carries near-equal work — no straggler tail at 100x
    def _work(r, c):
        h = min(tile, l - r * tile)
        w = min(tile, lb - c * tile)
        cells = h * w
        if self_join and r == c:
            cells = max(cells // 2, 1)          # upper-triangle + excl band
        return cells

    n_bins = min(len(tiles), spark.sparkContext.defaultParallelism * 4)
    order = sorted(range(len(tiles)),
                   key=lambda t: -_work(*tiles[t]))
    import heapq
    heap = [(0, bi) for bi in range(n_bins)]
    heapq.heapify(heap)
    bins = [0] * len(tiles)
    for t in order:
        load, bi = heapq.heappop(heap)
        bins[t] = bi
        heapq.heappush(heap, (load + _work(*tiles[t]), bi))
    # identity partitioner: bin b -> Spark partition b, exactly (a hash
    # repartition would collide balanced bins into uneven partitions)
    pairs = sc.parallelize(
        [(bins[t], tiles[t]) for t in range(len(tiles))], n_bins)
    binned = pairs.partitionBy(n_bins, lambda b: b).map(
        lambda kv: (int(kv[1][0]), int(kv[1][1])))
    tiles_df = spark.createDataFrame(binned, schema="tr long, tc long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        (Ta, mu, sig, fin, con), (Tb2, mub, sigb, finb, conb), sj = b.value
        windows = np.lib.stride_tricks.sliding_window_view(Ta, m)
        windows_B = windows if sj else \
            np.lib.stride_tricks.sliding_window_view(Tb2, m)

        def block_znorm(r0, r1, c0, c1):
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
            return np.sqrt(D2)

        def block_pnorm(r0, r1, c0, c1):
            # mu/mub carry the window square-sums in the p-norm prep
            if p == 2.0:
                QT = windows[r0:r1] @ windows_B[c0:c1].T
                D2 = mu[r0:r1][:, None] - 2.0 * QT + mub[c0:c1][None, :]
                np.maximum(D2, 0.0, out=D2)
                # GEMM expansion cancels catastrophically for near-dup
                # pairs; recompute those few entries directly (exact),
                # mirroring kernels.matrix_profile_absolute
                scale = mu[r0:r1][:, None] + mub[c0:c1][None, :]
                suspect = D2 <= 1e-8 * scale
                if suspect.any():
                    si, sjx = np.nonzero(suspect)
                    diff = windows[r0 + si] - windows_B[c0 + sjx]
                    D2[si, sjx] = np.einsum("ij,ij->i", diff, diff)
                D = np.sqrt(D2)
            else:
                acc = np.zeros((r1 - r0, c1 - c0))
                for o in range(m):
                    acc += np.abs(Ta[r0 + o:r1 + o, None]
                                  - Tb2[None, c0 + o:c1 + o]) ** p
                D = acc ** (1.0 / p)
            D[~fin[r0:r1], :] = np.inf
            D[:, ~finb[c0:c1]] = np.inf
            return D

        block_fn = block_znorm if normalize else block_pnorm

        def block(r0, r1, c0, c1):
            D = block_fn(r0, r1, c0, c1)
            if sj:
                rows = np.arange(r0, r1)[:, None]
                cols = np.arange(c0, c1)[None, :]
                D[np.abs(cols - rows) <= ez] = np.inf
            return D

        def partials(D, i0, j0):
            """Per-row top-1 + left/right (self-join) from a tile block."""
            nr = D.shape[0]
            idx = np.arange(D.shape[1]) + j0
            jmin = np.argmin(D, axis=1)
            r = np.arange(nr)
            pv = D[r, jmin]
            jabs = idx[jmin]
            rows_abs = np.arange(i0, i0 + nr)
            out = {
                "i": rows_abs, "p": pv,
                "j": np.where(np.isfinite(pv), jabs, -1),
            }
            if sj:
                left_mask = idx[None, :] < rows_abs[:, None]
                DL = np.where(left_mask, D, np.inf)
                DR = np.where(~left_mask, D, np.inf)
                jl = np.argmin(DL, axis=1)
                jr = np.argmin(DR, axis=1)
                pl = DL[r, jl]
                pr = DR[r, jr]
                out.update({
                    "pl": pl,
                    "jl": np.where(np.isfinite(pl), idx[jl], -1),
                    "pr": pr,
                    "jr": np.where(np.isfinite(pr), idx[jr], -1),
                })
            else:
                # ignore_trivial=False contract: left/right profiles are
                # meaningless for AB-joins — report inf / -1
                out.update({
                    "pl": np.full(nr, np.inf),
                    "jl": np.full(nr, -1, dtype=np.int64),
                    "pr": np.full(nr, np.inf),
                    "jr": np.full(nr, -1, dtype=np.int64),
                })
            return pd.DataFrame(out)

        def partials_topk(D, i0, j0):
            """Per-row k smallest (p, j) candidates from a tile block."""
            nr, nc = D.shape
            kk = min(k, nc)
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            r = np.arange(nr)[:, None]
            vals = D[r, part]
            rows_abs = np.repeat(np.arange(i0, i0 + nr), kk)
            jabs = (part + j0).ravel()
            pv = vals.ravel()
            return pd.DataFrame({
                "i": rows_abs, "p": pv,
                "j": np.where(np.isfinite(pv), jabs, -1),
            })

        emit = partials_topk if k > 1 else partials
        for pdf in batches:
            out = []
            for tr, tc in zip(pdf["tr"], pdf["tc"]):
                r0, r1 = tr * tile, min((tr + 1) * tile, l)
                c0, c1 = tc * tile, min((tc + 1) * tile, lb)
                D = block(r0, r1, c0, c1)
                out.append(emit(D, r0, c0))
                if sj and tr != tc:
                    out.append(emit(np.ascontiguousarray(D.T), c0, r0))
            if out:
                yield pd.concat(out, ignore_index=True)

    if k > 1:
        partial = tiles_df.mapInPandas(run, schema=_PARTIAL_SCHEMA_TOPK)
        # global top-k per row: every (i, j) candidate is emitted exactly
        # once, so sort + slice is the complete merge (ties -> smaller j)
        pad = F.array_repeat(
            F.struct(F.lit(float("inf")).alias("p"),
                     F.lit(-1).cast("long").alias("j")), k)
        topk = (partial.groupBy("i")
                .agg(F.slice(F.concat(F.array_sort(F.collect_list(
                    F.struct("p", "j"))), pad), 1, k).alias("_tk")))
        return topk.select(
            "i",
            F.transform("_tk", lambda x: x["p"]).alias("P"),
            F.transform("_tk", lambda x: F.when(
                x["p"] != float("inf"), x["j"]).otherwise(F.lit(-1)))
            .alias("I"))

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
