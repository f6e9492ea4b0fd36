"""Streaming parity tests (reference methodology: incremental updates must
equal the incremental oracle after every append — tests/test_stumpi.py
analog)."""

import os

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import naive_oracle as naive
from stumpy_spark.streaming.stumpi import StumpiState, stumpi_stream

PRECISION = 5


class NaiveStumpiEgress:
    """Brute-force incremental oracle (same contract as the reference's
    tests/naive.py stumpi_egress class): sliding window, elementwise-min
    profile updates, no recurrences."""

    def __init__(self, T, m):
        self.m = m
        self.T = np.asarray(T, dtype=np.float64).copy()
        P, I, _, _ = naive.stump(self.T, m)
        self.P = P[:, 0].copy()
        self.I = I[:, 0].copy()
        self.n_appended = 0

    def update(self, t):
        m = self.m
        self.T = np.append(self.T[1:], t)
        l = len(self.T) - m + 1
        Q = self.T[-m:]
        D = naive.mass(Q, self.T, query_idx=l - 1)
        self.P[:-1] = self.P[1:]
        self.I[:-1] = self.I[1:] - 1
        self.n_appended += 1
        improved = D[:l - 1] < self.P[:l - 1]
        self.P[:l - 1] = np.where(improved, D[:l - 1], self.P[:l - 1])
        self.I[:l - 1] = np.where(improved, l - 1, self.I[:l - 1])
        if np.isfinite(D).any():
            j = int(np.nanargmin(np.where(np.isfinite(D), D, np.inf)))
            self.P[-1] = D[j]
            self.I[-1] = j
        else:
            self.P[-1] = np.inf
            self.I[-1] = -1


@pytest.mark.parametrize("seed,n,m,updates", [
    (1, 30, 3, 40),
    (2, 64, 10, 50),
    (3, 40, 5, 120),
])
def test_stumpi_state_matches_incremental_oracle(seed, n, m, updates):
    rs = np.random.RandomState(seed)
    T0 = rs.uniform(-1000, 1000, n)
    stream = rs.uniform(-1000, 1000, updates)
    st = StumpiState(T0, m)
    ora = NaiveStumpiEgress(T0, m)
    for step, t in enumerate(stream):
        st.update(t)
        ora.update(t)
        npt.assert_almost_equal(ora.P, st.P, decimal=PRECISION,
                                err_msg=f"step {step}")
        npt.assert_array_equal(ora.I, st.I, err_msg=f"step {step}")


@pytest.mark.parametrize("seed,n,m,updates", [
    (4, 30, 3, 30),
    (5, 50, 8, 40),
])
def test_growing_stumpi_equals_batch_profile(seed, n, m, updates):
    """egress=False: after every append the growing profile must equal
    the batch matrix profile of the full series (absolute indices)."""
    from stumpy_spark import kernels
    from stumpy_spark.streaming.stumpi import GrowingStumpiState
    rs = np.random.RandomState(seed)
    T0 = rs.uniform(-1000, 1000, n)
    stream = rs.uniform(-1000, 1000, updates)
    st = GrowingStumpiState(T0, m)
    full = list(T0)
    for step, t in enumerate(stream):
        st.update(t)
        full.append(t)
        P, I, _, _ = kernels.matrix_profile(np.asarray(full), m)
        npt.assert_almost_equal(P[:, 0], st.P_, decimal=PRECISION,
                                err_msg=f"step {step}")
        npt.assert_array_equal(I[:, 0], st.I_, err_msg=f"step {step}")


def test_stumpi_state_roundtrip_serialization():
    rs = np.random.RandomState(7)
    st = StumpiState(rs.uniform(-10, 10, 30), 3)
    st.update(1.5)
    st2 = StumpiState.from_tuple(st.to_tuple())
    st.update(2.5)
    st2.update(2.5)
    npt.assert_array_equal(st.P, st2.P)
    npt.assert_array_equal(st.I, st2.I)
    npt.assert_array_equal(st.QT, st2.QT)


def test_stumpi_streaming_window_split_across_batches(spark, tmp_path):
    """The initial window arriving over multiple micro-batches must not
    rehydrate the empty placeholder state as a live StumpiState (which
    would crash update() on an empty T)."""
    import time
    rs = np.random.RandomState(23)
    n, m, extra = 25, 3, 8
    series = {f"doc{d}": rs.uniform(-100, 100, n + extra)
              for d in range(2)}
    indir = tmp_path / "in"
    indir.mkdir()

    def write_batch(name, lo, hi):
        rows = [(did, pos, float(v))
                for did, vals in series.items()
                for pos, v in enumerate(vals) if lo <= pos < hi]
        pd.DataFrame(rows, columns=["doc_id", "pos", "value"]).to_parquet(
            indir / name)

    write_batch("batch0.parquet", 0, 10)      # less than window_n
    time.sleep(1.1)                           # distinct file mtimes
    write_batch("batch1.parquet", 10, 20)     # still less than window_n
    time.sleep(1.1)
    write_batch("batch2.parquet", 20, n + extra)

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    out = stumpi_stream(stream, m=m, window_n=n)
    q = (out.writeStream.format("memory").queryName("stumpi_split_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_split"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("SELECT * FROM stumpi_split_out").toPandas()
    for did, vals in series.items():
        ora = NaiveStumpiEgress(vals[:n], m)
        for t in vals[n:]:
            ora.update(t)
        rows = res[res.doc_id == did].sort_values("n_seen")
        assert rows.n_seen.iloc[0] < n          # placeholder batch emitted
        row = rows.iloc[-1]
        assert row.n_seen == n + extra
        npt.assert_almost_equal(ora.P, np.array(row.P), decimal=PRECISION)


def test_stumpi_structured_streaming(spark, tmp_path):
    """End-to-end applyInPandasWithState smoke + parity test."""
    rs = np.random.RandomState(11)
    n, m, extra = 25, 3, 10
    series = {f"doc{d}": rs.uniform(-100, 100, n + extra) for d in range(3)}
    indir = tmp_path / "in"
    indir.mkdir()
    rows = []
    for did, vals in series.items():
        for pos, v in enumerate(vals):
            rows.append((did, pos, float(v)))
    pd.DataFrame(rows, columns=["doc_id", "pos", "value"]).to_parquet(
        indir / "batch0.parquet")

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = spark.readStream.schema(schema).parquet(str(indir))
    out = stumpi_stream(stream, m=m, window_n=n)
    q = (out.writeStream.format("memory").queryName("stumpi_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("SELECT * FROM stumpi_out").toPandas()
    assert set(res.doc_id) == set(series)
    for did, vals in series.items():
        ora = NaiveStumpiEgress(vals[:n], m)
        for t in vals[n:]:
            ora.update(t)
        row = res[res.doc_id == did].sort_values("n_seen").iloc[-1]
        assert row.n_seen == n + extra
        npt.assert_almost_equal(ora.P, np.array(row.P), decimal=PRECISION)
        exp_abs = np.where(ora.I >= 0, ora.I + ora.n_appended, -1)
        got = np.array(row.I)
        npt.assert_array_equal(exp_abs[ora.I >= 0], got[ora.I >= 0])
