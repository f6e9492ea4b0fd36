"""Spark operator parity vs naive oracles (distributed-parity analog of the
reference's tests/test_stumped.py: Spark output must equal single-node naive
output exactly, SURVEY §5.6)."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import naive_oracle as naive
from stumpy_spark.operators import profile as ops

PRECISION = 5


@pytest.fixture(scope="module")
def seq_df(spark):
    rs = np.random.RandomState(42)
    rows = []
    for i in range(12):
        n = rs.randint(20, 120)
        rows.append((f"doc{i}", rs.randint(0, 1000, n).astype(np.int32)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    return spark.createDataFrame(pdf).repartition(4), {
        d: np.asarray(t, dtype=np.float64) for d, t in rows}


def test_stump_matches_naive(spark, seq_df):
    df, raw = seq_df
    m = 5
    result = ops.stump(df, m).toPandas()
    for doc_id, T in raw.items():
        if len(T) < 2 * m:
            continue
        got = result[result.doc_id == doc_id].sort_values("i")
        ref_P, ref_I, ref_IL, ref_IR = naive.stump(T, m)
        npt.assert_almost_equal(
            ref_P[:, 0], np.array([p[0] for p in got.P]), decimal=PRECISION)
        npt.assert_array_equal(ref_I[:, 0],
                               np.array([i[0] for i in got.I]))
        npt.assert_array_equal(ref_IL, got.IL.to_numpy())
        npt.assert_array_equal(ref_IR, got.IR.to_numpy())


def test_aamp_matches_naive(spark, seq_df):
    df, raw = seq_df
    m = 4
    result = ops.aamp(df, m).toPandas()
    for doc_id, T in raw.items():
        if len(T) < 2 * m:
            continue
        got = result[result.doc_id == doc_id].sort_values("i")
        ref_P, ref_I, _, _ = naive.stump(T, m, normalize=False)
        npt.assert_almost_equal(
            ref_P[:, 0], np.array([p[0] for p in got.P]), decimal=PRECISION)


def test_mass_matches_naive(spark, seq_df):
    df, raw = seq_df
    Q = raw["doc0"][:8]
    result = ops.mass(df, Q).toPandas().set_index("doc_id")
    for doc_id, T in raw.items():
        if len(T) < 8:
            continue
        D = naive.mass(Q, T)
        finite = np.isfinite(D)
        row = result.loc[doc_id]
        assert int(row.min_idx) == int(np.argmin(np.where(finite, D, np.inf)))
        npt.assert_almost_equal(row.min_d, D[int(row.min_idx)],
                                decimal=PRECISION)
        npt.assert_almost_equal(row.max_d, D[finite].max(), decimal=PRECISION)


def test_profile_summary(spark, seq_df):
    df, raw = seq_df
    m = 5
    result = ops.profile_summary(df, m).toPandas().set_index("doc_id")
    for doc_id, T in raw.items():
        if len(T) < 2 * m:
            continue
        ref_P, ref_I, _, _ = naive.stump(T, m)
        p0 = ref_P[:, 0]
        row = result.loc[doc_id]
        npt.assert_almost_equal(row.min_p, p0.min(), decimal=PRECISION)
        npt.assert_almost_equal(row.max_p, p0[np.isfinite(p0)].max(),
                                decimal=PRECISION)
        # a motif pair (i, j) ties exactly (P[i] == P[j]); either member
        # may win the global argmin depending on fp rounding order
        near_min = set(np.nonzero(p0 <= p0.min() + 1e-5)[0])
        assert int(row.motif_i) in near_min
        npt.assert_almost_equal(p0[int(row.motif_i)], p0.min(),
                                decimal=PRECISION)
        assert ref_I[int(row.motif_i), 0] == row.motif_j


def test_sliding_stats_exact(spark, seq_df):
    df, raw = seq_df
    m = 7
    result = ops.sliding_stats(df, m).toPandas().set_index("doc_id")
    for doc_id, T in raw.items():
        if len(T) < m:
            continue
        means, stds = naive.rolling_mean_std(T, m)
        row = result.loc[doc_id]
        assert row.n_windows == len(means)
        npt.assert_almost_equal(row.min_mean, means.min(), decimal=PRECISION)
        npt.assert_almost_equal(row.max_mean, means.max(), decimal=PRECISION)
        npt.assert_almost_equal(row.min_std, stds.min(), decimal=PRECISION)
        npt.assert_almost_equal(row.max_std, stds.max(), decimal=PRECISION)
        # exact integer invariant
        wsum = sum(int(T[i:i + m].sum()) for i in range(len(T) - m + 1))
        assert row.sum_window_sums == wsum


def test_profile_summary_fast_path_parity(spark):
    """profile_summary's lean compiled-kernel summary path must produce
    row-identical output to the numpy fallback route."""
    import numpy as np
    import pandas as pd
    from stumpy_spark import cnative
    from stumpy_spark import operators as ops
    from stumpy_spark.sources import tokseq

    if cnative.load() is None:
        import pytest
        pytest.skip("compiled kernel unavailable")
    df = tokseq.tokseq_df(spark, 300, partitions=2)
    got = (ops.profile_summary(df, 8).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    try:
        cnative._failed = True
        saved, cnative._fn = cnative._fn, None
        ref = (ops.profile_summary(df, 8).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
    finally:
        cnative._fn = saved
        cnative._failed = False
    pd.testing.assert_frame_equal(got, ref)
    assert (got.n_windows > 0).all()
    assert np.isfinite(got.min_p).all()
