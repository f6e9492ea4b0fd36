"""scrump/prescrump anytime invariants + mstump vs brute force."""

import numpy as np
import numpy.testing as npt

import naive_oracle as naive
from stumpy_spark import kernels
from stumpy_spark.anytime import (Scrump, multi_matrix_profile, prescrump,
                                  subspace)

PRECISION = 5


def test_prescrump_upper_bound_and_sampled_exact():
    rs = np.random.RandomState(42)
    T = rs.uniform(-1000, 1000, 200)
    m = 10
    P_exact = kernels.matrix_profile(T, m)[0][:, 0]
    P, I = prescrump(T, m, s=3)
    assert np.all(P >= P_exact - 1e-9)
    # sampled rows are exact
    assert np.allclose(P[::3], P_exact[::3], atol=1e-9)


def test_scrump_converges_to_exact():
    rs = np.random.RandomState(7)
    T = rs.uniform(-1000, 1000, 150)
    m = 8
    P_exact, I_exact, _, _ = kernels.matrix_profile(T, m)
    sc = Scrump(T, m, percentage=0.25)
    prev_inf = np.inf
    for _ in range(4):
        sc.update()
        assert np.all(sc.P_ >= P_exact[:, 0] - 1e-9)   # upper bound
        cur = np.nansum(np.where(np.isfinite(sc.P_), sc.P_, 0))
        # monotone non-increasing approximation
        assert cur <= prev_inf + 1e-9 or not np.isfinite(prev_inf)
        prev_inf = cur
    sc.run_to_completion()
    npt.assert_almost_equal(P_exact[:, 0], sc.P_, decimal=PRECISION)
    npt.assert_array_equal(I_exact[:, 0], sc.I_)


def test_scrump_with_prescrump():
    rs = np.random.RandomState(11)
    T = rs.uniform(-1000, 1000, 120)
    m = 6
    sc = Scrump(T, m, percentage=1.0, pre_scrump=True)
    sc.run_to_completion()
    P_exact = kernels.matrix_profile(T, m)[0][:, 0]
    npt.assert_almost_equal(P_exact, sc.P_, decimal=PRECISION)


def _naive_mstump(Ts, m):
    d, n = Ts.shape
    l = n - m + 1
    ez = naive.excl_zone(m)
    P = np.full((d, l), np.inf)
    I = np.full((d, l), -1, dtype=np.int64)
    for i in range(l):
        dists = np.full((d, l), np.inf)
        for j in range(l):
            if abs(i - j) <= ez:
                continue
            per_dim = sorted(
                naive.znorm_dist(Ts[dim, i:i + m], Ts[dim, j:j + m])
                for dim in range(d))
            c = 0.0
            for kdim in range(d):
                c += per_dim[kdim]
                dists[kdim, j] = c / (kdim + 1)
        for kdim in range(d):
            j = int(np.argmin(dists[kdim]))
            if np.isfinite(dists[kdim, j]):
                P[kdim, i] = dists[kdim, j]
                I[kdim, i] = j
    return P, I


def test_mstump_matches_naive():
    rs = np.random.RandomState(13)
    Ts = rs.uniform(-100, 100, (3, 40))
    m = 5
    ref_P, ref_I = _naive_mstump(Ts, m)
    P, I = multi_matrix_profile(Ts, m)
    npt.assert_almost_equal(ref_P, P, decimal=PRECISION)
    npt.assert_array_equal(ref_I, I)


def test_subspace():
    rs = np.random.RandomState(17)
    Ts = rs.uniform(-100, 100, (4, 60))
    m = 6
    # plant a motif in dims 0 and 2 only
    pat = rs.uniform(-100, 100, m)
    for dim in (0, 2):
        Ts[dim, 10:16] = pat
        Ts[dim, 40:46] = pat
    dims = subspace(Ts, m, 10, 40, k=1)
    assert set(dims) == {0, 2}


def test_mdl_and_mmotifs():
    rs = np.random.RandomState(29)
    Ts = rs.uniform(-100, 100, (4, 80))
    m = 6
    pat = rs.uniform(-100, 100, m)
    for dim in (0, 2):
        Ts[dim, 10:16] = pat
        Ts[dim, 50:56] = pat + rs.normal(0, 0.001, m)
    from stumpy_spark.anytime import mmotifs
    res = mmotifs(Ts, m, max_motifs=1)
    assert len(res) == 1
    motif_idx, nn_idx, kdim, dims = res[0]
    assert {motif_idx, nn_idx} == {10, 50}
    assert set(dims) <= {0, 2}


def test_non_normalized_twins():
    """The normalize=False reroute (reference @non_normalized decorator
    parity, tests/test_non_normalized_decorator.py analog)."""
    rs = np.random.RandomState(31)
    T = rs.uniform(-100, 100, 100)
    m = 6
    P_exact = kernels.matrix_profile_absolute(T, m)[0][:, 0]
    # scraamp: converges to the exact aamp profile
    sc = Scrump(T, m, percentage=1.0, normalize=False)
    sc.run_to_completion()
    npt.assert_almost_equal(P_exact, sc.P_, decimal=PRECISION)
    # prescraamp: upper bound, sampled rows exact
    P, I = prescrump(T, m, s=3, normalize=False)
    assert np.all(P >= P_exact - 1e-9)
    npt.assert_almost_equal(P[::3], P_exact[::3], decimal=PRECISION)
    # maamp
    Ts = rs.uniform(-100, 100, (2, 40))
    Pm, Im = multi_matrix_profile(Ts, 5, normalize=False)
    # 1-dim level equals min over per-dim aamp? level k uses sorted means;
    # check level-0 against brute force
    ez = 2
    for i in range(Pm.shape[1]):
        ds = []
        for j in range(Pm.shape[1]):
            if abs(i - j) <= ez:
                continue
            per = sorted(
                float(np.sqrt(np.sum((Ts[d, i:i+5] - Ts[d, j:j+5])**2)))
                for d in range(2))
            ds.append(per[0])
        npt.assert_almost_equal(Pm[0, i], min(ds), decimal=PRECISION)


def test_ostinato_snippets_non_normalized():
    import naive_oracle as naive
    from stumpy_spark import mining
    rs = np.random.RandomState(33)
    Ts = [rs.uniform(-100, 100, 30) for _ in range(3)]
    m = 5
    best = (np.inf, -1, -1)
    for j, Tj in enumerate(Ts):
        for q in range(len(Tj) - m + 1):
            Q = Tj[q:q + m]
            radius = 0.0
            for g, Tg in enumerate(Ts):
                if g == j:
                    continue
                dmin = min(naive.pnorm_dist(Q, Tg[x:x + m])
                           for x in range(len(Tg) - m + 1))
                radius = max(radius, dmin)
            if radius < best[0]:
                best = (radius, j, q)
    rad, ts_i, idx = mining.ostinato(Ts, m, normalize=False)
    npt.assert_almost_equal(rad, best[0], decimal=PRECISION)
    assert (ts_i, idx) == (best[1], best[2])
    # aampdist_snippets smoke: runs and covers the series
    T = rs.uniform(-100, 100, 96)
    idxs, fracs, areas = mining.snippets(T, 16, 2, normalize=False)
    assert len(idxs) == 2 and abs(fracs.sum() - 1.0) < 1e-9
