"""Mining kernels vs brute-force checks (motifs, mpdist, fluss, snippets,
chains, ostinato, stimp)."""

import numpy as np
import numpy.testing as npt
import pytest

import naive_oracle as naive
from stumpy_spark import kernels, mining

PRECISION = 5


def test_mpdist_matches_naive():
    rs = np.random.RandomState(42)
    for n_a, n_b, m in [(32, 40, 5), (64, 64, 10)]:
        T_A = rs.uniform(-1000, 1000, n_a)
        T_B = rs.uniform(-1000, 1000, n_b)
        ref = naive.mpdist(T_A, T_B, m)
        got = mining.mpdist(T_A, T_B, m)
        npt.assert_almost_equal(ref, got, decimal=PRECISION)


def test_mpdist_identical_series_is_zero():
    rs = np.random.RandomState(1)
    T = rs.uniform(-10, 10, 50)
    assert mining.mpdist(T, T.copy(), 8) == 0.0


def test_motifs_planted():
    rs = np.random.RandomState(17)
    T = rs.uniform(-1000, 1000, 120)
    motif = rs.uniform(-1000, 1000, 8)
    for at in (10, 50, 90):
        T[at:at + 8] = motif
    P = kernels.matrix_profile(T, 8)[0][:, 0]
    md, mi = mining.motifs(T, P, 8, max_motifs=1, max_matches=5)
    assert len(mi) == 1
    found = set(mi[0])
    assert {10, 50, 90} <= found
    assert md[0][0] == 0.0


def test_match_exclusion_zone():
    rs = np.random.RandomState(3)
    T = rs.uniform(-1000, 1000, 60)
    Q = T[20:28].copy()
    got = mining.match(Q, T, max_distance=np.inf, max_matches=3)
    idxs = [i for _, i in got]
    assert 20 in idxs
    # greedy extraction: indices are at least excl_zone apart
    ez = kernels.excl_zone(8)
    s = sorted(idxs)
    assert all(s[i + 1] - s[i] > ez for i in range(len(s) - 1))


def test_cac_matches_naive():
    rs = np.random.RandomState(5)
    T = rs.uniform(-1000, 1000, 200)
    I = kernels.matrix_profile(T, 10)[1][:, 0]
    L = 10
    got = mining.cac(I, L, excl_factor=5)
    ref = naive.fluss_cac(I, L, excl_factor=5)
    npt.assert_almost_equal(ref, got, decimal=PRECISION)


def test_fluss_finds_regime_change():
    rs = np.random.RandomState(7)
    # two regimes: sine-ish then noise
    t = np.arange(300, dtype=np.float64)
    a = np.sin(2 * np.pi * t[:150] / 20) * 100
    b = rs.uniform(-100, 100, 150)
    T = np.concatenate([a, b])
    I = kernels.matrix_profile(T, 10)[1][:, 0]
    _, regimes = mining.fluss(I, L=10, n_regimes=2, excl_factor=2)
    assert len(regimes) == 1
    assert 100 <= regimes[0] <= 200       # near the true change at 150


def test_chains_atsc_allc():
    # manufactured IL/IR with a known chain 0 -> 2 -> 4
    IL = np.array([-1, -1, 0, -1, 2], dtype=np.int64)
    IR = np.array([2, 3, 4, -1, -1], dtype=np.int64)
    chain = mining.atsc(IL, IR, 0)
    npt.assert_array_equal(chain, [0, 2, 4])
    chains, longest = mining.allc(IL, IR)
    npt.assert_array_equal(longest, [0, 2, 4])


def test_ostinato_planted_consensus():
    rs = np.random.RandomState(11)
    motif = rs.uniform(-1000, 1000, 8)
    Ts = []
    for i in range(4):
        T = rs.uniform(-1000, 1000, 60)
        T[i * 10 + 5:i * 10 + 13] = motif + rs.normal(0, 0.01, 8)
        Ts.append(T)
    rad, ts_i, idx = mining.ostinato(Ts, 8)
    assert rad < 1.0      # consensus found with tiny radius
    # the found subsequence is the planted motif occurrence
    assert abs(idx - (ts_i * 10 + 5)) <= 1


def test_ostinato_matches_bruteforce():
    rs = np.random.RandomState(13)
    Ts = [rs.uniform(-100, 100, 30) for _ in range(3)]
    m = 5
    # brute force: for every (series, subseq), radius = max over other
    # series of min distance
    best = (np.inf, -1, -1)
    for j, Tj in enumerate(Ts):
        for q in range(len(Tj) - m + 1):
            Q = Tj[q:q + m]
            radius = 0.0
            for g, Tg in enumerate(Ts):
                if g == j:
                    continue
                radius = max(radius, float(np.min(naive.mass(Q, Tg))))
            if radius < best[0]:
                best = (radius, j, q)
    rad, ts_i, idx = mining.ostinato(Ts, m)
    npt.assert_almost_equal(rad, best[0], decimal=PRECISION)
    assert (ts_i, idx) == (best[1], best[2])


def test_snippets_regimes():
    rs = np.random.RandomState(19)
    # series made of two alternating block types
    blocks = []
    for i in range(8):
        if i % 2 == 0:
            blocks.append(np.sin(2 * np.pi * np.arange(16) / 8) * 50)
        else:
            blocks.append(np.linspace(-50, 50, 16))
    T = np.concatenate(blocks) + rs.normal(0, 0.1, 128)
    idxs, fracs, areas = mining.snippets(T, 16, 2)
    assert len(idxs) == 2
    # the two snippets come from different block types
    assert (idxs[0] // 16) % 2 != (idxs[1] // 16) % 2
    assert abs(fracs.sum() - 1.0) < 1e-9


def test_stimp_pan_and_bfs():
    assert mining.bfs_order([3, 5, 8, 13, 21]) == [8, 3, 13, 5, 21]
    rs = np.random.RandomState(23)
    T = rs.uniform(-100, 100, 80)
    pan = mining.stimp_pan(T, [4, 8, 16])
    assert set(pan) == {4, 8, 16}
    for m, P in pan.items():
        ref = naive.stump(T, m)[0][:, 0]
        npt.assert_almost_equal(ref, P, decimal=PRECISION)


def _naive_pan_transform(pan, M, width, threshold=0.2, normalize=True,
                         contrast=True, binary=True, clip=True):
    """Independent loop-based restatement of the stimp.py:272-330 /
    core.py:3214-3273 transform contract."""
    M = sorted(M)
    PAN = np.full((len(M), width), np.nan)
    for m, P in pan.items():
        r = M.index(m)
        PAN[r, :len(P)] = np.where(np.isfinite(P), P, np.nan)
    rows = sorted(M.index(m) for m in pan)
    if normalize:
        for r in rows:
            PAN[r] = np.minimum(1.0, PAN[r] / (2.0 * np.sqrt(M[r])))
    if contrast:
        flat = PAN[rows].ravel()
        order = np.argsort(flat, kind="mergesort")
        pct = np.empty(len(flat))
        lin = np.linspace(0, 1, len(flat))
        for rank, pos in enumerate(order):
            pct[pos] = lin[rank]
        sig = 1.0 / (1.0 + np.exp(-10 * (pct - threshold)))
        PAN[rows] = sig.reshape(len(rows), width)
    if binary:
        for r in rows:
            PAN[r] = np.where(PAN[r] <= threshold, 0.0, 1.0)
    if clip:
        for r in rows:
            PAN[r] = np.clip(PAN[r], 0.0, 1.0)
    out = PAN.copy()
    prev = None
    for r in range(max(rows), -1, -1):
        if r in rows:
            prev = PAN[r]
        out[r] = prev
    if np.isnan(out).any() and not np.isnan(out).all():
        out[np.isnan(out)] = np.nanmax(out)
    return out


def test_pan_transform_matches_naive():
    rs = np.random.RandomState(31)
    T = rs.uniform(-100, 100, 90)
    M = [4, 8, 16, 32]
    pan = mining.stimp_pan(T, [4, 8, 16])     # 32 not yet processed
    width = len(T) - min(M) + 1
    for kwargs in (
        {},
        {"binary": False},
        {"binary": False, "contrast": False},
        {"binary": False, "contrast": False, "normalize": False},
        {"threshold": 0.5},
    ):
        got = mining.pan_transform(pan, M, width, **kwargs)
        exp = _naive_pan_transform(pan, M, width, **kwargs)
        npt.assert_almost_equal(got, exp, decimal=12)
    full = mining.pan_transform(pan, M, width)
    assert set(np.unique(full)) <= {0.0, 1.0}


def test_mpdist_custom_func_and_mp_func():
    rs = np.random.RandomState(37)
    A = rs.uniform(-100, 100, 60)
    B = rs.uniform(-100, 100, 50)
    m = 8
    base = mining.mpdist(A, B, m)
    med = mining.mpdist(A, B, m, custom_func=np.median)
    PAB = naive.stump(A, m, T_B=B)[0][:, 0]
    PBA = naive.stump(B, m, T_B=A)[0][:, 0]
    assert abs(med - np.median(np.sort(np.concatenate([PAB, PBA])))) < 1e-6
    assert med != base
    # mp_func injection: an absolute-distance kernel reroutes the profile
    from stumpy_spark import kernels
    via_hook = mining.mpdist(
        A, B, m,
        mp_func=lambda ta, mm, tb: kernels.matrix_profile_absolute(
            ta, mm, T_B=tb)[0][:, 0])
    direct = mining.mpdist(A, B, m, normalize=False)
    assert abs(via_hook - direct) < 1e-12
