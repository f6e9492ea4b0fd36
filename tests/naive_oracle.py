"""Brute-force oracles for kernel/operator tests.

Same role as the reference's tests/naive.py (/root/reference/tests/naive.py)
— every operator has a naive twin with no recurrences and no vectorized
shortcuts, computed pair-by-pair — but written from scratch against the
documented semantics (SURVEY.md §1.3, §5).
"""

from __future__ import annotations

import math

import numpy as np

DENOM_THRESHOLD = 1e-14
STDDEV_THRESHOLD = 1e-7
P_NORM_THRESHOLD = 1e-14
EXCL_ZONE_DENOM = 4


def excl_zone(m):
    return int(math.ceil(m / EXCL_ZONE_DENOM))


def znorm_dist(a, b):
    """Naive z-normalized Euclidean distance between two windows."""
    m = len(a)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if not (np.all(np.isfinite(a)) and np.all(np.isfinite(b))):
        return np.inf
    a_const = np.ptp(a) == 0
    b_const = np.ptp(b) == 0
    if a_const and b_const:
        return 0.0
    if a_const or b_const:
        return math.sqrt(m)
    sa = a.std()
    sb = b.std()
    if sa < STDDEV_THRESHOLD:
        sa = 1.0
    if sb < STDDEV_THRESHOLD:
        sb = 1.0
    az = (a - a.mean()) / sa
    bz = (b - b.mean()) / sb
    d2 = float(np.sum((az - bz) ** 2))
    if d2 < P_NORM_THRESHOLD:
        d2 = 0.0
    return math.sqrt(d2)


def pnorm_dist(a, b, p=2.0):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if not (np.all(np.isfinite(a)) and np.all(np.isfinite(b))):
        return np.inf
    return float(np.sum(np.abs(a - b) ** p) ** (1.0 / p))


def distance_matrix(T_A, T_B, m, normalize=True, p=2.0):
    la = len(T_A) - m + 1
    lb = len(T_B) - m + 1
    D = np.empty((la, lb))
    for i in range(la):
        for j in range(lb):
            if normalize:
                D[i, j] = znorm_dist(T_A[i:i + m], T_B[j:j + m])
            else:
                D[i, j] = pnorm_dist(T_A[i:i + m], T_B[j:j + m], p)
    return D


def mass(Q, T, query_idx=None):
    m = len(Q)
    l = len(T) - m + 1
    D = np.array([znorm_dist(Q, T[j:j + m]) for j in range(l)])
    if query_idx is not None:
        ez = excl_zone(m)
        D[max(0, query_idx - ez):query_idx + ez + 1] = np.inf
    return D


def stump(T_A, m, T_B=None, k=1, normalize=True, p=2.0):
    """Naive top-k matrix profile. Returns (P, I, IL, IR)."""
    self_join = T_B is None
    B = T_A if self_join else T_B
    D = distance_matrix(T_A, B, m, normalize=normalize, p=p)
    la, lb = D.shape
    ez = excl_zone(m)
    P = np.full((la, k), np.inf)
    I = np.full((la, k), -1, dtype=np.int64)
    IL = np.full(la, -1, dtype=np.int64)
    IR = np.full(la, -1, dtype=np.int64)
    for i in range(la):
        row = D[i].copy()
        if self_join:
            row[max(0, i - ez):i + ez + 1] = np.inf
            left = row.copy()
            left[i:] = np.inf
            right = row.copy()
            right[:i + 1] = np.inf
            if np.isfinite(left).any():
                IL[i] = int(np.argmin(left))
            if np.isfinite(right).any():
                IR[i] = int(np.argmin(right))
        order = np.argsort(row, kind="stable")[:k]
        for s, j in enumerate(order):
            if np.isfinite(row[j]):
                P[i, s] = row[j]
                I[i, s] = j
    return P, I, IL, IR


def rolling_mean_std(T, m):
    T = np.asarray(T, dtype=np.float64)
    l = len(T) - m + 1
    means = np.array([T[i:i + m].mean() for i in range(l)])
    stds = np.array([T[i:i + m].std() for i in range(l)])
    return means, stds


def mpdist(T_A, T_B, m, percentage=0.05, k=None):
    """Naive MPdist (semantics of stumpy/mpdist.py:134-254)."""
    PAB = stump(T_A, m, T_B=T_B)[0][:, 0]
    PBA = stump(T_B, m, T_B=T_A)[0][:, 0]
    ABBA = np.sort(np.concatenate([PAB, PBA]))
    n = len(T_A) + len(T_B)
    if k is None:
        k = min(int(math.ceil(percentage * n)), len(ABBA) - 1)
    k = min(k, len(ABBA) - 1)
    val = ABBA[k]
    if not np.isfinite(val):
        finite = ABBA[np.isfinite(ABBA)]
        return float(finite[-1]) if len(finite) else np.inf
    return float(val)


def fluss_cac(I, L, n_regimes=None, excl_factor=5):
    """Naive corrected arc curve (floss.py:13-181 semantics)."""
    n = len(I)
    nnmark = np.zeros(n, dtype=np.int64)
    for i, j in enumerate(I):
        small = min(i, int(j))
        big = max(i, int(j))
        nnmark[small] += 1
        if big < n:
            nnmark[big] -= 1
    arc = np.cumsum(nnmark)
    # idealized arc curve (parabola) 2*i*(n-i)/n
    idx = np.arange(n)
    iac = 2.0 * idx * (n - idx) / n
    cac = np.minimum(arc / np.where(iac == 0, 1, iac), 1.0)
    cac[:L * excl_factor] = 1.0
    cac[-L * excl_factor:] = 1.0
    return cac
