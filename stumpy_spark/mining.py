"""Higher-level mining kernels built on the matrix-profile primitives.

Pure numpy (no Spark) — these run inside the pandas/Arrow UDFs of
:mod:`stumpy_spark.operators.discovery`.  Semantics follow the reference
(citations into /root/reference/):

- :func:`motifs` / :func:`match` — stumpy/motifs.py:13-157, 404-470
- :func:`mpdist` — stumpy/mpdist.py:134-254, core.py:3276-3321
- :func:`fluss` (CAC + REA) — stumpy/floss.py:13-302
- :func:`snippets` — stumpy/snippets.py:153-339
- :func:`atsc` / :func:`allc` chains — stumpy/chains.py:10-152
- :func:`ostinato` — stumpy/ostinato.py:13-278
- :func:`stimp_pan` — stumpy/stimp.py:42-330
"""

from __future__ import annotations

import math

import numpy as np

from . import kernels


# ---------------------------------------------------------------------------
# motif discovery
# ---------------------------------------------------------------------------

def match(Q, T, max_distance=None, max_matches=None,
          normalize: bool = True, p: float = 2.0):
    """All subsequences of T matching Q within max_distance, greedily
    extracted best-first with exclusion zones (motifs.py:404-470).

    Returns array of (distance, index) sorted by distance.
    """
    Q = np.asarray(Q, dtype=np.float64)
    m = len(Q)
    if normalize:
        D = kernels.mass(Q, T)
    else:
        D = kernels.mass_absolute(Q, T, p=p)
    if max_distance is None:
        finite = D[np.isfinite(D)]
        max_distance = max(np.mean(finite) - 2 * np.std(finite),
                          np.min(finite)) if len(finite) else np.inf
    elif callable(max_distance):
        max_distance = max_distance(D)
    D = D.copy()
    ez = kernels.excl_zone(m)
    out = []
    while True:
        idx = int(np.argmin(D))
        d = D[idx]
        if not np.isfinite(d) or d > max_distance:
            break
        out.append((float(d), idx))
        kernels.apply_exclusion_zone(D, idx, np.inf, ez)
        if max_matches is not None and len(out) >= max_matches:
            break
    return np.array(out, dtype=object).reshape(-1, 2)


def motifs(T, P, m: int, min_neighbors: int = 1, max_distance=None,
           cutoff=None, max_matches: int = 10, max_motifs: int = 1,
           normalize: bool = True, p: float = 2.0):
    """Top motifs from a (top-1) matrix profile (motifs.py:13-157).

    Returns (motif_distances, motif_indices): lists per discovered motif of
    the match distances/indices (first entry = the motif itself, d=0-ish).
    """
    T = np.asarray(T, dtype=np.float64)
    P = np.asarray(P, dtype=np.float64).copy()
    l = len(P)
    ez = kernels.excl_zone(m)
    if cutoff is None:
        finite = P[np.isfinite(P)]
        cutoff = max(np.mean(finite) - 2 * np.std(finite),
                     np.min(finite)) if len(finite) else np.inf
    md, mi = [], []
    while len(md) < max_motifs:
        idx = int(np.argmin(P))
        if not np.isfinite(P[idx]) or P[idx] > cutoff:
            break
        Q = T[idx:idx + m]
        matches = match(Q, T, max_distance=max_distance,
                        max_matches=max_matches, normalize=normalize, p=p)
        if len(matches) > min_neighbors:
            md.append([float(d) for d, _ in matches])
            mi.append([int(i) for _, i in matches])
        for _, i in matches:
            kernels.apply_exclusion_zone(P, int(i), np.inf, ez)
        kernels.apply_exclusion_zone(P, idx, np.inf, ez)
    return md, mi


# ---------------------------------------------------------------------------
# MPdist
# ---------------------------------------------------------------------------

def mpdist(T_A, T_B, m: int, percentage: float = 0.05,
           k: int | None = None, normalize: bool = True,
           p: float = 2.0, custom_func=None, mp_func=None) -> float:
    """Join-then-aggregate distance between two whole series
    (mpdist.py:134-254): k-th smallest of the concatenated AB/BA top-1
    profiles, default k = ceil(0.05 (n_A + n_B)).

    UDF hooks (core.py:3276-3312 / core.py:2737-2774):
    ``custom_func(P_ABBA) -> float`` replaces the k-th-smallest selection;
    ``mp_func(T, m, T_B) -> 1-D AB profile`` replaces the profile kernel.
    """
    if mp_func is not None:
        PAB = np.asarray(mp_func(T_A, m, T_B), dtype=np.float64)
        PBA = np.asarray(mp_func(T_B, m, T_A), dtype=np.float64)
    elif normalize:
        PAB = kernels.matrix_profile(T_A, m, T_B=T_B)[0][:, 0]
        PBA = kernels.matrix_profile(T_B, m, T_B=T_A)[0][:, 0]
    else:
        PAB = kernels.matrix_profile_absolute(T_A, m, T_B=T_B, p=p)[0][:, 0]
        PBA = kernels.matrix_profile_absolute(T_B, m, T_B=T_A, p=p)[0][:, 0]
    # custom_func receives the UNSORTED concat with the AB half first —
    # the reference contract (core.py:3276-3312) is position-sensitive
    if custom_func is not None:
        return float(custom_func(np.concatenate([PAB, PBA])))
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


# ---------------------------------------------------------------------------
# FLUSS segmentation
# ---------------------------------------------------------------------------

def _nnmark(I: np.ndarray) -> np.ndarray:
    """Arc counts from nearest-neighbor indices (floss.py:13-47)."""
    n = len(I)
    mark = np.zeros(n + 1, dtype=np.int64)
    idx = np.arange(n)
    small = np.minimum(idx, I.astype(np.int64))
    big = np.maximum(idx, I.astype(np.int64))
    np.add.at(mark, small, 1)
    np.add.at(mark, big, -1)
    return np.cumsum(mark[:n])


def cac(I: np.ndarray, L: int, excl_factor: int = 5,
        custom_iac: np.ndarray | None = None) -> np.ndarray:
    """Corrected arc curve (floss.py:119-181): arcs / idealized parabola,
    clipped to 1, edges zeroed-out to 1."""
    n = len(I)
    arcs = _nnmark(I)
    if custom_iac is None:
        idx = np.arange(n)
        iac = 2.0 * idx * (n - idx) / n
    else:
        iac = custom_iac
    out = np.minimum(arcs / np.where(iac == 0, 1.0, iac), 1.0)
    out[:L * excl_factor] = 1.0
    out[-L * excl_factor:] = 1.0
    return out


def rea(cac_arr: np.ndarray, n_regimes: int, L: int,
        excl_factor: int = 5) -> np.ndarray:
    """Regime extraction: iterative argmin with L*excl_factor zones
    (floss.py:184-229)."""
    c = cac_arr.copy()
    out = np.empty(n_regimes - 1, dtype=np.int64)
    for i in range(n_regimes - 1):
        out[i] = int(np.argmin(c))
        ez = L * excl_factor
        lo = max(0, out[i] - ez)
        c[lo:out[i] + ez + 1] = np.inf
    return np.sort(out)


def fluss(I: np.ndarray, L: int, n_regimes: int, excl_factor: int = 5):
    """CAC + regimes (floss.py:232-302)."""
    c = cac(I, L, excl_factor)
    return c, rea(c, n_regimes, L, excl_factor)


# ---------------------------------------------------------------------------
# snippets
# ---------------------------------------------------------------------------

def snippets(T, m: int, k: int, percentage: float = 1.0,
             normalize: bool = True, p: float = 2.0):
    """Top-k snippets (most representative non-overlapping m-blocks),
    greedy min-area selection over MPdist profiles (snippets.py:153-339).

    Returns (snippet_indices, fractions, areas).
    """
    T = np.asarray(T, dtype=np.float64)
    n = len(T)
    pad = (m - n % m) % m
    Tp = np.concatenate([T, np.full(pad, np.nan)]) if pad else T
    n_pad = len(Tp)
    starts = np.arange(0, n_pad, m)
    sub_m = max(int(math.floor(m * percentage)), 4) \
        if percentage < 1.0 else m
    # distance profile of each m-block vs T using MPdist sub-profiles:
    # D[i, j] = min over sub-windows (the reference's mpdist_vect)
    profiles = []
    for s in starts:
        block = Tp[s:s + m]
        valid = ~np.isnan(block)
        if valid.sum() < sub_m:
            profiles.append(np.full(max(n - sub_m + 1, 1), np.inf))
            continue
        blk = block[valid]
        # mpdist-vect: sliding min over the AB profile of block windows,
        # all rows in one mass_distance_matrix call (GEMM / offset
        # accumulation instead of a python loop of MASS rows)
        qw = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(blk, sub_m))
        Dm = kernels.mass_distance_matrix(qw, T, normalize=normalize, p=p)
        D = Dm[:, :n - sub_m + 1].min(axis=0)
        profiles.append(D)
    profiles = np.vstack(profiles)
    k = min(k, len(starts))
    chosen = np.empty(k, dtype=np.int64)
    total_min = np.full(profiles.shape[1], np.inf)
    areas = np.empty(k)
    for ki in range(k):
        best_area = np.inf
        best = -1
        for c in range(len(starts)):
            area = float(np.sum(np.minimum(profiles[c], total_min)))
            if area < best_area:
                best_area = area
                best = c
        chosen[ki] = starts[best]
        areas[ki] = best_area
        total_min = np.minimum(total_min, profiles[best])
    # fractions: share of positions each snippet covers (argmin ownership)
    owner = np.argmin(profiles[(chosen // m)], axis=0)
    fractions = np.array([(owner == i).mean() for i in range(k)])
    return chosen, fractions, areas


# ---------------------------------------------------------------------------
# chains
# ---------------------------------------------------------------------------

def atsc(IL: np.ndarray, IR: np.ndarray, j: int) -> np.ndarray:
    """Anchored time-series chain from j: follow IR while IL[IR[x]] == x
    (chains.py:10-57)."""
    out = [j]
    x = j
    while True:
        r = IR[x]
        if r == -1 or IL[r] != x:
            break
        out.append(int(r))
        x = int(r)
    return np.array(out, dtype=np.int64)


def allc(IL: np.ndarray, IR: np.ndarray):
    """All chains + the longest unanchored chain (chains.py:60-152)."""
    l = len(IL)
    in_chain = np.zeros(l, dtype=bool)
    # chain starts: x whose left link does not reciprocate
    chains = []
    for j in range(l):
        lft = IL[j]
        if lft != -1 and 0 <= lft < l and IR[lft] == j:
            in_chain[j] = True    # j is a continuation, not a start
    for j in range(l):
        if not in_chain[j]:
            c = atsc(IL, IR, j)
            if len(c) > 1:
                chains.append(c)
    if not chains:
        return [], np.array([], dtype=np.int64)
    longest = max(chains, key=len)
    return chains, longest


# ---------------------------------------------------------------------------
# ostinato (consensus motif across series)
# ---------------------------------------------------------------------------

def ostinato(Ts: list[np.ndarray], m: int, normalize: bool = True,
             p: float = 2.0):
    """Consensus motif: subsequence minimizing the max nearest-neighbor
    distance to every other series (ostinato.py:148-278, with the sorted-MP
    early-abandon ordering).  ``normalize=False`` is the aamp_ostinato
    twin (stumpy/ostinato.py non-normalized reroute).

    Returns (radius, series_idx, subseq_idx).
    """
    best_rad = np.inf
    best_ts = -1
    best_idx = -1
    kcount = len(Ts)
    for j in range(kcount):
        h = (j + 1) % kcount
        if normalize:
            P = kernels.matrix_profile(Ts[j], m, T_B=Ts[h])[0][:, 0]
        else:
            P = kernels.matrix_profile_absolute(
                Ts[j], m, T_B=Ts[h], p=p)[0][:, 0]
        order = np.argsort(P, kind="stable")
        for q in order:
            if P[q] >= best_rad:
                break                      # early abandon
            radius = float(P[q])
            Q = Ts[j][q:q + m]
            ok = True
            for g in range(kcount):
                if g in (j, h):
                    continue
                if normalize:
                    d = float(np.min(kernels.mass(Q, Ts[g])))
                else:
                    d = float(np.min(kernels.mass_absolute(Q, Ts[g], p=p)))
                radius = max(radius, d)
                if radius >= best_rad:
                    ok = False
                    break
            if ok and radius < best_rad:
                best_rad = radius
                best_ts = j
                best_idx = int(q)
    return best_rad, best_ts, best_idx


# ---------------------------------------------------------------------------
# pan matrix profile (stimp)
# ---------------------------------------------------------------------------

def stimp_pan(T, m_values, normalize: bool = True, p: float = 2.0):
    """Matrix profile per window size (the pan-MP rows the reference fills
    in BFS order, stimp.py:42-121).  Returns {m: P_top1}."""
    out = {}
    for m in m_values:
        if len(T) < 2 * m:
            continue
        if normalize:
            P = kernels.matrix_profile(T, m)[0][:, 0]
        else:
            P = kernels.matrix_profile_absolute(T, m, p=p)[0][:, 0]
        out[int(m)] = P
    return out


def pan_transform(pan: dict[int, np.ndarray], M: list[int], width: int,
                  threshold: float = 0.2, normalize: bool = True,
                  contrast: bool = True, binary: bool = True,
                  clip: bool = True) -> np.ndarray:
    """Transformed pan matrix profile (contract of stimp.py:272-330 +
    core.py:3214-3273): per-row 1/(2 sqrt(m)) normalization capped at 1,
    global rank-percentile sigmoid contrast centered on ``threshold``,
    binarization at ``threshold``, clip to [0, 1], then the "blocky"
    downward repeat of computed rows over not-yet-computed ones.

    ``pan`` maps window size -> top-1 profile (the processed subset),
    ``M`` is the full sorted window-size list (rows of the output),
    ``width`` the profile width at the smallest window.
    """
    M = sorted(M)
    n_rows = len(M)
    PAN = np.full((n_rows, width), np.inf)
    row_of = {m: r for r, m in enumerate(M)}
    idx = np.array(sorted(row_of[m] for m in pan), dtype=np.int64)
    ms_proc = np.array([M[r] for r in idx], dtype=np.int64)
    for m, P in pan.items():
        PAN[row_of[m], :len(P)] = P
    PAN[PAN == np.inf] = np.nan

    if normalize:
        norm = 1.0 / (2.0 * np.sqrt(ms_proc))
        PAN[idx] = np.minimum(1.0, PAN[idx] * norm[:, None])
    if contrast and len(idx):
        l = len(idx) * width
        tmp = PAN[idx].argsort(kind="mergesort", axis=None)
        ranks = np.empty(l, dtype=np.int64)
        ranks[tmp] = np.arange(l)
        percentile = np.linspace(0, 1, l)[ranks].reshape(PAN[idx].shape)
        PAN[idx] = 1.0 / (1.0 + np.exp(-10 * (percentile - threshold)))
    if binary:
        PAN[idx] = np.where(PAN[idx] <= threshold, 0.0, 1.0)
    if clip:
        PAN[idx] = np.clip(PAN[idx], 0.0, 1.0)

    # blocky repeat: each computed row fills the uncomputed rows above it
    if len(idx):
        nrepeat = np.diff(np.append(-1, idx))
        PAN[:nrepeat.sum()] = np.repeat(PAN[idx], nrepeat, axis=0)
        if np.isnan(PAN).any() and not np.isnan(PAN).all():
            PAN[np.isnan(PAN)] = np.nanmax(PAN)
    return PAN


def bfs_order(values: list[int]) -> list[int]:
    """Level-order traversal of the sorted values (core.py:3072-3211):
    midpoint first, then midpoints of halves — anytime convergence order."""
    values = sorted(values)
    out: list[int] = []
    queue = [(0, len(values) - 1)]
    while queue:
        lo, hi = queue.pop(0)
        if lo > hi:
            continue
        mid = (lo + hi) // 2
        out.append(values[mid])
        queue.append((lo, mid - 1))
        queue.append((mid + 1, hi))
    return out
