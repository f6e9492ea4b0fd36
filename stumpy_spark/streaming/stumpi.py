"""Incremental (streaming) matrix profile.

:class:`StumpiState` is the pure state machine — semantics of the
reference's ``stumpi`` with ``egress=True`` (stumpy/stumpi.py:18-367): a
fixed-length ring window over the stream; each appended point updates the
profile in O(n) via the sliding-dot-product diagonal recurrence
(stumpy/stumpi.py:341-342) and an elementwise-min profile update
(core.py:4448-4511).  ``P``/``I`` carry the *incremental* semantics: best
neighbor seen while both subsequences were inside the sliding history (the
same contract the reference's naive ``stumpi_egress`` oracle checks).

:func:`stumpi_stream` wires the state machine into Structured Streaming via
``applyInPandasWithState`` keyed by ``doc_id`` — state = the serialized
arrays, egress ≡ bounded state size.  One key's updates are sequential;
throughput scales across keys (sequences), which is the engine's unit of
parallelism everywhere else too.
"""

from __future__ import annotations

import numpy as np

from .. import kernels


class GrowingStumpiState:
    """Incremental top-1 matrix profile, growing mode (egress=False) —
    the reference's default ``stumpi`` behavior (stumpy/stumpi.py:369-443):
    the history is retained, the profile gains one row per appended point,
    and indices are absolute stream positions.  After any number of
    appends, ``P``/``I`` equal the batch ``matrix_profile`` of the full
    series exactly (every (i, j) pair is offered as a candidate exactly
    once: at initialization or when the later window appears)."""

    def __init__(self, T: np.ndarray, m: int):
        T = np.asarray(T, dtype=np.float64)
        self.m = m
        self.T = list(map(float, T))
        P, I, IL, IR, PL, PR = kernels.matrix_profile(
            T, m, return_left_right_P=True)
        self.P = P[:, 0].copy()
        self.I = I[:, 0].copy()
        self.left_P = PL.copy()
        self.left_I = IL.copy()
        self.QT = kernels.sliding_dot_product(T[-m:], T)

    @property
    def P_(self):
        return self.P

    @property
    def I_(self):
        return self.I

    @property
    def left_I_(self):
        return self.left_I

    def update(self, t: float) -> None:
        """Append one point; the profile grows by one row."""
        m = self.m
        self.T.append(float(t))
        T = np.asarray(self.T)
        n = len(T)
        l = n - m + 1                       # window count after append
        # grow the QT recurrence: new query window = T[n-m:n]
        QT_new = np.empty(l)
        QT_new[1:] = self.QT - T[:l - 1] * T[n - m - 1] + T[m:n] * t
        QT_new[0] = float(T[:m] @ T[n - m:])
        self.QT = QT_new
        _, M_T, Sigma_T, isfinite_w, isconstant = kernels.preprocess(T, m)
        D2 = kernels.squared_distance_profile(
            self.QT, M_T[-1], Sigma_T[-1], M_T, Sigma_T, m,
            bool(isconstant[-1]), isconstant, bool(isfinite_w[-1]),
            isfinite_w)
        D = np.sqrt(kernels.snap_to_zero(D2))
        kernels.apply_exclusion_zone(D, l - 1, np.inf,
                                     kernels.excl_zone(m))
        improved = D[:l - 1] < self.P
        self.P = np.where(improved, D[:l - 1], self.P)
        self.I = np.where(improved, l - 1, self.I)
        finite = np.isfinite(D)
        if finite.any():
            j = int(np.argmin(np.where(finite, D, np.inf)))
            new_p, new_i = D[j], j
        else:
            new_p, new_i = np.inf, -1
        self.P = np.append(self.P, new_p)
        self.I = np.append(self.I, new_i)
        self.left_P = np.append(self.left_P, new_p)
        self.left_I = np.append(self.left_I, new_i)


class StumpiState:
    """Incremental top-1 matrix profile with egress over one sequence.

    Documented deviation from the reference's egress indexing
    (stumpy/stumpi.py:290-367): the reference keeps absolute stream
    indices that may point at already-egressed points; this state keeps
    window-relative indices (shifted on every slide) and reports dropped
    neighbors as -1 — chosen so ``I_`` never references data the caller
    can no longer see.  Use :class:`GrowingStumpiState` for the absolute
    (egress=False) contract."""

    def __init__(self, T: np.ndarray, m: int):
        T = np.asarray(T, dtype=np.float64)
        self.m = m
        self.n = len(T)
        self.T = T.copy()
        P, I, IL, IR, PL, PR = kernels.matrix_profile(
            T, m, return_left_right_P=True)
        self.P = P[:, 0].copy()
        self.I = I[:, 0].copy()
        self.left_P = PL.copy()
        self.left_I = IL.copy()
        # QT of the last window vs all windows (seed for the recurrence)
        self.QT = kernels.sliding_dot_product(T[-m:], T)
        self.n_appended = 0

    # -- absolute-index accessors ------------------------------------------
    @property
    def P_(self):
        return self.P

    @property
    def I_(self):
        return np.where(self.I >= 0, self.I + self.n_appended, -1)

    @property
    def left_I_(self):
        return np.where(self.left_I >= 0,
                        self.left_I + self.n_appended, -1)

    def update(self, t: float) -> None:
        """Append one point; slide the window (egress)."""
        m, n = self.m, self.n
        l = n - m + 1
        T = self.T
        t_drop = T[n - m]        # first element of the old query window
        # diagonal recurrence (same index — both query and window shift
        # by one): QT_new[i] = QT_old[i] - t_drop*T_old[i] + t*T_old[i+m]
        QT_new = np.empty(l)
        QT_new[:l - 1] = (self.QT[:l - 1] - T[:l - 1] * t_drop
                          + T[m:n] * t)
        # ring-shift the window
        T[:-1] = T[1:]
        T[-1] = t
        QT_new[l - 1] = float(T[-m:] @ T[-m:])
        self.QT = QT_new
        self.n_appended += 1
        # shift profiles left; new slot opens at the end
        self.P[:-1] = self.P[1:]
        self.I[:-1] = self.I[1:] - 1
        self.left_P[:-1] = self.left_P[1:]
        self.left_I[:-1] = self.left_I[1:] - 1
        # distance profile of the new last window vs all windows
        _, M_T, Sigma_T, isfinite_w, isconstant = kernels.preprocess(T, m)
        Q = T[-m:]
        mu_Q, sigma_Q = M_T[-1], Sigma_T[-1]
        D2 = kernels.squared_distance_profile(
            self.QT, mu_Q, sigma_Q, M_T, Sigma_T, m,
            bool(isconstant[-1]), isconstant, bool(isfinite_w[-1]),
            isfinite_w)
        D = np.sqrt(kernels.snap_to_zero(D2))
        kernels.apply_exclusion_zone(D, l - 1, np.inf,
                                     kernels.excl_zone(m))
        # elementwise-min merge into the shifted profile rows
        improved = D[:l - 1] < self.P[:l - 1]
        self.P[:l - 1] = np.where(improved, D[:l - 1], self.P[:l - 1])
        self.I[:l - 1] = np.where(improved, l - 1, self.I[:l - 1])
        # dropped-neighbor indices (< 0 after shift) are kept as the
        # incremental contract: value stays, index reports -1 + offset
        # new last row: min over its own distance profile
        finite = np.isfinite(D)
        if finite.any():
            j = int(np.argmin(np.where(finite, D, np.inf)))
            self.P[l - 1] = D[j]
            self.I[l - 1] = j
            # left = all j < l-1, which is everything valid here
            self.left_P[l - 1] = D[j]
            self.left_I[l - 1] = j
        else:
            self.P[l - 1] = np.inf
            self.I[l - 1] = -1
            self.left_P[l - 1] = np.inf
            self.left_I[l - 1] = -1

    # -- serialization for applyInPandasWithState --------------------------
    def to_tuple(self):
        return (self.m, self.n, self.n_appended,
                self.T.tolist(), self.P.tolist(), self.I.tolist(),
                self.left_P.tolist(), self.left_I.tolist(),
                self.QT.tolist())

    @classmethod
    def from_tuple(cls, tup):
        obj = cls.__new__(cls)
        (obj.m, obj.n, obj.n_appended, T, P, I, lP, lI, QT) = tup
        obj.T = np.asarray(T, dtype=np.float64)
        obj.P = np.asarray(P, dtype=np.float64)
        obj.I = np.asarray(I, dtype=np.int64)
        obj.left_P = np.asarray(lP, dtype=np.float64)
        obj.left_I = np.asarray(lI, dtype=np.int64)
        obj.QT = np.asarray(QT, dtype=np.float64)
        return obj


def stumpi_stream(stream_df, m: int, window_n: int,
                  timeout_ms: int = 60000, normalize: bool = True):
    """Wire StumpiState (or AampiState when ``normalize=False`` — the
    aampi reroute) into Structured Streaming.

    ``stream_df`` must be a streaming DataFrame with columns
    ``(doc_id string, pos long, value double)``; rows for a doc must arrive
    in ``pos`` order within a batch (cross-batch ordering is the source's
    responsibility, e.g. Kafka per-key ordering).  Emits one row per
    processed batch per key with the current profile arrays.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("P", T.ArrayType(T.DoubleType())),
        T.StructField("I", T.ArrayType(T.LongType())),
    ])
    state_schema = T.StructType([
        T.StructField("m", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("n_appended", T.IntegerType()),
        T.StructField("T", T.ArrayType(T.DoubleType())),
        T.StructField("P", T.ArrayType(T.DoubleType())),
        T.StructField("I", T.ArrayType(T.LongType())),
        T.StructField("left_P", T.ArrayType(T.DoubleType())),
        T.StructField("left_I", T.ArrayType(T.LongType())),
        T.StructField("QT", T.ArrayType(T.DoubleType())),
        T.StructField("buf", T.ArrayType(T.DoubleType())),
    ])

    if normalize:
        state_cls = StumpiState
    else:
        from .floss import AampiState as state_cls  # noqa: N813

    def fn(key, pdfs, state: GroupState):
        doc_id = key[0]
        vals = []
        for pdf in pdfs:
            pdf = pdf.sort_values("pos")
            vals.extend(float(v) for v in pdf["value"])
        if state.exists:
            (sm, sn, napp, sT, sP, sI, slP, slI, sQT, buf) = state.get
            # an empty stored T is the pre-initialization placeholder
            # (first window still accumulating across micro-batches) —
            # rehydrating it as a live state would crash update()
            st = (state_cls.from_tuple(
                (sm, sn, napp, sT, sP, sI, slP, slI, sQT))
                if sT is not None and len(sT) else None)
            buf = list(buf)
        else:
            st, buf = None, []
        buf.extend(vals)
        if st is None and len(buf) >= window_n:
            st = state_cls(np.asarray(buf[:window_n]), m)
            buf = buf[window_n:]
        if st is not None:
            for v in buf:
                st.update(v)
            buf = []
        if st is not None:
            tup = st.to_tuple()
            state.update((tup[0], tup[1], tup[2], tup[3], tup[4],
                          [int(x) for x in tup[5]], tup[6],
                          [int(x) for x in tup[7]], tup[8], buf))
            n_seen = st.n + st.n_appended
            yield pd.DataFrame({"doc_id": [doc_id], "n_seen": [n_seen],
                                "P": [list(st.P_)],
                                "I": [[int(x) for x in st.I_]]})
        else:
            state.update((m, window_n, 0, [], [], [], [], [], [], buf))
            yield pd.DataFrame({"doc_id": [doc_id], "n_seen": [len(buf)],
                                "P": [[]], "I": [[]]})

    return (stream_df.groupBy("doc_id")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
