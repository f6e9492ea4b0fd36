/* Fused top-1 self-join matrix-profile kernel for integer series.
 *
 * Single-pass diagonal STOMP over blocks of K consecutive diagonals:
 * QT along diagonal d evolves by the exact recurrence
 *     QT[i,d] = QT[i-1,d] + T[i+m-1]*T[i+d+m-1] - T[i-1]*T[i+d-1]
 * (reference stomp.py:146-149).  Eligibility is checked here with the
 * same gate as kernels._qt_recurrence_ok: all values integral, finite,
 * |T| <= 2^25 and m*max^2 < 2^52, so every partial dot product is an
 * exactly-representable float64 integer — the recurrence is drift-free
 * by construction, and the result is bit-identical to the numpy
 * diagonal kernel (_mp_top1_diag), whose arithmetic this file mirrors
 * operation-for-operation (compile with -ffp-contract=off so no FMA
 * contraction changes the rounding route):
 *
 *   stats   : float64 sequential cumsums, mu = ws/m,
 *             var = ws2/m - mu*mu (clamped >= 0), sig = sqrt(var)
 *   scale   : negfac = -2/sig, rsig = 1/sig,
 *             gvec = -(m*mu)*negfac, murs = mu*rsig
 *   cell    : E = (QT*negfac[i])*rsig[j] + murs[j]*gvec[i]
 *             (the shifted squared distance D^2 - 2m of
 *             _QTProvider.xdist), snapped to exactly -2m below
 *             P_NORM_THRESHOLD - 2m
 *   minima  : right side (row i, neighbors j > i): strict < keeps the
 *             smallest j on ties (candidates arrive ascending j);
 *             left side (column j, neighbors i < j): explicit
 *             (E < pl) || (E == pl && i < il) keeps the smallest i on
 *             ties regardless of arrival order — the same net tie rule
 *             as the numpy kernel's reversed-argmin + <= update.
 *
 * Series with any constant window (sig == 0) or non-integer /
 * non-finite values return a nonzero status and the caller falls back
 * to the numpy paths (which carry the full special-case contract).
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

#define K 8

/* status: 0 = done; 1 = ineligible (non-finite / non-integral /
 * magnitude bound); 2 = constant window (sig == 0) present;
 * 3 = allocation failure. */
int mp_top1_self_int(const double *restrict T, int64_t n, int64_t m,
                     int64_t ez, double p_norm_threshold,
                     double *restrict pr, int64_t *restrict ir,
                     double *restrict pl, int64_t *restrict il)
{
    int64_t l = n - m + 1;
    if (l < 1 || m < 1)
        return 1;

    /* eligibility scan (same gate as kernels._qt_recurrence_ok) */
    double mx = 0.0;
    for (int64_t i = 0; i < n; i++) {
        double v = T[i];
        if (!isfinite(v) || v != floor(v))
            return 1;
        double a = fabs(v);
        if (a > mx)
            mx = a;
    }
    if (mx > 33554432.0)                            /* 2^25 */
        return 1;
    if ((double)m * mx * mx > 4503599627370496.0)   /* 2^52 */
        return 1;

    const double dm = (double)m;
    const double twom = 2.0 * dm;
    const double thr = p_norm_threshold - twom;

    for (int64_t i = 0; i < l; i++) {
        pr[i] = INFINITY;
        ir[i] = -1;
        pl[i] = INFINITY;
        il[i] = -1;
    }

    /* window stats from float64 sequential cumsums (bit-identical to
     * numpy's sliding_mean_std on this data) */
    double *buf = malloc((size_t)(2 * (n + 1) + 4 * l) * sizeof(double));
    if (buf == NULL)
        return 3;
    double *cs = buf;                 /* n + 1 */
    double *cs2 = buf + (n + 1);      /* n + 1 */
    double *negfac = cs2 + (n + 1);   /* l */
    double *rsig = negfac + l;        /* l */
    double *gvec = rsig + l;          /* l */
    double *murs = gvec + l;          /* l */
    cs[0] = 0.0;
    cs2[0] = 0.0;
    double a1 = 0.0, a2 = 0.0;
    for (int64_t i = 0; i < n; i++) {
        a1 += T[i];
        a2 += T[i] * T[i];
        cs[i + 1] = a1;
        cs2[i + 1] = a2;
    }
    for (int64_t i = 0; i < l; i++) {
        double mu = (cs[i + m] - cs[i]) / dm;
        double var = (cs2[i + m] - cs2[i]) / dm - mu * mu;
        if (var < 0.0)
            var = 0.0;
        double sig = sqrt(var);
        if (sig == 0.0) {             /* constant window: fall back */
            free(buf);
            return 2;
        }
        double nf = -2.0 / sig;
        negfac[i] = nf;
        rsig[i] = 1.0 / sig;
        gvec[i] = (-(dm * mu)) * nf;
        murs[i] = mu * rsig[i];
    }

    double qt[K];
    double e[K];
    for (int64_t d0 = ez + 1; d0 < l; d0 += K) {
        int kb = (int)((l - d0) < K ? (l - d0) : K);
        /* block head: QT[0, d] = T[0:m] . T[d:d+m], exact integer sums */
        for (int k = 0; k < kb; k++) {
            const double *Td = T + d0 + k;
            double s = 0.0;
            for (int64_t t = 0; t < m; t++)
                s += T[t] * Td[t];
            qt[k] = s;
        }
        /* full region: all kb lanes alive for i < Lfull */
        int64_t Lfull = l - d0 - (kb - 1);
        if (kb == K) {
#if defined(__AVX512F__)
            /* one zmm register per quantity; every arithmetic op is a
             * per-lane IEEE mul/sub/add (no FMA), so lane values are
             * bit-identical to the scalar/Numpy route */
            __m512d qtv = _mm512_loadu_pd(qt);
            const __m512d thrv = _mm512_set1_pd(thr);
            const __m512d ntwomv = _mm512_set1_pd(-twom);
            for (int64_t i = 0; i < Lfull; i++) {
                if (i > 0) {
                    __m512d ta = _mm512_set1_pd(T[i + m - 1]);
                    __m512d ts = _mm512_set1_pd(T[i - 1]);
                    __m512d Ta = _mm512_loadu_pd(T + i + d0 + m - 1);
                    __m512d Ts = _mm512_loadu_pd(T + i + d0 - 1);
                    qtv = _mm512_add_pd(
                        qtv,
                        _mm512_sub_pd(_mm512_mul_pd(ta, Ta),
                                      _mm512_mul_pd(ts, Ts)));
                }
                int64_t j0 = i + d0;
                __m512d nf = _mm512_set1_pd(negfac[i]);
                __m512d gv = _mm512_set1_pd(gvec[i]);
                __m512d rs = _mm512_loadu_pd(rsig + j0);
                __m512d mr = _mm512_loadu_pd(murs + j0);
                __m512d ev = _mm512_add_pd(
                    _mm512_mul_pd(_mm512_mul_pd(qtv, nf), rs),
                    _mm512_mul_pd(mr, gv));
                __mmask8 snap = _mm512_cmp_pd_mask(ev, thrv, _CMP_LT_OQ);
                ev = _mm512_mask_blend_pd(snap, ev, ntwomv);
                /* col side: (e < pl) | (e == pl & i < il) */
                __m512d plv = _mm512_loadu_pd(pl + j0);
                __m512i ilv = _mm512_loadu_si512(il + j0);
                __m512i iv = _mm512_set1_epi64(i);
                __mmask8 lt = _mm512_cmp_pd_mask(ev, plv, _CMP_LT_OQ);
                __mmask8 eq = _mm512_cmp_pd_mask(ev, plv, _CMP_EQ_OQ);
                __mmask8 ilt = _mm512_cmplt_epi64_mask(iv, ilv);
                __mmask8 take = lt | (eq & ilt);
                _mm512_mask_storeu_pd(pl + j0, take, ev);
                _mm512_mask_storeu_epi64(il + j0, take, iv);
                /* row side: min lane, lowest lane index on ties */
                double emin = _mm512_reduce_min_pd(ev);
                if (emin < pr[i]) {
                    __mmask8 em = _mm512_cmp_pd_mask(
                        ev, _mm512_set1_pd(emin), _CMP_EQ_OQ);
                    pr[i] = emin;
                    ir[i] = j0 + __builtin_ctz((unsigned)em);
                }
            }
            _mm512_storeu_pd(qt, qtv);
#else
            for (int64_t i = 0; i < Lfull; i++) {
                if (i > 0) {
                    double ta = T[i + m - 1], ts = T[i - 1];
                    const double *Ta = T + i + d0 + m - 1;
                    const double *Ts = T + i + d0 - 1;
                    for (int k = 0; k < K; k++)
                        qt[k] += ta * Ta[k] - ts * Ts[k];
                }
                int64_t j0 = i + d0;
                double nf = negfac[i], gv = gvec[i];
                const double *rs = rsig + j0;
                const double *mr = murs + j0;
                for (int k = 0; k < K; k++) {
                    double v = (qt[k] * nf) * rs[k] + mr[k] * gv;
                    e[k] = (v < thr) ? -twom : v;
                }
                double *plj = pl + j0;
                int64_t *ilj = il + j0;
                for (int k = 0; k < K; k++) {
                    double v = e[k];
                    int take = (v < plj[k]) |
                               ((v == plj[k]) & (i < ilj[k]));
                    plj[k] = take ? v : plj[k];
                    ilj[k] = take ? i : ilj[k];
                }
                double emin = e[0];
                int kmin = 0;
                for (int k = 1; k < K; k++)
                    if (e[k] < emin) {
                        emin = e[k];
                        kmin = k;
                    }
                if (emin < pr[i]) {
                    pr[i] = emin;
                    ir[i] = j0 + kmin;
                }
            }
#endif
        } else {
            for (int64_t i = 0; i < Lfull; i++) {
                if (i > 0) {
                    double ta = T[i + m - 1], ts = T[i - 1];
                    const double *Ta = T + i + d0 + m - 1;
                    const double *Ts = T + i + d0 - 1;
                    for (int k = 0; k < kb; k++)
                        qt[k] += ta * Ta[k] - ts * Ts[k];
                }
                int64_t j0 = i + d0;
                double nf = negfac[i], gv = gvec[i];
                for (int k = 0; k < kb; k++) {
                    double v = (qt[k] * nf) * rsig[j0 + k]
                               + murs[j0 + k] * gv;
                    e[k] = (v < thr) ? -twom : v;
                }
                for (int k = 0; k < kb; k++) {
                    int64_t j = j0 + k;
                    double v = e[k];
                    if (v < pl[j] || (v == pl[j] && i < il[j])) {
                        pl[j] = v;
                        il[j] = i;
                    }
                }
                double emin = e[0];
                int kmin = 0;
                for (int k = 1; k < kb; k++)
                    if (e[k] < emin) {
                        emin = e[k];
                        kmin = k;
                    }
                if (emin < pr[i]) {
                    pr[i] = emin;
                    ir[i] = j0 + kmin;
                }
            }
        }
        /* ragged tail: lane k continues alone for i in [Lfull, l-d0-k);
         * processed in ascending k so row-side candidates stay in
         * ascending-j order (strict < keeps the smallest j on ties) */
        for (int k = 0; k < kb; k++) {
            int64_t Lk = l - d0 - k;
            double q = qt[k];
            for (int64_t i = Lfull; i < Lk; i++) {
                q += T[i + m - 1] * T[i + d0 + k + m - 1]
                     - T[i - 1] * T[i + d0 + k - 1];
                int64_t j = i + d0 + k;
                double v = (q * negfac[i]) * rsig[j] + murs[j] * gvec[i];
                if (v < thr)
                    v = -twom;
                if (v < pl[j] || (v == pl[j] && i < il[j])) {
                    pl[j] = v;
                    il[j] = i;
                }
                if (v < pr[i]) {
                    pr[i] = v;
                    ir[i] = j;
                }
            }
        }
    }
    free(buf);
    return 0;
}
