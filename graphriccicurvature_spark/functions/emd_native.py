"""C-compiled exact EMD solver (ctypes), with numpy fallback.

The reference's ``ot.emd2`` is C++ network simplex; our pure-numpy SSP
solver (functions/emd.py) is exact but ~18 ms per 33x33 problem — numpy
micro-call overhead, not algorithm. This module compiles the *same verified
algorithm* (successive shortest paths with potentials, line-for-line mirror
of emd.py) to a shared library with the system compiler at import time and
exposes a batched entry point so one ctypes call solves a whole Arrow batch.
~100x faster per problem; falls back to the numpy solver when no compiler
is available. Tested for exact agreement with the numpy solver in
tests/test_kernels.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdlib.h>
#include <string.h>

#define INF (1.0/0.0)

/* Successive-shortest-path exact transportation solve.
   Mirrors graphriccicurvature_spark/functions/emd.py. Work arrays are
   caller-provided so batch callers can reuse them. Returns optimal cost. */
static double emd_one(int m, int n,
                      const double* a, const double* b, const double* M,
                      double* f, double* sup, double* dem,
                      double* phi, double* psi, double* dL, double* dR,
                      long* parL, long* parR, char* visL, char* visR)
{
    const double TOL = 1e-12;
    int i, j, p;
    double total = 0.0, suma = 0.0, sumb = 0.0, moved = 0.0;

    if (m == 0 || n == 0) return 0.0;
    memcpy(sup, a, m * sizeof(double));
    memcpy(dem, b, n * sizeof(double));
    memset(f, 0, (size_t)m * n * sizeof(double));
    memset(phi, 0, m * sizeof(double));
    memset(psi, 0, n * sizeof(double));
    for (i = 0; i < m; i++) suma += a[i];
    for (j = 0; j < n; j++) sumb += b[j];
    total = suma < sumb ? suma : sumb;

    int max_phases = 8 * (m + n) + 64;
    for (p = 0; p < max_phases; p++) {
        if (total - moved <= TOL * (total > 1.0 ? total : 1.0)) break;
        /* multi-source Dijkstra over the bipartite residual graph */
        for (i = 0; i < m; i++) { dL[i] = sup[i] > TOL ? 0.0 : INF; visL[i] = 0; parL[i] = -1; }
        for (j = 0; j < n; j++) { dR[j] = INF; visR[j] = 0; parR[j] = -1; }
        int jstar = -1;
        for (;;) {
            int iL = -1, jR = -1;
            double vL = INF, vR = INF;
            for (i = 0; i < m; i++) if (!visL[i] && dL[i] < vL) { vL = dL[i]; iL = i; }
            for (j = 0; j < n; j++) if (!visR[j] && dR[j] < vR) { vR = dR[j]; jR = j; }
            if (vL == INF && vR == INF) break;
            if (vR <= vL) {
                visR[jR] = 1;
                if (dem[jR] > TOL) { jstar = jR; break; }
                /* relax backward arcs j -> i where f[i][j] > 0 (reduced cost 0) */
                for (i = 0; i < m; i++) {
                    if (!visL[i] && f[(size_t)i * n + jR] > TOL && vR < dL[i]) {
                        dL[i] = vR; parL[i] = jR;
                    }
                }
            } else {
                visL[iL] = 1;
                const double* Mi = M + (size_t)iL * n;
                double base = vL - phi[iL];
                for (j = 0; j < n; j++) {
                    if (visR[j]) continue;
                    double c = Mi[j] - psi[j] + base; /* vL + reduced cost */
                    double cr = c - vL;               /* clamp float noise */
                    if (cr < 0.0) c = vL;
                    if (c < dR[j]) { dR[j] = c; parR[j] = iL; }
                }
            }
        }
        if (jstar < 0) break;
        double D = dR[jstar];
        /* potential update (Johnson), clamped at D */
        for (i = 0; i < m; i++) phi[i] -= (dL[i] < D ? dL[i] : D);
        for (j = 0; j < n; j++) psi[j] += (dR[j] < D ? dR[j] : D);
        /* trace augmenting path, find bottleneck */
        double amt = dem[jstar];
        long src_i = -1;
        { /* first pass: bottleneck */
            long jj = jstar;
            for (;;) {
                long ii = parR[jj];
                long pj = parL[ii];
                if (pj == -1) { src_i = ii; break; }
                if (f[(size_t)ii * n + pj] < amt) amt = f[(size_t)ii * n + pj];
                jj = pj;
            }
        }
        if (sup[src_i] < amt) amt = sup[src_i];
        if (amt <= TOL) break;
        { /* second pass: apply */
            long jj = jstar;
            for (;;) {
                long ii = parR[jj];
                f[(size_t)ii * n + jj] += amt;
                long pj = parL[ii];
                if (pj == -1) break;
                f[(size_t)ii * n + pj] -= amt;
                jj = pj;
            }
        }
        sup[src_i] -= amt;
        dem[jstar] -= amt;
        moved += amt;
    }
    /* infeasible (disconnected residual, e.g. inf costs): surface it
       instead of returning a partial-flow cost (mirror of emd.py) */
    if (total - moved > 1e-9 * (total > 1.0 ? total : 1.0)) return INF;
    {
        double cost = 0.0;
        for (i = 0; i < m; i++)
            for (j = 0; j < n; j++) cost += f[(size_t)i * n + j] * M[(size_t)i * n + j];
        return cost;
    }
}

/* in-place dense Floyd-Warshall on an n x n row-major matrix */
void floyd_warshall(long n, double* D)
{
    for (long k = 0; k < n; k++) {
        const double* Dk = D + k * n;
        for (long i = 0; i < n; i++) {
            double dik = D[i * n + k];
            if (dik == INF) continue;
            double* Di = D + i * n;
            for (long j = 0; j < n; j++) {
                double via = dik + Dk[j];
                if (via < Di[j]) Di[j] = via;
            }
        }
    }
}

/* ---------------------------------------------------------------------- */
/* Ego-partition batch solve: the whole per-edge loop of                   */
/* ollivier._solve_ego_cogroup in one native call per cogroup partition.   */
/* Mirrors the numpy reference loop value-for-value (same FW code as the   */
/* python path's apsp, same EMD solver, same distribution/clamp algebra);  */
/* Sinkhorn-routed edges write their (x, y, cost-matrix) problem into      */
/* caller-preallocated flat buffers for the python batched Sinkhorn.       */

#include <math.h>

static int cmp_long(const void* a, const void* b)
{
    long x = *(const long*)a, y = *(const long*)b;
    return x < y ? -1 : (x > y ? 1 : 0);
}

static long sort_unique(long* a, long n)
{
    if (n <= 1) return n;
    qsort(a, (size_t)n, sizeof(long), cmp_long);
    long w = 1;
    for (long i = 1; i < n; i++)
        if (a[i] != a[w - 1]) a[w++] = a[i];
    return w;
}

/* index of key in sorted array a[0..n), or -1 */
static long bfind(const long* a, long n, long key)
{
    long lo = 0, hi = n - 1;
    while (lo <= hi) {
        long mid = (lo + hi) >> 1;
        if (a[mid] < key) lo = mid + 1;
        else if (a[mid] > key) hi = mid - 1;
        else return mid;
    }
    return -1;
}

/* replace non-finite entries with the max finite entry (or fallback);
   returns number replaced — mirror of ollivier._clamp_nonfinite */
static long clamp_nonfinite(double* d, long sz, double fallback)
{
    double mx = -INF;
    long bad = 0;
    for (long i = 0; i < sz; i++) {
        if (isfinite(d[i])) { if (d[i] > mx) mx = d[i]; }
        else bad++;
    }
    if (!bad) return 0;
    double v = (mx == -INF) ? fallback : mx;
    for (long i = 0; i < sz; i++)
        if (!isfinite(d[i])) d[i] = v;
    return bad;
}

typedef struct { double t; long idx; } tpair;

/* sort by (t desc, idx desc): the reference's bounded-heap tie-break
   (OllivierRicci.py:85-92 — larger key wins ties) */
static int cmp_tpair(const void* a, const void* b)
{
    const tpair* p = (const tpair*)a;
    const tpair* q = (const tpair*)b;
    if (p->t > q->t) return -1;
    if (p->t < q->t) return 1;
    if (p->idx > q->idx) return -1;
    if (p->idx < q->idx) return 1;
    return 0;
}

/* neighbor mass distribution (localgraph.node_distribution):
   writes masses to x[0..m) and LOCAL support indices to xs[0..m);
   nbl[] are the local (permuted) indices of the neighbors. Returns m. */
static long node_dist(long self_local, const long* nbl, const double* w_e,
                      long n_nb, double alpha, double base_, double expp,
                      long topk, double* x, long* xs, tpair* scratch)
{
    const double EPS = 1e-7;
    if (n_nb == 0) { x[0] = 1.0; xs[0] = self_local; return 1; }
    long kept = n_nb;
    if (n_nb > topk) {
        for (long j = 0; j < n_nb; j++) {
            scratch[j].t = pow(base_, -pow(w_e[j], expp));
            scratch[j].idx = nbl[j];
        }
        qsort(scratch, (size_t)n_nb, sizeof(tpair), cmp_tpair);
        kept = topk;
        double s = 0.0;
        for (long j = 0; j < kept; j++) s += scratch[j].t;
        if (s > EPS)
            for (long j = 0; j < kept; j++) x[j] = (1.0 - alpha) * scratch[j].t / s;
        else
            for (long j = 0; j < kept; j++) x[j] = (1.0 - alpha) / (double)kept;
        for (long j = 0; j < kept; j++) xs[j] = scratch[j].idx;
    } else {
        double s = 0.0;
        for (long j = 0; j < n_nb; j++) {
            x[j] = pow(base_, -pow(w_e[j], expp));
            s += x[j];
        }
        if (s > EPS)
            for (long j = 0; j < n_nb; j++) x[j] = (1.0 - alpha) * x[j] / s;
        else
            for (long j = 0; j < n_nb; j++) x[j] = (1.0 - alpha) / (double)n_nb;
        for (long j = 0; j < n_nb; j++) xs[j] = nbl[j];
    }
    x[kept] = alpha;
    xs[kept] = self_local;
    return kept + 1;
}

/* methods: 0=OTD 1=ATD 2=Sinkhorn 3=OTDSinkhornMix (routing decided by
   caller via route[]: 1 = write Sinkhorn problem, 0 = solve here) */
void ego_solve_batch(
    long n_rows, const long* src,
    const long* s_off, const long* s_vals,
    const long* sw_off, const double* sw_vals,
    const long* t_off,
    long n_edges, const long* t_dst, const double* t_w,
    const long* tn_off, const long* tn_vals,
    const long* tw_off, const double* tw_vals,
    long n_mem, const long* sm,
    const long* row_start, const long* row_len, const long* wrow_start,
    const long* nb_vals, const double* ws_vals,
    int directed, int method, double alpha, double base_, double exp_power,
    long nbr_topk,
    const signed char* route, const long* sk_slot,
    double* skx, const long* skx_off,
    double* sky, const long* sky_off,
    double* skd, const long* skd_off,
    double* out_kappa, long* n_clamped)
{
    const double EPS = 1e-7; /* localgraph.EPSILON */
    /* pass 1: allocation bounds */
    long max_em = 2, max_bm = 1, max_slen = 0, max_tlen = 0;
    for (long r = 0; r < n_rows; r++) {
        long slen = s_off[r + 1] - s_off[r];
        if (slen > max_slen) max_slen = slen;
        long bsz = 1 + slen;
        for (long k = t_off[r]; k < t_off[r + 1]; k++) {
            long tlen = tn_off[k + 1] - tn_off[k];
            if (tlen > max_tlen) max_tlen = tlen;
            bsz += 1 + tlen;
            long esz = 2 + slen + tlen;
            if (esz > max_em) max_em = esz;
        }
        if (bsz > max_bm) max_bm = bsz;
    }
    /* not topk-min'd: ATD uses the full (untruncated) neighbor sets */
    long mmax = max_slen + 1;
    long nmax = max_tlen + 1;
    double* W = malloc((size_t)max_em * max_em * sizeof(double));
    long* em = malloc(max_em * sizeof(long));
    long* perm = malloc(max_em * sizeof(long));
    long* bm = malloc(max_bm * sizeof(long));
    long* brow = malloc(max_bm * sizeof(long)); /* partition row idx per bm */
    long* coff = malloc((max_bm + 1) * sizeof(long));
    double* x = malloc(mmax * sizeof(double));
    double* y = malloc(nmax * sizeof(double));
    long* xs = malloc(mmax * sizeof(long));
    long* ys = malloc(nmax * sizeof(long));
    tpair* scratch = malloc((max_slen > max_tlen ? max_slen : max_tlen) > 0
                            ? (size_t)(max_slen > max_tlen ? max_slen : max_tlen) * sizeof(tpair)
                            : sizeof(tpair));
    double* d = malloc((size_t)mmax * nmax * sizeof(double));
    /* emd work arrays (emd_one) */
    double* f = malloc((size_t)mmax * nmax * sizeof(double));
    double* sup = malloc(mmax * sizeof(double));
    double* dem = malloc(nmax * sizeof(double));
    double* phi = malloc(mmax * sizeof(double));
    double* psi = malloc(nmax * sizeof(double));
    double* dL = malloc(mmax * sizeof(double));
    double* dR = malloc(nmax * sizeof(double));
    long* parL = malloc(mmax * sizeof(long));
    long* parR = malloc(nmax * sizeof(long));
    char* visL = malloc(mmax);
    char* visR = malloc(nmax);
    long clamped = 0;

    for (long r = 0; r < n_rows; r++) {
        long s_id = src[r];
        const long* s_nb = s_vals + s_off[r];
        const double* s_w = sw_vals + sw_off[r];
        long slen = s_off[r + 1] - s_off[r];
        long k0 = t_off[r], k1 = t_off[r + 1];

        /* block member set + compact adjacency copy (cache locality:
           partition buffers are cold/random, the block rows are hot) */
        long nbm = 0;
        bm[nbm++] = s_id;
        for (long j = 0; j < slen; j++) bm[nbm++] = s_nb[j];
        for (long k = k0; k < k1; k++) {
            bm[nbm++] = t_dst[k];
            for (long j = tn_off[k]; j < tn_off[k + 1]; j++) bm[nbm++] = tn_vals[j];
        }
        nbm = sort_unique(bm, nbm);
        long tot = 0;
        for (long i = 0; i < nbm; i++) {
            long p = bfind(sm, n_mem, bm[i]);
            brow[i] = p;
            tot += p >= 0 ? row_len[p] : 0;
        }
        long* cnb = malloc((tot > 0 ? tot : 1) * sizeof(long));
        double* cws = malloc((tot > 0 ? tot : 1) * sizeof(double));
        long pos = 0;
        for (long i = 0; i < nbm; i++) {
            coff[i] = pos;
            long p = brow[i];
            if (p >= 0) {
                long rs = row_start[p], wl = wrow_start[p], rl = row_len[p];
                for (long j = 0; j < rl; j++) {
                    cnb[pos] = nb_vals[rs + j];
                    cws[pos] = ws_vals[wl + j];
                    pos++;
                }
            }
        }
        coff[nbm] = pos;

        for (long k = k0; k < k1; k++) {
            double w_st = t_w[k];
            if (w_st < EPS) { out_kappa[k] = 0.0; continue; }
            long t_id = t_dst[k];
            const long* t_nb = tn_vals + tn_off[k];
            const double* t_wk = tw_vals + tw_off[k];
            long tlen = tn_off[k + 1] - tn_off[k];

            long nem = 0;
            em[nem++] = s_id;
            em[nem++] = t_id;
            for (long j = 0; j < slen; j++) em[nem++] = s_nb[j];
            for (long j = 0; j < tlen; j++) em[nem++] = t_nb[j];
            nem = sort_unique(em, nem);
            long si_s = bfind(em, nem, s_id);
            long ti_s = bfind(em, nem, t_id);
            /* s and t LAST: FW's inf row-skip makes the first nem-2
               k-iterations nearly free (ollivier.py comment, ~4x) */
            long c = 0;
            for (long i = 0; i < nem; i++)
                if (i != si_s && i != ti_s) perm[i] = c++;
            perm[si_s] = nem - 2;
            perm[ti_s] = nem - 1;
            long si = nem - 2, ti = nem - 1;

            for (long i = 0; i < nem * nem; i++) W[i] = INF;
            for (long i = 0; i < nem; i++) {
                long b = bfind(bm, nbm, em[i]);
                if (b < 0) continue;
                long li = perm[i];
                for (long j = coff[b]; j < coff[b + 1]; j++) {
                    long p = bfind(em, nem, cnb[j]);
                    if (p < 0) continue;
                    long lj = perm[p];
                    if (cws[j] < W[li * nem + lj]) W[li * nem + lj] = cws[j];
                }
            }
            /* support-arc injection from gathered weights (ollivier.py) */
            if (directed) {
                for (long j = 0; j < slen; j++) {
                    long li = perm[bfind(em, nem, s_nb[j])];
                    if (s_w[j] < W[li * nem + si]) W[li * nem + si] = s_w[j];
                }
                for (long j = 0; j < tlen; j++) {
                    long lj = perm[bfind(em, nem, t_nb[j])];
                    if (t_wk[j] < W[ti * nem + lj]) W[ti * nem + lj] = t_wk[j];
                }
                if (w_st < W[si * nem + ti]) W[si * nem + ti] = w_st;
            } else {
                for (long j = 0; j < slen; j++) {
                    long li = perm[bfind(em, nem, s_nb[j])];
                    if (s_w[j] < W[si * nem + li]) W[si * nem + li] = s_w[j];
                }
                for (long j = 0; j < tlen; j++) {
                    long lj = perm[bfind(em, nem, t_nb[j])];
                    if (t_wk[j] < W[ti * nem + lj]) W[ti * nem + lj] = t_wk[j];
                }
                if (w_st < W[si * nem + ti]) W[si * nem + ti] = w_st;
                for (long i = 0; i < nem; i++)
                    for (long j = i + 1; j < nem; j++) {
                        double a = W[i * nem + j], b2 = W[j * nem + i];
                        double mn = a < b2 ? a : b2;
                        W[i * nem + j] = mn;
                        W[j * nem + i] = mn;
                    }
            }
            for (long i = 0; i < nem; i++) W[i * nem + i] = 0.0;
            floyd_warshall(nem, W); /* same code the numpy path calls */

            if (method == 1) { /* ATD — reference :257-294, :344; empty
                   neighbor set -> the node itself (reference raises
                   ZeroDivisionError at :281) */
                long na = slen, nb2 = tlen;
                if (slen == 0) { xs[0] = si; na = 1; }
                else for (long a2 = 0; a2 < slen; a2++)
                    xs[a2] = perm[bfind(em, nem, s_nb[a2])];
                if (tlen == 0) { ys[0] = ti; nb2 = 1; }
                else for (long b2 = 0; b2 < tlen; b2++)
                    ys[b2] = perm[bfind(em, nem, t_nb[b2])];
                double mx = -INF;
                long bad = 0;
                for (long a2 = 0; a2 < na; a2++) {
                    const double* Wr = W + xs[a2] * nem;
                    for (long b2 = 0; b2 < nb2; b2++) {
                        double v = Wr[ys[b2]];
                        if (isfinite(v)) { if (v > mx) mx = v; }
                        else bad++;
                    }
                }
                double subst = (mx == -INF) ? w_st : mx;
                long double acc = 0.0L;
                for (long a2 = 0; a2 < na; a2++) {
                    const double* Wr = W + xs[a2] * nem;
                    for (long b2 = 0; b2 < nb2; b2++) {
                        double v = Wr[ys[b2]];
                        acc += isfinite(v) ? v : subst;
                    }
                }
                clamped += bad;
                double share = (1.0 - alpha) / ((double)na * (double)nb2);
                double mcost = alpha * W[si * nem + ti] + share * (double)acc;
                out_kappa[k] = 1.0 - mcost / w_st;
            } else {
                /* local support indices for the distributions */
                for (long j = 0; j < slen; j++)
                    xs[j] = perm[bfind(em, nem, s_nb[j])];
                long m_sup = node_dist(si, xs, s_w, slen, alpha, base_,
                                       exp_power, nbr_topk, x, xs, scratch);
                for (long j = 0; j < tlen; j++)
                    ys[j] = perm[bfind(em, nem, t_nb[j])];
                long n_sup = node_dist(ti, ys, t_wk, tlen, alpha, base_,
                                       exp_power, nbr_topk, y, ys, scratch);
                for (long i = 0; i < m_sup; i++)
                    for (long j = 0; j < n_sup; j++)
                        d[i * n_sup + j] = W[xs[i] * nem + ys[j]];
                clamped += clamp_nonfinite(d, m_sup * n_sup, w_st);
                if (route[k]) { /* deferred to python batched Sinkhorn */
                    long slot = sk_slot[k];
                    memcpy(skx + skx_off[slot], x, m_sup * sizeof(double));
                    memcpy(sky + sky_off[slot], y, n_sup * sizeof(double));
                    memcpy(skd + skd_off[slot], d,
                           (size_t)m_sup * n_sup * sizeof(double));
                } else {
                    double cost = emd_one((int)m_sup, (int)n_sup, x, y, d,
                                          f, sup, dem, phi, psi, dL, dR,
                                          parL, parR, visL, visR);
                    out_kappa[k] = 1.0 - cost / w_st;
                }
            }
        }
        free(cnb);
        free(cws);
    }
    *n_clamped = clamped;
    free(W); free(em); free(perm); free(bm); free(brow); free(coff);
    free(x); free(y); free(xs); free(ys); free(scratch); free(d);
    free(f); free(sup); free(dem); free(phi); free(psi);
    free(dL); free(dR); free(parL); free(parR); free(visL); free(visR);
}

/* batch entry: k problems, flattened with offsets */
void emd_batch(int k, const long* ms, const long* ns,
               const double* a_flat, const long* a_off,
               const double* b_flat, const long* b_off,
               const double* M_flat, const long* M_off,
               double* out)
{
    long mmax = 0, nmax = 0;
    for (int t = 0; t < k; t++) {
        if (ms[t] > mmax) mmax = ms[t];
        if (ns[t] > nmax) nmax = ns[t];
    }
    if (mmax == 0 || nmax == 0) { for (int t = 0; t < k; t++) out[t] = 0.0; return; }
    double* f   = malloc((size_t)mmax * nmax * sizeof(double));
    double* sup = malloc(mmax * sizeof(double));
    double* dem = malloc(nmax * sizeof(double));
    double* phi = malloc(mmax * sizeof(double));
    double* psi = malloc(nmax * sizeof(double));
    double* dL  = malloc(mmax * sizeof(double));
    double* dR  = malloc(nmax * sizeof(double));
    long* parL  = malloc(mmax * sizeof(long));
    long* parR  = malloc(nmax * sizeof(long));
    char* visL  = malloc(mmax);
    char* visR  = malloc(nmax);
    for (int t = 0; t < k; t++) {
        out[t] = emd_one((int)ms[t], (int)ns[t],
                         a_flat + a_off[t], b_flat + b_off[t], M_flat + M_off[t],
                         f, sup, dem, phi, psi, dL, dR, parL, parR, visL, visR);
    }
    free(f); free(sup); free(dem); free(phi); free(psi);
    free(dL); free(dR); free(parL); free(parR); free(visL); free(visR);
}
"""


def _build() -> ctypes.CDLL | None:
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache_dir = os.environ.get("GRC_NATIVE_DIR", os.path.join(tempfile.gettempdir(), "grc_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"emd_{tag}.so")
    if not os.path.exists(so_path):
        c_path = os.path.join(cache_dir, f"emd_{tag}.c")
        with open(c_path, "w") as fh:
            fh.write(_C_SOURCE)
        try:
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", so_path + ".tmp", c_path, "-lm"],
                check=True,
                capture_output=True,
            )
            os.replace(so_path + ".tmp", so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.floyd_warshall.restype = None
    lib.floyd_warshall.argtypes = [
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.emd_batch.restype = None
    lib.emd_batch.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
    ]
    L = np.ctypeslib.ndpointer(np.int64, flags="C")
    D = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.ego_solve_batch.restype = None
    lib.ego_solve_batch.argtypes = [
        ctypes.c_long, L,        # n_rows, src
        L, L,                    # s_off, s_vals
        L, D,                    # sw_off, sw_vals
        L,                       # t_off
        ctypes.c_long, L, D,     # n_edges, t_dst, t_w
        L, L,                    # tn_off, tn_vals
        L, D,                    # tw_off, tw_vals
        ctypes.c_long, L,        # n_mem, sm
        L, L, L,                 # row_start, row_len, wrow_start
        L, D,                    # nb_vals, ws_vals
        ctypes.c_int, ctypes.c_int,                  # directed, method
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # alpha, base, expp
        ctypes.c_long,           # nbr_topk
        np.ctypeslib.ndpointer(np.int8, flags="C"), L,  # route, sk_slot
        D, L,                    # skx, skx_off
        D, L,                    # sky, sky_off
        D, L,                    # skd, skd_off
        D, L,                    # out_kappa, n_clamped
    ]
    return lib


_LIB = _build()


def available() -> bool:
    return _LIB is not None


def emd_batch_native(xs: list, ys: list, ds: list) -> np.ndarray:
    """Solve a batch of EMD problems in one native call."""
    k = len(xs)
    ms = np.array([len(x) for x in xs], dtype=np.int64)
    ns = np.array([len(y) for y in ys], dtype=np.int64)
    a_off = np.zeros(k, dtype=np.int64)
    b_off = np.zeros(k, dtype=np.int64)
    m_off = np.zeros(k, dtype=np.int64)
    np.cumsum(ms[:-1], out=a_off[1:]) if k > 1 else None
    np.cumsum(ns[:-1], out=b_off[1:]) if k > 1 else None
    sizes = ms * ns
    np.cumsum(sizes[:-1], out=m_off[1:]) if k > 1 else None
    a_flat = np.ascontiguousarray(np.concatenate(xs) if k else np.empty(0), dtype=np.float64)
    b_flat = np.ascontiguousarray(np.concatenate(ys) if k else np.empty(0), dtype=np.float64)
    m_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(d, dtype=np.float64).ravel() for d in ds]) if k else np.empty(0)
    )
    out = np.empty(k, dtype=np.float64)
    _LIB.emd_batch(k, ms, ns, a_flat, a_off, b_flat, b_off, m_flat, m_off, out)
    return out


def emd_exact_native(a, b, M) -> float:
    return float(emd_batch_native([np.asarray(a, float)], [np.asarray(b, float)], [M])[0])


_METHOD_CODES = {"OTD": 0, "ATD": 1, "Sinkhorn": 2, "OTDSinkhornMix": 3}


def ego_solve_batch_native(
    *,
    src,
    s_off,
    s_vals,
    sw_off,
    sw_vals,
    t_off,
    t_dst,
    t_w,
    tn_off,
    tn_vals,
    tw_off,
    tw_vals,
    sm,
    row_start,
    row_len,
    wrow_start,
    nb_vals,
    ws_vals,
    directed: bool,
    method: str,
    alpha: float,
    base: float,
    exp_power: float,
    nbr_topk: int,
    route,
    sk_slot,
    skx_off,
    sky_off,
    skd_off,
):
    """Run the whole ego-partition per-edge loop in one native call.

    ``route[k] == 1`` marks edges the caller routes to batched Sinkhorn:
    their (masses, cost-matrix) problems are written into the returned flat
    buffers at ``sk*_off[sk_slot[k]]``; every other edge's curvature is
    fully solved in C (ATD closed form or exact EMD). Returns
    ``(kappa, skx, sky, skd, n_clamped)``.
    """
    as_l = lambda a: np.ascontiguousarray(a, dtype=np.int64)  # noqa: E731
    as_d = lambda a: np.ascontiguousarray(a, dtype=np.float64)  # noqa: E731
    src = as_l(src)
    t_dst = as_l(t_dst)
    n_rows, n_edges = len(src), len(t_dst)
    out = np.empty(n_edges, dtype=np.float64)
    skx = np.empty(int(skx_off[-1]) if len(skx_off) else 0, dtype=np.float64)
    sky = np.empty(int(sky_off[-1]) if len(sky_off) else 0, dtype=np.float64)
    skd = np.empty(int(skd_off[-1]) if len(skd_off) else 0, dtype=np.float64)
    n_clamped = np.zeros(1, dtype=np.int64)
    _LIB.ego_solve_batch(
        n_rows,
        src,
        as_l(s_off),
        as_l(s_vals),
        as_l(sw_off),
        as_d(sw_vals),
        as_l(t_off),
        n_edges,
        t_dst,
        as_d(t_w),
        as_l(tn_off),
        as_l(tn_vals),
        as_l(tw_off),
        as_d(tw_vals),
        len(sm),
        as_l(sm),
        as_l(row_start),
        as_l(row_len),
        as_l(wrow_start),
        as_l(nb_vals),
        as_d(ws_vals),
        int(bool(directed)),
        _METHOD_CODES[method],
        float(alpha),
        float(base),
        float(exp_power),
        int(nbr_topk),
        np.ascontiguousarray(route, dtype=np.int8),
        as_l(sk_slot),
        skx,
        as_l(skx_off),
        sky,
        as_l(sky_off),
        skd,
        as_l(skd_off),
        out,
        n_clamped,
    )
    return out, skx, sky, skd, int(n_clamped[0])


def floyd_warshall_native(W: np.ndarray) -> np.ndarray:
    """All-pairs shortest paths, in C, on a copy of ``W`` (inf = no edge)."""
    D = np.ascontiguousarray(W, dtype=np.float64).copy()
    n = D.shape[0]
    idx = np.arange(n)
    D[idx, idx] = 0.0
    _LIB.floyd_warshall(n, D)
    return D
