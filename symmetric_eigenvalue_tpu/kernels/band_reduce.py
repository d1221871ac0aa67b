"""Two-stage SBR, stage 1: dense symmetric -> banded (blocked Householder).

One-stage tridiagonalization (kernels/tridiagonalize.py) is O(n^3) *HBM
traffic*: every column's ``v @ A`` streams the full trailing matrix, which at
n=16384 f64 is ~41 s of pure bandwidth before any arithmetic.  The classic
fix (Bischof-Lang successive band reduction; the role MKL's ``dsytrd`` panel
+ ``dsyrk`` split plays for the reference's LAPACK dependency) reshapes the
reduction so almost all work lands in rank-2b GEMMs on the MXU:

  stage 1 (this file):  A -> B banded with bandwidth b, via QR panels:
      for each block column k (offset o = k*b):
        * Householder QR of the (n-o-b) x b panel A[o+b:, o:o+b] — the only
          column-sequential part, and each step touches an n x b strip, not
          the n x n trailing matrix;
        * two-sided block update  A <- H^T A H,  H = I - Y T Y^T, computed
          as three GEMMs (A@Y, small Gram, fused symmetric rank-2b update).
  stage 2 (band_to_tridiag below): B -> tridiagonal by pipelined bulge
      chasing — O(n^2 b) work on small windows.

Reflectors are stored as ROWS of Yt (row c = reflector annihilating column c
below the band; unit at c+b) with scalar taus, the same convention as
tridiagonalize.Vt shifted by b — so tridiagonalize.apply_q applies Q1 to
eigenvector blocks unchanged (panel=b).

All GEMMs run f64-grade via the MXU-sliced double-word kernel on TPU
(kernels/pallas/dword_matmul); the per-panel work uses full-size (n-wide)
operands with zero-masked reflectors — 3x the FLOPs of perfectly shrinking
trailing windows, bought back many times over by MXU rates (future:
bucketed trailing sizes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from .tridiagonalize import _householder, _larft, _mm, _use_dword_matvec


def _reduce_block(As, ncols: int, b: int, use_dword: bool,
                  want_reflectors: bool = True):
    """Blocked band reduction of the FIRST ``ncols`` columns (whole panels of
    ``b``) of the trailing symmetric submatrix ``As`` (m, m), local coords.

    Returns (As_updated, Ytb (ncols, m), taus (ncols,)); reflector for local
    column c has zeros at entries < c + b and unit at c + b.
    """
    m = As.shape[0]
    dtype = As.dtype
    num_panels = ncols // b

    nlog = max(ncols, 1) if want_reflectors else 1
    Ytb = jnp.zeros((nlog, m), dtype)
    taus = jnp.zeros((max(ncols, 1),), dtype)

    def panel_body(k, carry):
        As, Ytb, taus = carry
        o = k * b

        # --- panel QR: Householder columns of As[o+b:, o:o+b] -----------
        # Pt[j] = (current) column o+j of As, reflectors applied immediately
        # to the remaining panel columns (one-sided).
        Pt = lax.dynamic_slice(As.T, (o, 0), (b, m))  # rows: panel columns
        Yp = jnp.zeros((b, m), dtype)
        tp = jnp.zeros((b,), dtype)

        def col_body(j, inner):
            Pt, Yp, tp = inner
            x = Pt[j]
            # unit position u = o + b + j  ->  _householder pivot index u
            v, tau, _ = _householder(x, o + b + j - 1, m)
            live = o + b + j < m
            v = jnp.where(live, v, jnp.zeros_like(v))
            tau = jnp.where(live, tau, 0.0)
            # apply (I - tau v v^T) to the remaining panel columns
            w = Pt @ v                     # (b,)
            Pt = Pt - tau * w[:, None] * v[None, :]
            Yp = lax.dynamic_update_slice(Yp, v[None, :], (j, 0))
            tp = tp.at[j].set(tau)
            return Pt, Yp, tp

        _, Yp, tp = lax.fori_loop(0, b, col_body, (Pt, Yp, tp))

        # --- two-sided block update  As <- (I - Y T Y^T)^T As (I - Y T Y^T)
        T = _larft(Yp, tp, use_dword)                    # (b, b) upper
        P_ = _mm(As, Yp.T, use_dword)                    # (m, b) = As Y
        # Y^T As Y: m-length contraction — XLA's emulated-f64 matrix-matrix
        # dot is only ~1e-6-grade at these lengths on TPU (CLAUDE.md), so
        # this must ride the double-word kernel too
        S = _mm(Yp, P_, use_dword, tm=32, tn=128)        # (b, b) = Y^T As Y
        W = P_ @ T - (0.5 * (Yp.T @ (T.T @ S @ T)).T).T  # (m, b)
        # As -= Y W^T + W Y^T  as one fused (m, 2b) x (2b, m) GEMM
        As = As - _mm(jnp.concatenate([Yp.T, W], axis=1),
                      jnp.concatenate([W, Yp.T], axis=1).T, use_dword)

        if want_reflectors:
            Ytb = lax.dynamic_update_slice(Ytb, Yp, (o, 0))
        taus = lax.dynamic_update_slice(taus, tp, (o,))
        return As, Ytb, taus

    As, Ytb, taus = lax.fori_loop(0, num_panels, panel_body,
                                  (As, Ytb, taus))
    return As, Ytb[:ncols] if want_reflectors else Ytb, taus[:ncols]


def reduce_to_band(A, band: int = 128, buckets: int = 1,
                   want_reflectors: bool = True):
    """A (n, n) symmetric -> (B (n, n) banded, Yt (n, n), taus (n,)).

    B = Q1^T A Q1 with bandwidth ``band`` (entries |i-j| > band are ~0);
    Q1 = H_0 H_1 ... where H_c = I - tau_c y_c y_c^T, y_c = Yt[c, :]
    (zero at entries < c + band, unit at c + band).

    ``buckets``: split the panel range into chunks, each processed on a
    STATICALLY shrunk trailing submatrix (same scheme as
    ``tridiagonalize(buckets=)``): reflector support lives entirely in the
    trailing block, so rows above it are exactly frozen, and the per-panel
    GEMMs stream only the trailing block — total traffic drops from ~3x
    toward the n^3-GEMM optimum.  buckets=1 reproduces the single-pass
    behavior.  ``want_reflectors=False`` skips materializing Yt (the
    n^2 reflector store) for eigenvalues-only callers.
    """
    n = A.shape[0]
    dtype = A.dtype
    b = int(band)
    if n <= b + 1:
        # already "banded"; no reflectors needed
        return (A, jnp.zeros((n, n) if want_reflectors else (1, 1), dtype),
                jnp.zeros((n,), dtype))
    use_dword = _use_dword_matvec(n, dtype)

    num_panels = max((n - 2) // b, 0)   # last <=b+1 columns are inside band
    buckets = max(1, min(int(buckets), num_panels))
    per = -(-num_panels // buckets)     # ceil: panels per bucket
    cuts = [0]
    while cuts[-1] + per * b < num_panels * b:
        cuts.append(cuts[-1] + per * b)
    cuts.append(num_panels * b)

    B = jnp.zeros((n, n), dtype)
    Yt = jnp.zeros((n, n) if want_reflectors else (1, 1), dtype)
    taus = jnp.zeros((n,), dtype)

    As = A
    for c0, c1 in zip(cuts[:-1], cuts[1:]):
        m = n - c0
        mp = m
        if use_dword:
            # pad so the double-word kernels tile evenly; reflectors are
            # zero in pad entries so the first m rows/cols are unchanged
            pad = (-m) % 512
            if pad:
                As = jnp.pad(As, ((0, pad), (0, pad)))
                mp = m + pad
        ncols = c1 - c0
        As, Ytb, tb = _reduce_block(As, ncols, b, use_dword,
                                    want_reflectors)
        As = As[:m, :m] if mp != m else As
        B = lax.dynamic_update_slice(B, As[:ncols, :], (c0, c0))
        if want_reflectors:
            Yt = lax.dynamic_update_slice(Yt, Ytb, (c0, c0))
        taus = lax.dynamic_update_slice(taus, tb, (c0,))
        As = As[ncols:, ncols:]           # static shrink to next bucket

    B = lax.dynamic_update_slice(B, As, (cuts[-1], cuts[-1]))
    # strips write rows [c0, c1) x cols [c0, n): upper-complete, but lower
    # band entries whose column lies in an EARLIER bucket are only present
    # as their (exactly equal — the update preserves symmetry) upper
    # mirrors; rebuild the lower triangle from the upper
    B = jnp.triu(B) + jnp.triu(B, 1).T
    return B, Yt, taus


def _chase_schedule(n: int, b: int):
    """Static Givens schedule for band(b) -> tridiagonal (Schwarz chasing).

    Element (i, j) of column j (eliminated bottom-up) is zeroed by a rotation
    of rows (i-1, i); the two-sided application pushes a single bulge to
    (i + b, i - 1), giving the data-independent chase recurrence
    (pi, pj) -> (pi + b, pi - 1) until the band edge.  The schedule depends
    only on (n, b) — verified against a fill-scanning reference.
    """
    import numpy as np
    sched = []
    for j in range(n - 2):
        for i in range(min(j + b, n - 1), j + 1, -1):
            pi, pj = i, j
            while pi < n:
                sched.append((pi, pj))
                pj = pi - 1
                pi = pi + b
    if not sched:
        sched = [(1, 0)]          # degenerate; rotation becomes identity
    return np.asarray(sched, np.int32)


def band_to_tridiag(B, band: int):
    """Banded symmetric B (n, n) -> (d, e, rot (S, 2) c/s log).

    Stage 2 of the two-stage reduction:  T = Q2^T B Q2 with
    Q2^T = G_S ... G_1 (G_t a Givens rotation of rows (pi_t - 1, pi_t)).
    O(n^2 b) work on O(1)-size windows.

    CORRECTNESS-TIER IMPLEMENTATION: the rotations replay sequentially under
    one fori_loop (the schedule is static), so per-step dispatch latency
    (~50 us on TPU) bounds throughput — fine up to n~2048.  The TPU-rate
    version batches the schedule into wavefronts of row-disjoint rotations
    >=2b apart (they commute exactly, and parameter reads don't alias other
    rotations' row/col support at that spacing) — see PARITY.md TODO.
    """
    n = B.shape[0]
    b = int(band)
    dtype = B.dtype
    sched = jnp.asarray(_chase_schedule(n, b))
    S = sched.shape[0]

    def body(t, carry):
        A, cs = carry
        pi = sched[t, 0]
        pj = sched[t, 1]
        x = A[pi - 1, pj]
        y = A[pi, pj]
        r = jnp.hypot(x, y)
        safe = jnp.where(r == 0, 1.0, r)
        c = jnp.where(r == 0, jnp.ones_like(x), x / safe)
        s = jnp.where(r == 0, jnp.zeros_like(y), -y / safe)
        G = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
        zero = jnp.zeros((), pi.dtype)
        R = lax.dynamic_slice(A, (pi - 1, zero), (2, n))
        A = lax.dynamic_update_slice(A, G @ R, (pi - 1, zero))
        Cc = lax.dynamic_slice(A, (zero, pi - 1), (n, 2))
        A = lax.dynamic_update_slice(A, Cc @ G.T, (zero, pi - 1))
        cs = lax.dynamic_update_slice(cs, jnp.stack([c, s])[None, :],
                                      (jnp.asarray(t, pi.dtype), zero))
        return A, cs

    A, cs = lax.fori_loop(0, S, body, (B, jnp.zeros((S, 2), dtype)))
    return jnp.diagonal(A), jnp.diagonal(A, offset=1), cs


def _wave_geometry(n: int, b: int):
    """Static geometry shared by the wavefront chase and its backtransform."""
    kmax_global = max((n - 3) // b, 0)
    Kmax = kmax_global + 1            # hops per sweep, padded
    Wmax = kmax_global // 3 + 1       # concurrent tasks per wave
    Twaves = 3 * max(n - 3, 0) + 1
    return Kmax, Wmax, Twaves


def band_to_tridiag_wave(B, band: int, want_log: bool = True):
    """Banded symmetric B (n, n) -> (d, e, (Vw, tw)) by WAVEFRONT bulge
    chasing — the TPU-rate replacement for :func:`band_to_tridiag`'s
    sequential Givens replay (PLAN_SBR2.md; design validated exactly by
    tools/oracle_chase_wave.py).

    Decomposition: task (j, k) applies ONE Householder reflector on rows
    [j+kb+1, j+(k+1)b], zeroing column (j for k=0, else j+(k-1)b+1) below the
    band edge; each task's triangular bulge is consumed column-by-column by
    the SUCCEEDING sweeps' same-hop tasks, so no task needs a triangular QR.
    Wave schedule t = 3j + k: concurrent tasks sit 3b-1 apart on the
    diagonal, with two-sided footprints (window cols [r-2b+1, r+3b-2])
    exactly disjoint — each wave is one batched gather / batched reflector /
    one scatter, Theta(n) dispatches total instead of Theta(n^2) rotations.

    Returns ``d (n,)``, ``e (n-1,)`` and the reflector log
    ``Vw (n-1, Kmax, b)`` / ``tw (n-1, Kmax)`` (row n-2 is parking space)
    consumed by :func:`apply_q2_wave`.  ``want_log=False`` skips the
    ~n^2 reflector store for eigenvalues-only callers (returns 1-sized
    placeholders).
    """
    n = B.shape[0]
    b = int(band)
    dtype = B.dtype
    Kmax, Wmax, Twaves = _wave_geometry(n, b)
    if n < 3 or b < 2:
        Vw = jnp.zeros((max(n - 1, 1), Kmax, max(b, 1)), dtype)
        tw = jnp.zeros((max(n - 1, 1), Kmax), dtype)
        return jnp.diagonal(B), jnp.diagonal(B, offset=1), (Vw, tw)

    OFF = 2 * b                       # live region offset in the padded array
    NP = n + 11 * b                   # padded size (park window stays inside)

    P = jnp.zeros((NP, NP), dtype)
    P = lax.dynamic_update_slice(P, B, (OFF, OFF))
    nlog = n - 1 if want_log else 1
    Vw = jnp.zeros((nlog, Kmax, b), dtype)    # row n-2 = parking
    tw = jnp.zeros((nlog, Kmax), dtype)

    body = _chase_wave_body(n, b, want_log, _chase_update_mode())
    P, Vw, tw = lax.fori_loop(0, Twaves, body, (P, Vw, tw))
    d = jnp.diagonal(P)[OFF: OFF + n]
    e = jnp.diagonal(P, offset=1)[OFF: OFF + n - 1]
    return d, e, (Vw, tw)


def _chase_update_mode() -> str:
    """P-window write implementation (SE_WAVE_UPDATE override).

    Measured on v5e (n=512, b=128, warm): the natural 2-axis advanced-index
    scatter AND its linearized 1-D form both cost ~24 ms per wave (XLA
    copies the whole padded P per scatter), while the per-slot
    ``dynamic_update_slice`` loop runs IN PLACE at ~0.2 ms/wave — 120x.
    Scatter-heavy dispatches running past ~40-70 s also kill the device
    ("UNAVAILABLE: TPU device error", the round-4 q8a crash) — not a pure
    time watchdog (a ~500 s GEMM-heavy dispatch survives), so both levers
    apply: DUS writes AND the segmented chase.  CPU keeps the scatter (its
    XLA in-places it and vectorizes better there)."""
    update = os.environ.get("SE_WAVE_UPDATE")
    if update is None:
        try:
            update = ("dus" if jax.default_backend() == "tpu"
                      else "scatter2d")
        except Exception:  # pragma: no cover
            update = "scatter2d"
    return update


def _chase_wave_body(n: int, b: int, want_log: bool, update: str):
    """One wavefront step (shared by the in-jit and the segmented chase)."""
    Kmax, Wmax, Twaves = _wave_geometry(n, b)
    W5 = 5 * b - 2
    OFF = 2 * b
    NPARK = n + 8 * b
    NP = n + 11 * b
    rowr = jnp.arange(b)
    colr = jnp.arange(W5)
    slots = jnp.arange(Wmax)

    def wave_body(t, carry):
        P, Vw, tw = carry
        jj = t // 3 - slots
        kk = (t % 3) + 3 * slots
        valid = (jj >= 0) & (jj + kk * b + 2 <= n - 1)
        r = jj + kk * b + 1
        rp = jnp.where(valid, r + OFF, NPARK)
        off = jnp.where(kk == 0, 2 * b - 2, b - 1)

        S = jax.vmap(
            lambda r0: lax.dynamic_slice(P, (r0, r0 - (2 * b - 1)), (b, W5))
        )(rp)                                         # (W, b, W5)

        x = jnp.take_along_axis(S, off[:, None, None], axis=2)[..., 0]
        x0 = x[:, 0]
        sigma2 = jnp.sum(x[:, 1:] * x[:, 1:], axis=1)
        nrm = jnp.sqrt(x0 * x0 + sigma2)
        beta = jnp.where(x0 >= 0, -nrm, nrm)          # sign avoids cancellation
        no_op = sigma2 == 0.0
        denom = jnp.where(no_op, 1.0, x0 - beta)
        v = x / denom[:, None]
        v = v.at[:, 0].set(jnp.where(no_op, 0.0, 1.0))
        tau = jnp.where(no_op, 0.0, (beta - x0) / jnp.where(no_op, 1.0, beta))
        beta_out = jnp.where(no_op, x0, beta)

        # two-sided update of the strip:  S <- H S, then the (R, R) diagonal
        # block (local cols [2b-1, 3b-1)) gets the right application too
        w1 = tau[:, None] * jnp.einsum("wb,wbc->wc", v, S)
        S = S - v[:, :, None] * w1[:, None, :]
        D = S[:, :, 2 * b - 1: 3 * b - 1]
        w2 = tau[:, None] * jnp.einsum("wbc,wc->wb", D, v)
        D = D - w2[:, :, None] * v[:, None, :]
        S = S.at[:, :, 2 * b - 1: 3 * b - 1].set(D)
        # exact-zero bookkeeping (the disjointness proof is structural)
        colsel = colr[None, None, :] == off[:, None, None]
        S = jnp.where(colsel & (rowr[None, :, None] >= 1), 0.0, S)
        S = jnp.where(colsel & (rowr[None, :, None] == 0),
                      beta_out[:, None, None], S)

        rows_idx = rp[:, None] + rowr[None, :]        # (W, b)
        cols_idx = rp[:, None] - (2 * b - 1) + colr[None, :]   # (W, W5)
        # in-wave windows are exactly disjoint; parked slots all write the
        # same zeros, so duplicate indices are value-identical
        if update == "scatter2d":
            P = P.at[rows_idx[:, :, None], cols_idx[:, None, :]].set(S)
            P = P.at[cols_idx[:, :, None], rows_idx[:, None, :]].set(
                jnp.transpose(S, (0, 2, 1)))
        elif update == "scatter1d":
            # the 2-axis advanced-index scatter above faults the v5e device
            # (q8a round 5, any n): linearize to ONE index dim — the same
            # 1-D scatter shape the tearing/Jacobi paths use safely on TPU
            ri = rows_idx.astype(jnp.int32)
            ci = cols_idx.astype(jnp.int32)
            lin_rc = (ri[:, :, None] * NP + ci[:, None, :]).reshape(-1)
            lin_cr = (ci[:, :, None] * NP + ri[:, None, :]).reshape(-1)
            Pf = P.reshape(-1)
            Pf = Pf.at[lin_rc].set(S.reshape(-1))
            Pf = Pf.at[lin_cr].set(
                jnp.transpose(S, (0, 2, 1)).reshape(-1))
            P = Pf.reshape(NP, NP)
        else:  # "dus": per-slot dynamic_update_slice (scatter-free fallback)
            def write_slot(w, P):
                Sw = S[w]
                P = lax.dynamic_update_slice(
                    P, Sw, (rp[w], rp[w] - (2 * b - 1)))
                P = lax.dynamic_update_slice(
                    P, Sw.T, (rp[w] - (2 * b - 1), rp[w]))
                return P
            P = lax.fori_loop(0, rp.shape[0], write_slot, P)

        if want_log:
            jsafe = jnp.where(valid, jj, n - 2)
            ksafe = jnp.where(valid, kk, 0)
            Vw = Vw.at[jsafe, ksafe].set(jnp.where(valid[:, None], v, 0.0))
            tw = tw.at[jsafe, ksafe].set(jnp.where(valid, tau, 0.0))
        return P, Vw, tw

    return wave_body


@functools.lru_cache(maxsize=16)
def _staged_chase_fns(n: int, b: int, want_log: bool, dtype_name: str,
                      update: str):
    """(init, segment, finish) jits for the host-segmented wave chase."""
    dtype = jnp.dtype(dtype_name)
    Kmax, Wmax, Twaves = _wave_geometry(n, b)
    OFF = 2 * b
    NP = n + 11 * b
    nlog = n - 1 if want_log else 1
    body = _chase_wave_body(n, b, want_log, update)

    def init(B):
        P = jnp.zeros((NP, NP), dtype)
        P = lax.dynamic_update_slice(P, B, (OFF, OFF))
        Vw = jnp.zeros((nlog, Kmax, b), dtype)
        tw = jnp.zeros((nlog, Kmax), dtype)
        return P, Vw, tw

    def segment(P, Vw, tw, t0, t1):
        # traced bounds -> while_loop: one executable serves every segment
        return lax.fori_loop(t0, t1, body, (P, Vw, tw))

    def finish(P):
        d = jnp.diagonal(P)[OFF: OFF + n]
        e = jnp.diagonal(P, offset=1)[OFF: OFF + n - 1]
        return d, e

    return (jax.jit(init, donate_argnums=(0,)),
            jax.jit(segment, donate_argnums=(0, 1, 2)),
            jax.jit(finish))


def band_to_tridiag_wave_staged(B, band: int, want_log: bool = True,
                                seg_waves: int = 0):
    """Host-segmented :func:`band_to_tridiag_wave`: identical math, but the
    wave loop runs as ceil(Twaves/seg_waves) separate donated dispatches.

    A single-dispatch chase is killed by the platform's execution watchdog
    above ~40-70 s of device time (the round-4 q8a "TPU device error" at
    n >= 1024); segmenting bounds each dispatch while donation keeps the
    (P, Vw, tw) state in place.  ``seg_waves`` 0 = SE_CHASE_SEG_WAVES or
    8192 (~2-8 s/segment at the measured ~0.2-1 ms/wave dus rate)."""
    n = B.shape[0]
    b = int(band)
    if n < 3 or b < 2:
        return band_to_tridiag_wave(B, band, want_log=want_log)
    if not seg_waves:
        seg_waves = int(os.environ.get("SE_CHASE_SEG_WAVES", "8192"))
    _, _, Twaves = _wave_geometry(n, b)
    init, segment, finish = _staged_chase_fns(
        n, b, want_log, str(B.dtype), _chase_update_mode())
    P, Vw, tw = init(B)
    for t0 in range(0, Twaves, seg_waves):
        P, Vw, tw = segment(P, Vw, tw, jnp.int32(t0),
                            jnp.int32(min(t0 + seg_waves, Twaves)))
    d, e = finish(P)
    return d, e, (Vw, tw)


def apply_q2_wave(n: int, band: int, vlog, X):
    """X <- Q2 @ X through the wavefront reflector log of
    :func:`band_to_tridiag_wave`.

    Within a sweep the hops' row ranges [j+kb+1, j+(k+1)b] are disjoint, so a
    whole sweep applies as ONE batched rank-1 block update; sweeps apply in
    descending j (sweep-major order is a valid linearization of the task
    dependence order, hence yields the same Q2 product as wave order).
    Theta(n) dispatches.
    """
    b = int(band)
    Vw, tw = vlog
    if n < 3 or b < 2:
        return X
    Kmax, _, _ = _wave_geometry(n, b)
    C = X.shape[1]
    Xp = jnp.zeros((n + b, C), X.dtype)
    Xp = Xp.at[:n].set(X)
    ks = jnp.arange(Kmax)
    rowr = jnp.arange(b)

    def body(i, Xp):
        j = n - 3 - i
        valid = j + ks * b + 2 <= n - 1
        rs = jnp.where(valid, j + ks * b + 1, n)      # park at the pad
        v = Vw[j].astype(X.dtype)                     # (Kmax, b)
        tau = tw[j].astype(X.dtype)
        rows_idx = rs[:, None] + rowr[None, :]        # (Kmax, b)
        G = Xp[rows_idx]                              # (Kmax, b, C)
        w = tau[:, None] * jnp.einsum("kb,kbc->kc", v, G)
        Y = G - v[:, :, None] * w[:, None, :]
        return Xp.at[rows_idx].set(Y)

    Xp = lax.fori_loop(0, n - 2, body, Xp)
    return Xp[:n]


def apply_q2_wave_blocked(n: int, band: int, vlog, X):
    """X <- Q2 @ X at GEMM rate: compact-WY blocks over the wavefront log.

    :func:`apply_q2_wave` applies rank-1 reflectors one sweep per dispatch —
    bandwidth-bound (4 flops per 8 loaded bytes; ~n^3/2 * 8 B of traffic).
    Here g = b consecutive sweeps' SAME-HOP reflectors — which live in a
    (2b-1)-row window, shifted one row per sweep — form one compact-WY block
    B(J, k) = I - Y T Y^T (Y: (2b-1, b), T upper triangular via the LAPACK
    identity T^{-1} = diag(1/tau) + striu(Y^T Y)), giving b/4 flops per byte.

    Valid reordering (PLAN_SBR2.md): blocks commute unless |window offset| <
    2b-1; ordering Q2 = prod_{J asc} prod_{k desc} B(J, k) only swaps
    disjoint-window factors of the sweep-major product.  Application is the
    reverse — J desc, k asc — scheduled as a wavefront wave(J, k) =
    k + 2*(nJ-1-J): concurrent blocks sit exactly 3b rows apart (disjoint),
    and every conflicting pair (same J adjacent k; J+1 blocks with k' <= k+1)
    lands on earlier waves.  Theta(n/b) dispatches total.
    """
    b = int(band)
    Vw, tw = vlog
    if n < 3 or b < 2:
        return X
    Kmax, _, _ = _wave_geometry(n, b)
    g = b
    h = b + g - 1
    nJ = -(-(n - 2) // g)                 # ceil: sweeps 0..n-3 in chunks of g
    C = X.shape[1]
    Smax = min(nJ, Kmax // 2 + 1)         # concurrent blocks per wave
    Twaves = Kmax + 2 * nJ - 2

    Xp = jnp.zeros((n + 2 * h, C), X.dtype)
    Xp = Xp.at[:n].set(X)
    update = _chase_update_mode()
    use_dword = (_use_dword_matvec(n, X.dtype)
                 and os.environ.get("SE_Q2_DWORD", "1") == "1")
    slots = jnp.arange(Smax)
    gr = jnp.arange(g)
    hr = jnp.arange(h)
    place_cols = gr[:, None] + jnp.arange(b)[None, :]      # (g, b)
    eye_g = jnp.eye(g, dtype=X.dtype)
    striu_mask = (gr[:, None] < gr[None, :]).astype(X.dtype)

    def body(w, Xp):
        # the active slot window slides: at wave w the admissible s satisfy
        # ceil((w - Kmax + 1)/2) <= s <= w // 2  (so that 0 <= k <= Kmax-1)
        s0 = jnp.maximum(0, (w - Kmax + 2) // 2)
        s = s0 + slots
        J = nJ - 1 - s
        k = w - 2 * s
        valid = (J >= 0) & (k >= 0) & (k <= Kmax - 1)
        base = J * g + k * b + 1
        basep = jnp.where(valid, base, n + h)              # park in the pad
        jrows = jnp.clip(J[:, None] * g + gr[None, :], 0, n - 2)  # (S, g)
        ksafe = jnp.where(valid, k, 0)
        Vblk = Vw[jrows, ksafe[:, None]].astype(X.dtype)   # (S, g, b)
        tblk = tw[jrows, ksafe[:, None]].astype(X.dtype)   # (S, g)

        Z = jnp.zeros((Smax, g, h), X.dtype)
        Z = Z.at[:, gr[:, None], place_cols].set(Vblk)
        Y = jnp.transpose(Z, (0, 2, 1))                    # (S, h, g)
        Sg = jnp.einsum("shg,shf->sgf", Y, Y)
        inv_tau = jnp.where(tblk != 0,
                            1.0 / jnp.where(tblk != 0, tblk, 1.0), 1.0)
        Tinv = Sg * striu_mask[None] + eye_g[None] * inv_tau[:, :, None]
        Tm = jax.scipy.linalg.solve_triangular(
            Tinv, jnp.broadcast_to(eye_g, Tinv.shape), lower=False)

        rows_idx = basep[:, None] + hr[None, :]            # (S, h)
        G = Xp[rows_idx]                                   # (S, h, C)
        if use_dword:
            # XLA's emulated-f64 batched einsum runs ~0.1 TFLOP/s (and is
            # the ~390 s wall at n=16384 — PLAN_SBR2.md): route each slot's
            # three GEMMs through the MXU-sliced double-word kernel.  Slots
            # are sequential under lax.map, but the per-kernel floor
            # (3 * Smax * Twaves * ~0.1 ms) is still ~20x cheaper.
            def slot_update(args):
                Ys, Tms, Gs = args                         # (h,g),(g,g),(h,C)
                W1 = _mm(Ys.T, Gs, True)                   # (g, C)
                W2 = _mm(Tms, W1, True)
                return Gs - _mm(Ys, W2, True)

            G = lax.map(slot_update, (Y, Tm, G))
        else:
            W1 = jnp.einsum("shg,shc->sgc", Y, G)
            W2 = jnp.einsum("sgf,sfc->sgc", Tm, W1)
            G = G - jnp.einsum("shg,sgc->shc", Y, W2)
        if update == "dus":
            # in-place row-block writes: the batched row scatter costs
            # ~150 ns/element on TPU (whole-buffer copy per wave) while
            # dynamic_update_slice aliases — see _chase_update_mode.
            # Parked slots write transformed zeros into the pad rows.
            def write_slot(s, Xp):
                return lax.dynamic_update_slice(
                    Xp, G[s], (basep[s], jnp.zeros((), basep.dtype)))
            return lax.fori_loop(0, Smax, write_slot, Xp)
        return Xp.at[rows_idx].set(G)

    Xp = lax.fori_loop(0, Twaves, body, Xp)
    return Xp[:n]


def apply_q2(n: int, band: int, cs, X):
    """X <- Q2 @ X (eigenvector backtransform through the stage-2 rotations).

    Q2 = G_1^T ... G_S^T, so apply G_t^T for t = S..1 to rows
    (pi_t - 1, pi_t) of X.  Sequential replay (correctness tier, see
    band_to_tridiag).
    """
    sched = jnp.asarray(_chase_schedule(n, int(band)))
    S = sched.shape[0]

    def body(k, X):
        t = S - 1 - k
        pi = sched[t, 0]
        c = cs[t, 0]
        s = cs[t, 1]
        Gt = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
        zero = jnp.zeros((), pi.dtype)
        R = lax.dynamic_slice(X, (pi - 1, zero), (2, X.shape[1]))
        return lax.dynamic_update_slice(X, Gt @ R, (pi - 1, zero))

    return lax.fori_loop(0, S, body, X)
