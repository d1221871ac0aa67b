"""Eigenvector assembly from a MergeRep: U application and row propagation.

Replaces the reference's ``getEigenVector`` / ``computeNormalizationFactors``
(eigenvalues.c:257-358) and the scalar first/last-row dot products of the conquer
loop (main.c:612-661).  U is never stored: it is *rematerialized* in row blocks
from the compact MergeRep (an elementwise Cauchy-like kernel) and immediately
consumed by MXU matmuls — trading cheap FLOPs for HBM, which is what the
1e+-38-range / 16 GB TPU memory system wants.

Coordinate convention: ``U[j, i]`` with rows j = pole coordinates (original
concat-of-children order after ``p12`` inversion) and columns i = eigenvalues in
ascending order (via ``colperm``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .secular import MergeRep, map_slot_blocks

_warned_fallback: set = set()


def _warn_pallas_fallback(m: int, c: int) -> None:
    """One-line note (once per shape) when the fused Cauchy kernel declines a
    shape and the slower XLA generate-then-dot path runs instead — so a
    config change (e.g. vec_chunk) can't silently cost the ~2x kernel win."""
    key = (m, c)
    if key not in _warned_fallback:
        _warned_fallback.add(key)
        import sys
        print(f"note: pallas cauchy_matmul fallback to XLA path for "
              f"shape m={m}, C={c} (needs m%8==0 and C%512==0)",
              file=sys.stderr)


def _denom_block(rep: MergeRep, rows, slots):
    """(|rows|, |slots|) of d_row - lam_slot = (d_row - d_shift) - tau."""
    shift = rep.shift_idx[slots]
    return ((rep.poles_sec[rows][:, None] - rep.poles_sec[shift][None, :])
            - rep.tau[slots][None, :])


_WAVE_LIMIT = 24   # deflation tree depth is ceil(log2(m)): 17 at m=128Ki


def _replay_rotations_rows(rep: MergeRep, u):
    """Apply the inverse Givens chain to rows of u (reverse log order; direct
    pattern) — ref eigenvalues.c:343-357.

    Heavy deflation (e.g. Poisson-like spectra: nearly every pole deflates)
    makes a per-rotation loop catastrophic: ~m sequential two-row updates at
    ~0.2 ms each (observed 67 s at n=16384).  Rotations within a *wave* (chain
    depth, recorded by the deflation scan) are index-disjoint, so each wave
    applies as one batched gather/scatter; chains are short in practice, so a
    handful of waves replaces hundreds of thousands of loop steps.  Deep-chain
    outliers (> _WAVE_LIMIT waves) fall back to the sequential loop.
    """
    m = rep.poles.shape[0]

    def sequential(u):
        def body(i, u):
            k = rep.nrot - 1 - i
            a = rep.rot_a[k]
            b = rep.rot_b[k]
            c = rep.rot_c[k].astype(u.dtype)
            s = rep.rot_s[k].astype(u.dtype)
            ua = u[a]
            ub = u[b]
            u = u.at[a].set(c * ua + s * ub)
            u = u.at[b].set(-s * ua + c * ub)
            return u

        return lax.fori_loop(0, rep.nrot, body, u)

    def waves(u):
        # pad row m is the dump target for masked-out rotations
        upad = jnp.concatenate([u, jnp.zeros((1,) + u.shape[1:], u.dtype)])
        valid = jnp.arange(m, dtype=rep.nrot.dtype) < rep.nrot

        def body(wi, upad):
            w = rep.nwave - wi            # waves are 1-based; reverse order
            mask = valid & (rep.rot_wave == w)
            a = jnp.where(mask, rep.rot_a, m)
            b = jnp.where(mask, rep.rot_b, m)
            c = jnp.where(mask, rep.rot_c, 1.0).astype(u.dtype)[:, None]
            s = jnp.where(mask, rep.rot_s, 0.0).astype(u.dtype)[:, None]
            ua = upad[a]
            ub = upad[b]
            upad = upad.at[a].set(c * ua + s * ub)
            upad = upad.at[b].set(-s * ua + c * ub)
            return upad

        return lax.fori_loop(0, rep.nwave, body, upad)[:m]

    # waves pay O(nwave) full passes over u regardless of rotation count, so
    # they only win when there are many rotations (heavy deflation)
    use_waves = (rep.nrot > 64) & (rep.nwave <= _WAVE_LIMIT)
    return lax.cond(use_waves, waves, sequential, u)


def _replay_rotations_cols_t(rep: MergeRep, w):
    """Apply the transposed chain to columns of w (forward log order), used when
    computing  w @ R @ U_slot  without materializing U.  Wave-batched like
    ``_replay_rotations_rows`` (forward order = ascending waves)."""
    m = rep.poles.shape[0]

    def sequential(w):
        def body(k, w):
            a = rep.rot_a[k]
            b = rep.rot_b[k]
            c = rep.rot_c[k].astype(w.dtype)
            s = rep.rot_s[k].astype(w.dtype)
            wa = w[:, a]
            wb = w[:, b]
            w = w.at[:, a].set(c * wa - s * wb)
            w = w.at[:, b].set(s * wa + c * wb)
            return w

        return lax.fori_loop(0, rep.nrot, body, w)

    def waves(w):
        wpad = jnp.concatenate(
            [w, jnp.zeros(w.shape[:-1] + (1,), w.dtype)], axis=-1)
        valid = jnp.arange(m, dtype=rep.nrot.dtype) < rep.nrot

        def body(wv, wpad):
            mask = valid & (rep.rot_wave == wv + 1)   # ascending waves
            a = jnp.where(mask, rep.rot_a, m)
            b = jnp.where(mask, rep.rot_b, m)
            c = jnp.where(mask, rep.rot_c, 1.0).astype(w.dtype)[None, :]
            s = jnp.where(mask, rep.rot_s, 0.0).astype(w.dtype)[None, :]
            wa = wpad[:, a]
            wb = wpad[:, b]
            wpad = wpad.at[:, a].set(c * wa - s * wb)
            wpad = wpad.at[:, b].set(s * wa + c * wb)
            return wpad

        return lax.fori_loop(0, rep.nwave, body, wpad)[:, :m]

    use_waves = (rep.nrot > 64) & (rep.nwave <= _WAVE_LIMIT)
    return lax.cond(use_waves, waves, sequential, w)


def assemble_u(rep: MergeRep, cols: Optional[jnp.ndarray] = None,
               block: int = 2048, dtype=None):
    """Materialize U columns.  ``cols``: indices into the ascending eigenvalue
    order (None = all m columns).  Returns (m, C) with rows in original order.
    Rows are produced in blocks of ``block`` to bound live memory.
    ``dtype``: output dtype — entries are always *computed* at full precision
    (near-pole denominators underflow f32) and cast per block.
    """
    m = rep.poles.shape[0]
    slots = rep.colperm if cols is None else rep.colperm[cols]
    act = slots < rep.K
    ncol = rep.colnorm[slots]

    # mixed-precision fast path: VMEM pair-f32 generation (the XLA emulated
    # f64 generate-and-divide was the single biggest downsweep piece at the
    # ROOT — DOWNSWEEP_LEVELS.json r5)
    import os
    use_pallas = False
    if dtype == jnp.float32 and os.environ.get(
            "SE_ROOT_MATERIALIZE", "1") == "1":
        # validated on hardware 2026-08-20 (q3v: rel 9.2e-8 vs the f64
        # reference path, identity columns exact — PALLAS_TPU.json)
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            use_pallas = False
    if use_pallas:
        from .pallas.cauchy_matmul import (cauchy_materialize,
                                           materialize_supported)
        C = int(slots.shape[0])
        if materialize_supported(m, C):
            shift_sel = rep.poles_sec[rep.shift_idx[slots]]
            tau_sel = rep.tau[slots]
            ninv_sel = jnp.where(act, 1.0 / ncol, jnp.zeros_like(ncol))
            u = cauchy_materialize(rep.poles_sec, shift_sel, tau_sel,
                                   rep.zhat, ninv_sel, slots, rep.K)
            u = _replay_rotations_rows(rep, u)
            return u[jnp.argsort(rep.p12)]
        _warn_pallas_fallback(m, C)

    def row_block(rows):
        denom = _denom_block(rep, rows, slots)
        u = rep.zhat[rows][:, None] / denom / ncol[None, :]
        eye_cols = rows[:, None] == slots[None, :].astype(rows.dtype)
        u = jnp.where(act[None, :], u, eye_cols.astype(u.dtype))
        return u.astype(dtype) if dtype is not None else u

    u = map_slot_blocks(row_block, m, block)
    u = _replay_rotations_rows(rep, u)
    inv_rows = jnp.argsort(rep.p12)
    return u[inv_rows]


def _apply_u_matmul(rep: MergeRep, X, block: int):
    """Phase A of apply_u: Y0 = [[Ua, 0],[0, I]] P_col X (partitioned rows)."""
    m = rep.poles.shape[0]
    inv_col = jnp.argsort(rep.colperm)
    Xs = X[inv_col]
    slots = jnp.arange(m, dtype=rep.colperm.dtype)
    act = slots < rep.K
    ncol_inv = jnp.where(act, 1.0 / rep.colnorm, jnp.zeros_like(rep.colnorm))

    # mixed-precision fast path: fused Pallas generation+matmul on TPU
    use_pallas = False
    if X.dtype == jnp.float32:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        from .pallas.cauchy_matmul import cauchy_matmul, supported
        if supported(m, X.shape[1]):
            shift_val = rep.poles_sec[rep.shift_idx]
            # kact=rep.K: survivors-first slot order + zero ncol_inv past K
            # let the kernel skip deflated contraction blocks bit-exactly
            yb = cauchy_matmul(rep.poles_sec, shift_val, rep.tau,
                               rep.zhat, ncol_inv, Xs, kact=rep.K)
            passthrough = (slots >= rep.K)[:, None]
            return yb + jnp.where(passthrough, Xs, jnp.zeros_like(yb))
        _warn_pallas_fallback(m, X.shape[1])

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False

    def row_block(rows):
        denom = _denom_block(rep, rows, slots)
        Mb = (rep.zhat[rows][:, None] / denom) * ncol_inv[None, :]
        # mixed precision: U entries are computed in f64 (near-pole safety)
        # and cast so the matmul runs at the MXU's native f32 rate; HIGHEST
        # for f32 because TPU's default f32 dot is a single bf16 pass (~4e-3
        # — would swamp the refinement's f32-grade contamination model)
        if Xs.dtype == jnp.float64 and on_tpu:
            # f64-vectors mode: XLA's emulated-f64 mat-mat dot is only
            # ~1e-6-grade at these contraction lengths (CLAUDE.md) — ride
            # the double-word MXU kernel instead
            from .pallas.dword_matmul import dword_matmul
            yb = dword_matmul(Mb, Xs)
        else:
            prec = (lax.Precision.HIGHEST if Xs.dtype == jnp.float32
                    else None)
            yb = jnp.matmul(Mb.astype(Xs.dtype), Xs, precision=prec)
        # inactive columns are e_slot: identity passthrough on inactive rows
        passthrough = (rows >= rep.K)[:, None]
        return yb + jnp.where(passthrough, Xs[rows], jnp.zeros_like(yb))

    return map_slot_blocks(row_block, m, block)


def _apply_u_finish(rep: MergeRep, y):
    """Phase B: inverse-rotation replay on rows + un-permute to original order."""
    y = _replay_rotations_rows(rep, y)
    return y[jnp.argsort(rep.p12)]


def apply_u(rep: MergeRep, X, block: int = 2048):
    """Y = U @ X without materializing U  (the downsweep workhorse).

    ``X``: (m, C), rows indexed by this merge's ascending-eigenvalue order.
    Returns (m, C) with rows in the original (concat-of-children) order.
    U factorizes as  P_row^-1 R [[Ua, 0], [0, I]] P_col, so:
      Xs = P_col X;  Y0 = M Xs + (inactive-row passthrough);  rotations on rows;
      un-permute rows.  M row blocks are generated on the fly and hit the MXU.
    """
    return _apply_u_finish(rep, _apply_u_matmul(rep, X, block))


def _replay_rotations_level(reps, y):
    """Inverse Givens replay for a WHOLE level at once: y (k, m, C).

    The per-merge ``lax.map`` replay is sequential over merges — k stacked
    fori loops of ~0.4 ms each, 0.48 s at the Poisson n=16384 m=128 level
    (DOWNSWEEP_LEVELS_POISSON.json, r5) where nearly every pole deflates.
    Rotations are index-disjoint ACROSS merges (each acts inside its own
    m-row block), so one global wave loop over the flattened (k*m, C)
    array applies every merge's wave-w rotations in one batched
    gather/compute/scatter — per-LEVEL latency instead of per-merge.
    Global wave order w = max(nwave)..1 preserves each merge's own
    descending wave order (a merge simply has no rotations above its
    nwave).  Light-deflation levels keep the per-merge path: the global
    loop pays O(max nwave) full (k*m, C) passes regardless of rotation
    count, and per-merge `sequential` is cheaper when rotations are rare.
    """
    k, m, C = y.shape

    def batched(y):
        yf = y.reshape(k * m, C)
        upad = jnp.concatenate([yf, jnp.zeros((1, C), yf.dtype)])
        valid = (jnp.arange(m, dtype=reps.nrot.dtype)[None, :]
                 < reps.nrot[:, None])                       # (k, m)
        off = (jnp.arange(k, dtype=reps.rot_a.dtype) * m)[:, None]
        park = k * m
        nw_max = jnp.max(reps.nwave)

        def body(wi, upad):
            w = nw_max - wi
            mask = valid & (reps.rot_wave == w)
            a = jnp.where(mask, reps.rot_a + off, park).reshape(-1)
            b = jnp.where(mask, reps.rot_b + off, park).reshape(-1)
            c = jnp.where(mask, reps.rot_c,
                          1.0).astype(yf.dtype).reshape(-1)[:, None]
            s = jnp.where(mask, reps.rot_s,
                          0.0).astype(yf.dtype).reshape(-1)[:, None]
            ua = upad[a]
            ub = upad[b]
            upad = upad.at[a].set(c * ua + s * ub)
            upad = upad.at[b].set(-s * ua + c * ub)
            return upad

        upad = lax.fori_loop(0, nw_max, body, upad)
        return upad[:k * m].reshape(k, m, C)

    def per_merge(y):
        return lax.map(lambda args: _replay_rotations_rows(*args), (reps, y))

    heavy = (jnp.sum(reps.nrot) > 64 * k) \
        & (jnp.max(reps.nwave) <= _WAVE_LIMIT)
    return lax.cond(heavy, batched, per_merge, y)


def apply_u_level(reps, X, block: int = 2048):
    """Batched apply_u over one tree level: reps (k-stacked), X (k, m, C).

    The matmul phase is vmapped (fused Pallas Cauchy kernel with the
    deflation skip); the rotation replay is level-batched for
    heavy-deflation levels and per-merge sequential otherwise
    (:func:`_replay_rotations_level` — vmapping the dynamic row updates
    would turn them into scatters whose per-op VMEM footprint blows the
    16 MB limit for wide C).
    """
    y0 = jax.vmap(lambda r, Xb: _apply_u_matmul(r, Xb, block))(reps, X)
    y = _replay_rotations_level(reps, y0)
    inv_rows = jax.vmap(jnp.argsort)(reps.p12)               # (k, m)
    return jnp.take_along_axis(y, inv_rows[:, :, None], axis=1)


def rows_through_merge(rep: MergeRep, w, block: int = 2048):
    """y = w @ (R U_slot) with output columns in ascending-eigenvalue order.

    ``w``: (r, m) rows in original coordinates.  Used on the upsweep to push the
    subtree's first/last boundary rows through a merge (the 'only two rows
    travel' trick of the reference, main.c:583-595) at O(r*m^2) cost without
    materializing U.
    """
    m = rep.poles.shape[0]
    wp = w[:, rep.p12]
    wp = _replay_rotations_cols_t(rep, wp)
    wz = wp * rep.zhat[None, :]

    import os
    use_pallas = False
    if (w.dtype == jnp.float64
            and os.environ.get("SYMEIG_DISABLE_ROWSUM") != "1"):
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        from .pallas.cauchy_rowsum import cauchy_rowsum, supported
        if supported(m, w.shape[0]):
            shift_val = rep.poles_sec[rep.shift_idx]
            S = cauchy_rowsum(rep.poles_sec, shift_val, rep.tau, wz)
            active = (jnp.arange(m, dtype=rep.colperm.dtype) < rep.K)[None, :]
            y = jnp.where(active, S / rep.colnorm[None, :], wp)
            return y[:, rep.colperm]

    rows = jnp.arange(m, dtype=rep.colperm.dtype)

    def col_block(slots):
        denom = _denom_block(rep, rows, slots)       # (m, B)
        y_act = (wz @ (1.0 / denom)) / rep.colnorm[slots][None, :]
        active = (slots < rep.K)[None, :]
        return jnp.where(active, y_act, wp[:, slots]).T   # (B, r)

    y = map_slot_blocks(col_block, m, block).T            # (r, m)
    return y[:, rep.colperm]
