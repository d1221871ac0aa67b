"""Secular-equation merge kernel: deflation + vectorized shifted root finding.

This replaces the reference's ``computeEigenvalues`` (eigenvalues.c:19-255):

  * z-deflation scan (eigenvalues.c:74-81)            -> relative-tolerance mask
  * qsort + sequential Givens deflation (83-135)      -> argsort + a static
    binary wave-tree of batched rotations (log2(m) levels, fixed-shape log)
  * per-root serial bisection to 1e-14 (143-247)      -> all roots solved
    simultaneously by a safeguarded Newton iteration on the *shifted* secular
    function (LAPACK dlaed4-style: work in tau = lambda - d_nearest so pole
    differences keep full relative accuracy), under lax.while_loop
  * eigenvector normalization (257-289) and the Lowner/ dlaed3 z-recomputation
    (not present in the reference; added for orthogonality on clustered spectra)

All shapes are static; deflation is expressed as masks + a stable partition
permutation (active slots first) so the whole merge jits and vmaps across every
same-level merge of the tree.  The tearing always produces rho >= 0 (see
core/tearing.py) so only the rho > 0 interlacing branch exists
(ref handles both signs: eigenvalues.c:137-138,174-208).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class MergeRep(NamedTuple):
    """Compact representation of one rank-one merge (per-level stacked under vmap).

    All index spaces refer to the *partitioned* ordering: poles sorted ascending,
    then stably partitioned so non-deflated ("active") slots come first.
    The original (concat-of-children) row order is recovered through ``p12``.
    This is the TPU analog of the reference's per-node payload
    (Q, L, D, z, N, G, C, S, P, numGR; backtransformation.h:16-124).
    """

    poles: jnp.ndarray      # (m,) post-rotation pole values (real values in all slots)
    poles_sec: jnp.ndarray  # (m,) poles with far-away sentinels in inactive slots
    zhat: jnp.ndarray       # (m,) unit-scale z (Gu-Eisenstat refined); 0 in inactive slots
    rho: jnp.ndarray        # () effective rho (rho * ||z_active||^2)
    tau: jnp.ndarray        # (m,) root offset from its shift pole (active slots)
    shift_idx: jnp.ndarray  # (m,) int32 slot index of the shift pole per root
    colnorm: jnp.ndarray    # (m,) eigenvector column norms N_i (1 for inactive)
    K: jnp.ndarray          # () int32 number of active slots
    p12: jnp.ndarray        # (m,) int32: original index held by partitioned slot j
    rot_a: jnp.ndarray      # (m,) int32 rotation log: deflated slot (partitioned coords)
    rot_b: jnp.ndarray      # (m,) int32 rotation log: surviving slot
    rot_c: jnp.ndarray      # (m,) cosines
    rot_s: jnp.ndarray      # (m,) sines
    rot_wave: jnp.ndarray   # (m,) int32 chain depth: rotations within a wave are
    # index-disjoint, so a whole wave applies as one batched gather/scatter
    nrot: jnp.ndarray       # () int32 number of logged rotations
    nwave: jnp.ndarray      # () int32 number of waves
    colperm: jnp.ndarray    # (m,) int32: slot index of the i-th ascending eigenvalue
    lam_sorted: jnp.ndarray  # (m,) eigenvalues ascending (pads/sentinels last)


def map_slot_blocks(fn, m: int, block: int, mesh=None):
    """Run ``fn(slot_indices)`` over contiguous blocks of [0, m) and concatenate.

    Bounds live memory to O(block * m) in the O(m^2) phases (root finding, z
    recomputation, norms, U application) — at n=16384 in f64 a full m x m
    intermediate is 2.1 GB and several of them OOM a 16 GB chip; blocks of 2048
    keep the peak at ~270 MB per buffer while staying wide enough for the VPU.
    ``fn`` returns arrays with leading dim |block|; blocks run under lax.map.

    With ``mesh``, the slot range is first sharded over devices (shard_map, no
    collectives — fn's closed-over O(m) state is replicated) and each device
    lax.maps over its local blocks: this is how the wide top-of-tree merges
    use the whole mesh.
    """
    i32 = jnp.int32

    def chunked(slots):
        ms = slots.shape[0]
        B = ms
        while B > block and B % 2 == 0:
            B //= 2
        B = max(1, min(B, ms))
        nblk = ms // B
        if nblk == 1:
            return fn(slots)
        out = lax.map(lambda bi: fn(lax.dynamic_slice(slots, (bi * B,), (B,))),
                      jnp.arange(nblk, dtype=i32))
        return jax.tree.map(
            lambda a: a.reshape((nblk * B,) + a.shape[2:]), out)

    if mesh is not None:
        ndev = mesh.devices.size
        if m % ndev == 0 and m >= ndev:
            from jax.sharding import PartitionSpec as _P

            from ..dist.mesh import AXIS as _AXIS
            spec = _P(_AXIS)
            sharded = jax.shard_map(chunked, mesh=mesh, in_specs=spec,
                                    out_specs=spec, check_vma=False)
            return sharded(jnp.arange(m, dtype=i32))

    return chunked(jnp.arange(m, dtype=i32))


def _deflation_tree(ds, zs, defl0, tol):
    """Wave-tree Givens deflation over ascending poles.

    The reference (eigenvalues.c:98-135) and LAPACK dlaed2 walk the sorted
    poles sequentially, rotating the running "previous active" element into
    the current one when the induced off-diagonal |c*s*(d_b - d_a)| stays
    under tol.  A sequential chain is latency-bound on TPU: at m=16384 the
    lax.scan version costs ~960 ms (~59 us/step) — half the upsweep.

    Deflation is a *heuristic*: any set of rotations that each individually
    satisfy the tolerance test is equally correct (the skipped ones merely
    stay active).  So the chain is replaced by a static binary tree of
    ceil(log2(m)) batched levels: level l pairs, within every aligned block
    of 2^(l+1) slots, the LAST active slot of the left half with the FIRST
    active slot of the right half — every adjacent-active pair is examined
    at exactly the level where its block boundary merges, and all rotations
    within a level touch disjoint slots, so each level is one vectorized
    gather/rotate/scatter.  The earlier pole deflates and the survivor
    accumulates the z-mass (c^2 d_a + s^2 d_b / s^2 d_a + c^2 d_b), exactly
    as the reference's chain step.  Rotation waves for the replay
    (kernels/assemble.py) are simply the tree levels — disjoint by
    construction, with nwave <= ceil(log2(m)).
    """
    m = ds.shape[0]
    i32 = jnp.int32
    dt = ds.dtype
    L = max(1, (m - 1).bit_length())     # ceil(log2(m))
    M2 = 1 << L

    pad = M2 - m
    if pad:
        ds = jnp.concatenate([ds, jnp.zeros((pad,), dt)])
        zs = jnp.concatenate([zs, jnp.zeros((pad,), dt)])
        defl0 = jnp.concatenate([defl0, jnp.ones((pad,), jnp.bool_)])

    d, z, defl = ds, zs, defl0
    # dense rotation log: masked-out writes dump into slot m (trimmed after)
    ra = jnp.zeros(m + 1, i32)
    rb = jnp.zeros(m + 1, i32)
    rc = jnp.zeros(m + 1, dt)
    rs = jnp.zeros(m + 1, dt)
    rw = jnp.zeros(m + 1, i32)
    nrot = jnp.int32(0)

    for lvl in range(L):
        B = 1 << (lvl + 1)
        half = B >> 1
        nb = M2 // B
        act = (~defl).reshape(nb, B)
        ih = jnp.arange(half, dtype=i32)
        la = jnp.max(jnp.where(act[:, :half], ih[None, :], -1), axis=1)
        fi = jnp.min(jnp.where(act[:, half:], ih[None, :], half), axis=1)
        have = (la >= 0) & (fi < half)
        base = jnp.arange(nb, dtype=i32) * B
        a = base + jnp.maximum(la, 0)
        b = base + half + jnp.minimum(fi, half - 1)
        da = d[a]
        db = d[b]
        za = z[a]
        zb = z[b]
        r = jnp.sqrt(za * za + zb * zb)
        rsafe = jnp.where(r > 0, r, jnp.ones_like(r))
        c = jnp.where(r > 0, zb / rsafe, jnp.ones_like(r))
        s = jnp.where(r > 0, za / rsafe, jnp.zeros_like(r))
        do = have & (r > 0) & (jnp.abs(c * s * (db - da)) <= tol)
        d = d.at[a].set(jnp.where(do, c * c * da + s * s * db, da))
        d = d.at[b].set(jnp.where(do, s * s * da + c * c * db, db))
        z = z.at[a].set(jnp.where(do, jnp.zeros_like(za), za))
        z = z.at[b].set(jnp.where(do, r, zb))
        defl = defl.at[a].set(defl[a] | do)
        # pack this level's rotations densely after the previous levels'
        pos = nrot + jnp.cumsum(do.astype(i32)) - 1
        pos = jnp.where(do, pos, m)
        ra = ra.at[pos].set(jnp.where(do, a, ra[pos]))
        rb = rb.at[pos].set(jnp.where(do, b, rb[pos]))
        rc = rc.at[pos].set(jnp.where(do, c, rc[pos]))
        rs = rs.at[pos].set(jnp.where(do, s, rs[pos]))
        rw = rw.at[pos].set(jnp.where(do, jnp.int32(lvl + 1), rw[pos]))
        nrot = nrot + jnp.sum(do.astype(i32))

    nwave = jnp.max(rw[:m])
    return (d[:m], z[:m], defl[:m],
            (ra[:m], rb[:m], rc[:m], rs[:m], rw[:m], nrot, nwave))


def _solve_roots(poles_sec, zu, rho_e, K, active, eps, max_iters, tol_factor,
                 block, mesh=None):
    """Vectorized safeguarded Newton on the shifted secular equation.

    For active slot i (rho_e > 0): root_i lies in (d_i, d_{i+1}) (interlacing), or
    in (d_{K-1}, d_{K-1} + rho_e] for the exterior root.  We pick the nearest pole
    by one midpoint evaluation (sign of f at the interval midpoint) and solve for
    tau = lambda - d_shift.  f is strictly increasing on the bracket, so a Newton
    step clipped into the maintained bracket (bisect on clip) always converges.
    Replaces the reference's per-root bisection loop (eigenvalues.c:161-247).
    """
    m = poles_sec.shape[0]
    dt = poles_sec.dtype
    idx = jnp.arange(m, dtype=jnp.int32)
    last = jnp.maximum(K - 1, 0)
    d_last = poles_sec[last]
    # floor must stay representable under TPU's emulated f64 (f32 exponent range)
    rho_pos = jnp.maximum(rho_e, jnp.asarray(1e-30, dt))
    right = jnp.where(idx + 1 < K,
                      poles_sec[jnp.minimum(idx + 1, m - 1)],
                      d_last + rho_pos)
    gap_all = right - poles_sec
    gap_all = jnp.where(gap_all > 0, gap_all, jnp.asarray(1.0, dt))
    zu2 = zu * zu
    tolf = jnp.asarray(tol_factor * eps, dt)

    # Newton on h(tau) = tau * D(tau) - rho_e * z_s^2, where
    # D(tau) = 1 + rho_e * sum_{j != s} z_j^2 / (delta_j - tau).
    # h has the same roots as the secular f = D - rho_e z_s^2 / tau but keeps
    # full *relative* accuracy for roots arbitrarily close to their pole
    # (LAPACK dlaed4's singular-term isolation); this is what lets the
    # Gu-Eisenstat z-recomputation reproduce tiny z-entries and is essential
    # for the 1e-12*||T|| residual target.  Roots are solved per slot-block
    # (map_slot_blocks): each block's while_loop exits as soon as *its* roots
    # converge, and live memory is O(block * m).

    # Pallas path: the per-iteration O(block x m) reductions run in a VMEM
    # kernel (double-word sums at f32 VPU rate) instead of XLA's emulated-f64
    # lowering, which materializes ~10 (block, m) f32-pair temporaries in HBM
    # per iteration.  The O(block) scalar update stays in XLA f64.
    use_kernel = False
    if jnp.float64 == dt:
        try:
            use_kernel = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            use_kernel = False

    def solve_block(sl):
        gap = gap_all[sl]
        mid = poles_sec[sl] + 0.5 * gap
        dif0 = poles_sec[None, :] - mid[:, None]
        fmid = 1.0 + rho_e * jnp.sum(zu2[None, :] / dif0, axis=1)
        is_exterior = sl == (K - 1)
        shift_left = (fmid > 0) | is_exterior
        shift_idx = jnp.where(shift_left, sl, jnp.minimum(sl + 1, m - 1))
        shift_val = poles_sec[shift_idx]
        lo = jnp.where(shift_left,
                       jnp.where(fmid > 0, jnp.zeros_like(gap), 0.5 * gap),
                       -0.5 * gap)
        hi = jnp.where(shift_left,
                       jnp.where(fmid > 0, 0.5 * gap, gap),
                       jnp.zeros_like(gap))
        tau0 = 0.5 * (lo + hi)
        zs2 = zu2[shift_idx]
        i32 = jnp.int32
        # bracket poles for the dlaed4 "middle way" model: delta_lo at slot sl
        # (left bracket pole), delta_hi at sl+1 (or a far fake pole for the
        # exterior root so the quadratic's spurious root stays out of bracket)
        interior = (sl + 1) < K
        delta_lo = poles_sec[sl] - shift_val
        delta_hi = jnp.where(interior,
                             poles_sec[jnp.minimum(sl + 1, m - 1)] - shift_val,
                             4.0 * (jnp.abs(gap) + 1.0))

        from .pallas import secular_sums as _ss
        kernel_ok = use_kernel and _ss.supported(m, int(sl.shape[0]))
        # the kernel's compensated sums sit at ~2^-45..-46 (vs the emulated
        # f64 path's 2^-48): widen the convergence tolerance accordingly so
        # roots converge instead of burning iterations on the noise floor
        tolf_eff = tolf * (4.0 if kernel_ok else 1.0)

        if kernel_ok:
            def sums(tau):
                S1, S2, S1L, S2L = _ss.secular_sums(
                    poles_sec, zu2, shift_val, tau, sl)
                # the shift slot's dif is -tau EXACTLY (shift_val is the
                # pole), so the singular terms come straight from tau
                t1s = -zs2 / tau
                t2s = zs2 / (tau * tau)
                return S1, S2, S1L, S2L, t1s, t2s
        else:
            mask_left = jnp.arange(m, dtype=i32)[None, :] <= sl[:, None]

            def sums(tau):
                dif = (poles_sec[None, :] - shift_val[:, None]) - tau[:, None]
                inv = 1.0 / dif
                t1 = zu2[None, :] * inv
                t2 = t1 * inv
                t1s = jnp.take_along_axis(
                    t1, shift_idx[:, None].astype(i32), axis=1)[:, 0]
                t2s = jnp.take_along_axis(
                    t2, shift_idx[:, None].astype(i32), axis=1)[:, 0]
                S1 = jnp.sum(t1, axis=1)
                S2 = jnp.sum(t2, axis=1)
                S1L = jnp.sum(jnp.where(mask_left, t1, 0.0), axis=1)
                S2L = jnp.sum(jnp.where(mask_left, t2, 0.0), axis=1)
                return S1, S2, S1L, S2L, t1s, t2s

        def cond(state):
            tau, lo, hi, done, it = state
            return (it < max_iters) & ~jnp.all(done)

        def body(state):
            tau, lo, hi, done, it = state
            S1, S2, S1L, S2L, t1s, t2s = sums(tau)
            psi = rho_e * S1L
            psi1 = rho_e * S2L
            phi = rho_e * S1 - psi
            phi1 = rho_e * S2 - psi1
            f = 1.0 + psi + phi
            # accurate convergence test on h = tau*D - rho*z_s^2 (singular
            # term isolated; exact for roots arbitrarily close to the pole)
            Ds = 1.0 + rho_e * (S1 - t1s)
            h = tau * Ds - rho_e * zs2
            scale_h = jnp.abs(tau) * (1.0 + jnp.abs(rho_e)
                                      * jnp.abs(S1 - t1s)) \
                + rho_e * zs2
            done_now = jnp.abs(h) <= tolf_eff * scale_h
            # sign(f) = sign(h) * sign(tau); f > 0 => root below tau
            f_pos = (h > 0) ^ (tau < 0)
            hi_n = jnp.where(f_pos, jnp.minimum(hi, tau), hi)
            lo_n = jnp.where(f_pos, lo, jnp.maximum(lo, tau))
            # middle-way model: fit c3 + c1/(Dlo - eta) + c2/(Dhi - eta) to
            # f and f' (each side's sum approximated by its bracket pole,
            # matching value and derivative) ->  a eta^2 - b eta + c = 0
            Dlo = delta_lo - tau
            Dhi = delta_hi - tau
            c1 = psi1 * Dlo * Dlo
            c2 = phi1 * Dhi * Dhi
            c3 = f - Dlo * psi1 - Dhi * phi1
            a = c3
            b = c3 * (Dlo + Dhi) + c1 + c2
            c = f * Dlo * Dhi
            disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
            sq = jnp.sqrt(disc)
            q = 0.5 * (b + jnp.where(b >= 0, sq, -sq))
            big = jnp.asarray(1e30, dt)
            e1 = jnp.where(a != 0, q / jnp.where(a != 0, a, 1.0), big)
            e2 = jnp.where(q != 0, c / jnp.where(q != 0, q, 1.0), big)
            cand1 = tau + e1
            cand2 = tau + e2
            in1 = (cand1 > lo_n) & (cand1 < hi_n)
            in2 = (cand2 > lo_n) & (cand2 < hi_n)
            # prefer the smaller step (tangent root) among in-bracket options
            pick1 = in1 & (~in2 | (jnp.abs(e1) <= jnp.abs(e2)))
            t_quad = jnp.where(pick1, cand1, cand2)
            ok_quad = (in1 | in2) & jnp.isfinite(t_quad)
            # fallbacks: safeguarded Newton on h, then bisection
            hp = Ds + tau * rho_e * (S2 - t2s)
            hp_safe = jnp.where(hp != 0, hp, jnp.ones_like(hp))
            t_newton = tau - h / hp_safe
            in_n = (t_newton > lo_n) & (t_newton < hi_n)
            t_next = jnp.where(ok_quad, t_quad,
                               jnp.where(in_n, t_newton,
                                         0.5 * (lo_n + hi_n)))
            frozen = done | done_now
            tau = jnp.where(frozen, tau, t_next)
            return tau, lo_n, hi_n, frozen, it + 1

        state0 = (tau0, lo, hi, ~active[sl], jnp.int32(0))
        tau, _, _, _, _ = lax.while_loop(cond, body, state0)
        return tau, shift_idx.astype(jnp.int32), shift_val

    return map_slot_blocks(solve_block, m, block, mesh=mesh)


def _gu_eisenstat_z(poles_sec, zu, tau, shift_val, active, block, mesh=None):
    """Recompute z so computed lambdas are *exact* eigenvalues of the model
    (Lowner formula; LAPACK dlaed3).  Guarantees eigenvector orthogonality to
    working precision even under heavy clustering.

    zhat_j^2 = prod_{k active, k != j} (lam_k - d_j)/(d_k - d_j) * (lam_j - d_j)
    with lam_k - d_j evaluated as (shift_k - d_j) + tau_k (no cancellation).
    Evaluated per j-block (live memory O(block * m)).
    """
    m = poles_sec.shape[0]
    idx = jnp.arange(m)

    def j_block(js):
        pj = poles_sec[js]
        A = (shift_val[:, None] - pj[None, :]) + tau[:, None]   # lam_k - d_j
        B = poles_sec[:, None] - pj[None, :]                     # d_k - d_j
        offdiag = idx[:, None] != js[None, :]
        use = active[:, None] & offdiag
        B_safe = jnp.where(use, B, jnp.ones_like(B))
        ratio = jnp.where(use, A / B_safe, jnp.ones_like(A))
        prod = jnp.prod(ratio, axis=0)
        lam_minus_d = (shift_val[js] - pj) + tau[js]   # diag: lam_j - d_j
        return prod * lam_minus_d

    z2 = map_slot_blocks(j_block, m, block, mesh=mesh)
    zhat = jnp.sign(zu) * jnp.sqrt(jnp.maximum(z2, 0.0))
    return jnp.where(active, zhat, jnp.zeros_like(zhat))


def merge_decompose(d, z, rho, *, eps: float, deflation_factor: float,
                    max_secular_iters: int, secular_tol_factor: float,
                    use_gu_eisenstat: bool, block_size: int = 2048) -> MergeRep:
    """Solve one rank-one merge D + rho z z^T -> compact MergeRep.

    ``d``: (m,) child eigenvalues (any order; pads carry large sentinels and
    exactly/near-zero z).  ``z``: (m,).  ``rho``: () >= 0.
    """
    part = merge_partition(d, z, rho, eps=eps,
                           deflation_factor=deflation_factor)
    return merge_roots(part, eps=eps,
                       max_secular_iters=max_secular_iters,
                       secular_tol_factor=secular_tol_factor,
                       use_gu_eisenstat=use_gu_eisenstat,
                       block_size=block_size)


class MergePartition(NamedTuple):
    """Sort/deflation/partition state (stage 1 of a merge): O(m) data only.

    Splitting here lets the O(m^2) root-finding stage run sharded over slots
    across devices for the wide top-of-tree merges (stage 1 is O(m log m) and
    inherently sequential in the rotation chain, so it replicates)."""

    poles: jnp.ndarray
    poles_sec: jnp.ndarray
    zu: jnp.ndarray
    rho_e: jnp.ndarray
    K: jnp.ndarray
    p12: jnp.ndarray
    rot_a: jnp.ndarray
    rot_b: jnp.ndarray
    rot_c: jnp.ndarray
    rot_s: jnp.ndarray
    rot_wave: jnp.ndarray
    nrot: jnp.ndarray
    nwave: jnp.ndarray


def merge_partition(d, z, rho, *, eps: float,
                    deflation_factor: float) -> MergePartition:
    """Stage 1: sort, z-deflation, Givens deflation, stable partition."""
    m = d.shape[0]
    dt = d.dtype
    i32 = jnp.int32

    perm1 = jnp.argsort(d, stable=True)
    ds = d[perm1]
    zs = z[perm1]

    znorm0_sq = jnp.sum(zs * zs)
    znorm0 = jnp.sqrt(znorm0_sq)
    # Deflation scale over *real* slots only: pad sentinels (z == 0 exactly,
    # pole values ramped far above the spectrum) would otherwise inflate the
    # tolerance ~40-60x for ragged n with many padded leaves, eroding the
    # 1e-12*||T|| residual headroom under TPU eps 2^-48.
    pole_scale = jnp.max(jnp.abs(jnp.where(zs != 0.0, ds, jnp.zeros_like(ds))))
    pole_scale = jnp.where(pole_scale > 0, pole_scale, jnp.max(jnp.abs(ds)))
    scale = jnp.maximum(pole_scale, jnp.abs(rho) * znorm0_sq)
    scale = jnp.maximum(scale, jnp.asarray(1e-30, dt))
    tol = jnp.asarray(deflation_factor * eps, dt) * scale

    # type-1 deflation: negligible z component (ref eigenvalues.c:74-81)
    zdef = jnp.abs(rho) * znorm0 * jnp.abs(zs) <= tol
    zs0 = jnp.where(zdef, jnp.zeros_like(zs), zs)

    # type-2 deflation: close poles, Givens rotations (ref eigenvalues.c:98-135)
    d2, z2, defl, (ra, rb, rc, rs, rw, nrot, nwave) = _deflation_tree(
        ds, zs0, zdef, tol)

    # stable partition: active slots first
    perm2 = jnp.argsort(defl, stable=True)
    da = d2[perm2]
    za = z2[perm2]
    K = (m - jnp.sum(defl)).astype(i32)
    inv2 = jnp.argsort(perm2)          # sorted position -> partitioned slot
    ra_p = inv2[ra].astype(i32)
    rb_p = inv2[rb].astype(i32)
    p12 = perm1[perm2].astype(i32)

    idx = jnp.arange(m, dtype=i32)
    active = idx < K

    znorm_sq = jnp.sum(za * za)
    znorm = jnp.sqrt(jnp.maximum(znorm_sq, jnp.asarray(1e-30, dt)))
    zu = jnp.where(active, za / znorm, jnp.zeros_like(za))
    rho_e = rho * znorm_sq

    # sentinel poles in inactive slots keep every denominator nonzero
    sent_base = 4.0 * scale + 4.0
    sent_step = 1e-3 * scale + 1e-3
    poles_sec = jnp.where(active, da, sent_base + idx.astype(dt) * sent_step)

    return MergePartition(poles=da, poles_sec=poles_sec, zu=zu,
                          rho_e=rho_e, K=K, p12=p12,
                          rot_a=ra_p, rot_b=rb_p, rot_c=rc, rot_s=rs,
                          rot_wave=rw.astype(i32),
                          nrot=nrot.astype(i32), nwave=nwave.astype(i32))


def merge_roots(part: MergePartition, *, eps: float, max_secular_iters: int,
                secular_tol_factor: float, use_gu_eisenstat: bool,
                block_size: int = 2048, slot_mesh=None) -> MergeRep:
    """Stage 2: the O(m^2) slot-parallel work — root finding, Gu-Eisenstat z,
    column norms.  With ``slot_mesh`` the slot blocks are sharded over devices
    (the reference's unexploited parallelism: non-owner ranks return early at
    eigenvalues.c:63-66; here every chip solves its own share of the roots)."""
    da = part.poles
    poles_sec = part.poles_sec
    zu = part.zu
    rho_e = part.rho_e
    K = part.K
    m = da.shape[0]
    i32 = jnp.int32
    active = jnp.arange(m, dtype=i32) < K

    tau, shift_idx, shift_val = _solve_roots(
        poles_sec, zu, rho_e, K, active, eps,
        max_secular_iters, secular_tol_factor, block_size, mesh=slot_mesh)

    zvec = zu
    if use_gu_eisenstat:
        zvec = _gu_eisenstat_z(poles_sec, zu, tau, shift_val, active,
                               block_size, mesh=slot_mesh)

    # column norms N_i = ||zhat_j / (d_j - lam_i)||  (ref eigenvalues.c:257-289)
    # ratio-first: dif^2 can underflow on TPU's emulated f64 (f32 exponent
    # range, ~1e+-38) when a root sits ~1e-25 from its pole; z/dif stays
    # representable (~1e13) while dif*dif does not.  Per slot-block.
    def norm_block(sl):
        dif = (poles_sec[None, :] - shift_val[sl][:, None]) - tau[sl][:, None]
        ratio = zvec[None, :] / dif
        return jnp.sqrt(jnp.sum(ratio * ratio, axis=1))

    colnorm = map_slot_blocks(norm_block, m, block_size, mesh=slot_mesh)
    colnorm = jnp.where(active & (colnorm > 0), colnorm, jnp.ones_like(colnorm))

    def _tail(shift_val, tau, da):
        lam_slot = jnp.where(active, shift_val + tau, da)
        colperm = jnp.argsort(lam_slot, stable=True).astype(i32)
        return colperm, lam_slot[colperm]

    if slot_mesh is not None:
        from ..dist.mesh import replicated as _repl
        colperm, lam_sorted = _repl(_tail, slot_mesh)(shift_val, tau, da)
    else:
        colperm, lam_sorted = _tail(shift_val, tau, da)

    return MergeRep(poles=da, poles_sec=poles_sec, zhat=zvec,
                    rho=rho_e, tau=tau, shift_idx=shift_idx.astype(i32),
                    colnorm=colnorm, K=K, p12=part.p12,
                    rot_a=part.rot_a, rot_b=part.rot_b,
                    rot_c=part.rot_c, rot_s=part.rot_s,
                    rot_wave=part.rot_wave,
                    nrot=part.nrot, nwave=part.nwave, colperm=colperm,
                    lam_sorted=lam_sorted)
