"""Solver driver: divide -> batched leaf solve -> batched conquer -> downsweep.

This is the TPU-native re-architecture of the reference's ``main()`` orchestration
(main.c:227-698) and its distributed backtransformation (filehandling.c:241-574):

  * the divide phase's MPI Send/Recv of matrix halves (main.c:397-417) becomes a
    single vectorized tearing scatter (core/tearing.py) — distribution is sharding;
  * the per-rank conquer loop (main.c:495-664) becomes one vmapped merge kernel
    per tree level, so all same-level merges execute together;
  * the per-eigenvector row pipeline of writeResults (filehandling.c:369-507,
    O(n^2) per row with n Bcast/Barrier rounds) becomes a top-down sweep of
    batched dense matmuls:  W[:, sel] = BD(Q_leaf) * BD(U_{L-1}) * ... * U_root[:, sel],
    with each level's U rematerialized from its compact MergeRep.

``solve_tridiagonal`` runs the whole solve in a single jit (one dispatch);
``solve_tridiagonal_staged`` (CLI/bench path) splits upsweep / per-level
downsweep dispatches for phase timing and bounded HBM, with optional
mixed-precision eigenvectors (f32 MXU matmuls + f64 inverse-iteration
refinement).
"""

from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, SolverConfig
from .core.tearing import tear
from .core.tree import TreePlan, build_plan
from .core.tridiag import residual_norms

_residual_norms_jit = jax.jit(residual_norms)


@functools.lru_cache(maxsize=32)
def _compiled_residuals(n: int, C: int, chunk: int):
    """All measured-residual chunks in ONE dispatch (lax.map over chunks).

    The epilogue's triage measures ||T v - lam v|| for every column in
    column chunks (a full-width f64 pass allocates several 2.1 GB
    temporaries at n=16384 and OOMs next to the live downsweep buffers).
    Dispatching each chunk separately costs ~16 ms per chunk on the
    tunneled platform (measured: residuals1 was 0.25 s = 16 chunks at
    n=16384 and 0.07 s = 4 chunks at n=4096 — per-chunk, not per-byte),
    so the chunk loop runs inside one jit: same bounded (n, chunk)
    working set, one dispatch + one host fetch.
    """
    import jax.lax as lax
    K = (C + chunk - 1) // chunk
    Cp = K * chunk

    def fn(d, e, lam_c, V_c):
        if Cp != C:
            # padded columns are exact zeros -> residual 0, sliced off below
            lam_c = jnp.concatenate(
                [lam_c, jnp.zeros(Cp - C, lam_c.dtype)])
            V_c = jnp.pad(V_c, ((0, 0), (0, Cp - C)))

        def body(o):
            lam_k = lax.dynamic_slice(lam_c, (o,), (chunk,))
            V_k = lax.dynamic_slice(V_c, (0, o), (n, chunk))
            return residual_norms(d, e, lam_k, V_k)

        out = lax.map(body, jnp.arange(K) * chunk)      # (K, chunk)
        return out.reshape(Cp)[:C]

    return jax.jit(fn)
from .dist.mesh import batch_mapped as _batch_mapped
from .dist.mesh import replicated as _replicated
from .kernels.assemble import (apply_u, apply_u_level, assemble_u,
                               rows_through_merge)
from .kernels.leaf import leaf_blocks, leaf_eigh_fn, solve_leaves
from .kernels.secular import merge_decompose, merge_partition, merge_roots


class EighTridiagonalResult(NamedTuple):
    eigenvalues: jnp.ndarray              # (n,) ascending
    eigenvectors: Optional[jnp.ndarray]   # (n, C) columns match `select` order (or all n)


def _merge_kwargs(config: SolverConfig):
    return dict(eps=config.eps(),
                deflation_factor=config.deflation_factor,
                max_secular_iters=config.max_secular_iters,
                secular_tol_factor=config.secular_tol_factor,
                use_gu_eisenstat=config.use_gu_eisenstat,
                block_size=config.block_size)


def _upsweep(d, e, plan: TreePlan, config: SolverConfig, mesh=None):
    """Tear, solve leaves, and run all merge levels bottom-up.

    Returns (reps, lam_top_sorted (padded_n,), Q_leaf).
    """
    dt = d.dtype

    def _prep(d, e):
        # pad sentinels strictly above any eigenvalue of any torn block
        # (Gershgorin of the torn blocks is bounded by max|d| + 3 max|e|:
        # tearing shifts two diagonal entries by at most |beta| <= max|e| each)
        abs_e_max = (jnp.max(jnp.abs(e)) if e.shape[0] > 0
                     else jnp.asarray(0.0, dt))
        bound = jnp.max(jnp.abs(d)) + 3.0 * abs_e_max
        base = 1.5 * bound + 1.0
        sentinels = base + jnp.arange(plan.padded_n, dtype=dt) * (
            1e-3 * bound + 1e-3)
        d_t, betas, thetas = tear(d, e, plan)
        A = leaf_blocks(d_t, e, plan, sentinels)
        return A, betas, thetas

    # scatters (tearing, block construction) run replicated: never let the
    # GSPMD partitioner near them
    A, betas, thetas = _replicated(_prep, mesh)(d, e)

    last_rows = jnp.asarray(
        np.asarray(plan.leaf_sizes, dtype=np.int64) - 1)

    base_eigh = leaf_eigh_fn(plan.leaf_pad)

    def _leaf_eigh(A, last_rows):
        lam, Q = base_eigh(A)
        first = Q[:, 0, :]
        last = jnp.take_along_axis(Q, last_rows[:, None, None],
                                   axis=1)[:, 0, :]
        return lam, Q, first, last

    lam, Q, f, l = _batch_mapped(_leaf_eigh, mesh, plan.num_leaves)(
        A, last_rows)

    merge_fn = functools.partial(merge_decompose, **_merge_kwargs(config))
    reps = []
    L = plan.num_levels
    for li, lv in enumerate(plan.levels):
        k, m = lv.num_merges, lv.merge_size
        h = m // 2
        lam2 = lam.reshape(k, 2, h)
        f2 = f.reshape(k, 2, h)
        l2 = l.reshape(k, 2, h)
        dm = lam2.reshape(k, m)
        theta = thetas[li]
        beta = betas[li]
        # z = [last row of W_left ; first row of W_right / theta]  (helper.c:36-50)
        z = jnp.concatenate([l2[:, 0, :], f2[:, 1, :] / theta[:, None]], axis=1)
        rho = beta * theta          # = |beta| >= 0 by construction
        ndev = mesh.devices.size if mesh is not None else 1
        if mesh is not None and (k < ndev or k % ndev != 0):
            # wide top-of-tree merges: deflation/partition replicates (O(m),
            # inherently sequential rotation chain) but the O(m^2) root finding
            # is sharded over slots so every chip solves its share of roots
            mk = _merge_kwargs(config)
            part_fn = functools.partial(
                merge_partition, eps=mk["eps"],
                deflation_factor=mk["deflation_factor"])
            roots_kw = dict(eps=mk["eps"],
                            max_secular_iters=mk["max_secular_iters"],
                            secular_tol_factor=mk["secular_tol_factor"],
                            use_gu_eisenstat=mk["use_gu_eisenstat"],
                            block_size=mk["block_size"])
            parts = _replicated(jax.vmap(part_fn), mesh)(dm, z, rho)
            rep_list = [
                merge_roots(jax.tree.map(lambda a: a[i], parts),
                            slot_mesh=mesh, **roots_kw)
                for i in range(k)
            ]
            rep = jax.tree.map(lambda *xs: jnp.stack(xs), *rep_list)
        else:
            rep = _batch_mapped(jax.vmap(merge_fn), mesh, k)(dm, z, rho)
        if li < L - 1:
            # propagate the subtree's first/last actual boundary rows
            zero = jnp.zeros((k, h), dt)
            w = jnp.concatenate(
                [jnp.concatenate([f2[:, 0, :], zero], axis=1)[:, None, :],
                 jnp.concatenate([zero, l2[:, 1, :]], axis=1)[:, None, :]],
                axis=1)
            y = _batch_mapped(
                jax.vmap(lambda r_, w_: rows_through_merge(
                    r_, w_, block=config.block_size)), mesh, k)(rep, w)
            f, l = y[:, 0, :], y[:, 1, :]
        lam = rep.lam_sorted
        reps.append(rep)
    return reps, lam.reshape(-1), Q


def _downsweep(reps, Q_leaf, plan: TreePlan, sel, mesh=None, block=2048):
    """W[:, sel] by pushing selected root-U columns down through the tree.

    Each level applies BD(U_level) via ``apply_u`` — U row blocks are
    rematerialized on the fly and immediately matmul'd, so no (k, m, m) stack
    is ever stored.  With a mesh, the whole sweep is *column-sharded*: each
    device owns C/ndev eigenvector columns end-to-end (zero collectives; the
    per-level reps are O(n) and replicate cheaply).
    """
    from .dist.mesh import last_axis_sharded

    L = plan.num_levels
    top = jax.tree.map(lambda a: a[0], reps[-1])
    C = int(sel.shape[0])
    ndev = mesh.devices.size if mesh is not None else 1
    colshard = mesh is not None and C % ndev == 0 and C >= ndev

    def wrap(fn, in_ndims, out_ndim):
        if colshard:
            return last_axis_sharded(fn, mesh, in_ndims, out_ndim)
        if mesh is not None:
            return _replicated(fn, mesh)
        return fn

    X = wrap(lambda t, s: assemble_u(t, cols=s, block=block),
             (None, 1), 2)(top, sel)                  # (npad, C)
    for li in range(L - 2, -1, -1):
        lv = plan.levels[li]
        k, m = lv.num_merges, lv.merge_size
        X = X.reshape(k, m, C)
        X = wrap(functools.partial(apply_u_level, block=block),
                 (None, 3), 3)(reps[li], X)
        X = X.reshape(k * m, C)
    X = X.reshape(plan.num_leaves, plan.leaf_pad, C)
    X = wrap(lambda Q, Xb: jnp.einsum("kij,kjc->kic", Q, Xb),
             (None, 3), 3)(Q_leaf, X)
    X = X.reshape(plan.padded_n, C)
    return X[jnp.asarray(plan.row_map())]             # drop pad rows -> (n, C)


def _solve(d, e, sel, plan: TreePlan, config: SolverConfig,
           want_vectors: bool, mesh=None):
    # Global prescale to ||T||-ish ~ 1: keeps every intermediate centered in
    # the representable range — essential on TPU, where emulated f64 has only
    # the float32 exponent range (~1e+-38).
    abs_e_max = (jnp.max(jnp.abs(e)) if e.shape[0] > 0
                 else jnp.asarray(0.0, d.dtype))
    snorm = jnp.maximum(jnp.max(jnp.abs(d)) + 2.0 * abs_e_max,
                        jnp.asarray(1e-30, d.dtype))
    d = d / snorm
    e = e / snorm
    lam, V = _solve_scaled(d, e, sel, plan, config, want_vectors, mesh)
    return lam * snorm, V


def _solve_scaled(d, e, sel, plan: TreePlan, config: SolverConfig,
                  want_vectors: bool, mesh=None):
    if plan.num_levels == 0:
        # single leaf: pure batched-eigh path (ref: numtasks == 1 shortcut,
        # main.c:476-478 / filehandling.c:358-363)
        reps = None
        _, lam_flat, Q = _upsweep_leaf_only(d, e, plan, config)
        lam = lam_flat[: plan.n]
        if not want_vectors:
            return lam, None
        V = Q[0][:, : plan.n]
        V = V[:, sel] if sel is not None else V
        return lam, V

    reps, lam_flat, Q = _upsweep(d, e, plan, config, mesh)
    lam = lam_flat[: plan.n]
    if not want_vectors:
        return lam, None
    cols = sel if sel is not None else jnp.arange(plan.n)
    V = _downsweep(reps, Q, plan, cols, mesh, block=config.block_size)
    return lam, V


def _upsweep_leaf_only(d, e, plan, config):
    dt = d.dtype
    abs_e_max = jnp.max(jnp.abs(e)) if e.shape[0] > 0 else jnp.asarray(0.0, dt)
    bound = jnp.max(jnp.abs(d)) + 3.0 * abs_e_max
    base = 1.5 * bound + 1.0
    sentinels = base + jnp.arange(plan.padded_n, dtype=dt) * (1e-3 * bound + 1e-3)
    lam, Q, _, _ = solve_leaves(d, e, plan, sentinels)
    return None, lam.reshape(-1), Q


@functools.lru_cache(maxsize=64)
def _compiled_solver(n: int, config: SolverConfig, want_vectors: bool,
                     num_select: Optional[int], mesh_id):
    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    mesh = mesh_id[1] if mesh_id is not None else None

    def fn(d, e, sel):
        return _solve(d, e, sel, plan, config, want_vectors, mesh)

    return jax.jit(fn), plan


def solve_tridiagonal(d, e, *, config: SolverConfig = DEFAULT_CONFIG,
                      compute_vectors: bool = False,
                      select=None, mesh=None) -> EighTridiagonalResult:
    """All eigenvalues (and optionally eigenvectors) of symmetric tridiagonal T.

    Args:
      d: (n,) diagonal.  e: (n-1,) off-diagonal.
      compute_vectors: compute all eigenvectors (ref: bare ``-e`` flag).
      select: optional 0-based indices (ascending eigenvalue order) of
        eigenvectors to compute (ref: ``-e FILE``, filehandling.c:165-239).
      mesh: optional jax.sharding.Mesh for multi-device execution.

    Returns eigenvalues ascending and eigenvector columns (or None).
    """
    d = jnp.asarray(d, config.dtype)
    e = jnp.asarray(e, config.dtype)
    n = d.shape[0]
    if e.shape[0] != max(n - 1, 0):
        raise ValueError(f"off-diagonal must have length n-1, got {e.shape[0]}")

    sel_arr = None
    nsel = None
    if select is not None:
        sel_arr = jnp.asarray(np.asarray(select, dtype=np.int64))
        nsel = int(sel_arr.shape[0])
    want_vectors = compute_vectors or (select is not None)

    # Above the single-jit size limit (TPU: the whole-solve jit at n=16384 f64
    # OOMs on HLO temporaries) route to the staged/column-chunked path — the
    # public entry point must always work at the headline config (the
    # reference's single entry point does, main.c:17).
    if want_vectors and n > config.resolved_single_jit_max_n():
        res, _ = solve_tridiagonal_staged(
            d, e, config=config, compute_vectors=compute_vectors,
            select=select, mesh=mesh)
        return res

    mesh_key = (id(mesh), mesh) if mesh is not None else None
    fn, _ = _compiled_solver(n, config, want_vectors, nsel, mesh_key)
    lam, V = fn(d, e, sel_arr)
    return EighTridiagonalResult(eigenvalues=lam, eigenvectors=V)


@functools.lru_cache(maxsize=64)
def _compiled_upsweep(n: int, config: SolverConfig, mesh_id):
    """One jit for prescale + the whole upsweep.

    The Gershgorin prescale (TPU f64 has only the f32 exponent range) and the
    final lam rescale live INSIDE the jit: as loose jnp ops they cost ~6
    tunnel dispatches (~16 ms each) per solve — ~0.1 s of the clustered
    n=4096 wall.  Returns the prescaled (d, e) as device arrays too, since
    the refinement epilogue must solve in the prescaled system."""
    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    mesh = mesh_id[1] if mesh_id is not None else None
    nlev = plan.num_levels

    def full(d, e):
        abs_e_max = (jnp.max(jnp.abs(e)) if e.shape[0] > 0
                     else jnp.asarray(0.0, d.dtype))
        snorm = jnp.maximum(jnp.max(jnp.abs(d)) + 2.0 * abs_e_max,
                            jnp.asarray(1e-30, d.dtype))
        d = d / snorm
        e = e / snorm
        if nlev == 0:
            _, lam_flat, Q = _upsweep_leaf_only(d, e, plan, config)
            reps = None
        else:
            reps, lam_flat, Q = _upsweep(d, e, plan, config, mesh)
        n_ = d.shape[0]
        lam = lam_flat[:n_] * snorm
        out = (lam, lam_flat, Q, d, e)
        return out if nlev == 0 else (reps,) + out

    return jax.jit(full), plan, nlev == 0


@functools.lru_cache(maxsize=32)
def _compiled_downsweep_steps(n: int, config: SolverConfig, ncols: int,
                              mesh_id, m_fold: int = 0):
    """Per-level jitted downsweep stages with X-buffer donation.

    One dispatch per tree level keeps only X_in/X_out (+ block scratch) live —
    the whole-solve single jit at n=16384 f64 peaks ~28 GB of HLO temps
    (several 2.1 GB eigenvector blocks co-scheduled plus reshape copies),
    while the stepped sweep stays within ~5 GB.

    ``m_fold``: deep levels with merge_size <= m_fold (plus the leaf apply)
    are FOLDED into one jitted dispatch.  The deep tail is pure dispatch
    latency on the tunneled platform (~16 ms/dispatch; m<=512 levels ran
    0.17-0.18 TFLOP/s over 32 dispatches at n=16384 — DOWNSWEEP_KERNEL.json)
    while its live set is small (each deep level's U blocks are narrow), so
    one program keeps the stepped sweep's memory shape.  Single-device only
    (the mesh path keeps per-level dispatches for its collectives).
    """
    from .dist.mesh import last_axis_sharded

    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    mesh = mesh_id[1] if mesh_id is not None else None
    block = config.block_size
    ndev = mesh.devices.size if mesh is not None else 1
    colshard = mesh is not None and ncols % ndev == 0 and ncols >= ndev

    def wrap(fn, in_ndims, out_ndim):
        if colshard:
            return last_axis_sharded(fn, mesh, in_ndims, out_ndim)
        if mesh is not None:
            return _replicated(fn, mesh)
        return fn

    vec_dtype = jnp.float32 if config.mixed_precision_vectors else None

    root_fn = jax.jit(wrap(
        lambda t, s: assemble_u(t, cols=s, block=block, dtype=vec_dtype),
        (None, 1), 2))

    level_fns = []
    for li in range(plan.num_levels - 1):
        lv = plan.levels[li]
        k, m = lv.num_merges, lv.merge_size

        def make(k=k, m=m):
            def step(rep, X):
                X = X.reshape(k, m, ncols)
                X = wrap(functools.partial(apply_u_level, block=block),
                         (None, 3), 3)(rep, X)
                return X.reshape(k * m, ncols)
            return jax.jit(step, donate_argnums=(1,))
        level_fns.append(make())

    def leaf_step(Q, X):
        X = X.reshape(plan.num_leaves, plan.leaf_pad, ncols)
        # HIGHEST only for f32: its default contraction is a single bf16 pass;
        # emulated f64 is already multi-pass (and HIGHEST inflates its temps)
        prec = (jax.lax.Precision.HIGHEST if vec_dtype == jnp.float32
                else None)
        X = wrap(lambda Q, Xb: jnp.einsum("kij,kjc->kic",
                                          Q.astype(Xb.dtype), Xb,
                                          precision=prec),
                 (None, 3), 3)(Q, X)
        X = X.reshape(plan.padded_n, ncols)
        return X[jnp.asarray(plan.row_map())]

    leaf_fn = jax.jit(leaf_step, donate_argnums=(1,))

    deep_n = 0
    if m_fold > 0 and mesh is None:
        while (deep_n < plan.num_levels - 1
               and plan.levels[deep_n].merge_size <= m_fold):
            deep_n += 1
    deep_fn = None
    if deep_n:
        def deep_step(reps_deep, Q, X):
            for j in range(deep_n - 1, -1, -1):
                lv = plan.levels[j]
                X = X.reshape(lv.num_merges, lv.merge_size, ncols)
                X = apply_u_level(reps_deep[j], X, block=block)
                X = X.reshape(lv.num_merges * lv.merge_size, ncols)
            return leaf_step(Q, X)

        deep_fn = jax.jit(deep_step, donate_argnums=(2,))
    return plan, root_fn, level_fns, leaf_fn, (deep_n, deep_fn)


@functools.lru_cache(maxsize=32)
def _compiled_refine(n: int, ncols: int, config: SolverConfig, nb: int):
    from .kernels.refine import inverse_iteration

    def fn(d, e, lam_sel, V):
        # single pass; the driver decides how many passes each column gets
        return inverse_iteration(d, e, lam_sel, V, steps=1, block=nb)

    return jax.jit(fn, donate_argnums=(3,))


@functools.lru_cache(maxsize=32)
def _compiled_spike_refine(n: int, K: int, nb: int, chunk: int,
                           force_scan: bool = False):
    """The whole chunked Pallas Spike pass in ONE jit (see _refine_ops).
    Late-binds the module attribute so test substitutes are respected.

    Above ~8 GB of in+out (n*K*(4+8) bytes) the unrolled chunk loop's
    interleaved temporaries fragment HBM past capacity (n=32768 full
    eigenpairs: 15.93/15.75 G used with only 11.88 G live, 4 G
    fragmentation) — route those through the lax.scan chunk loop, which
    reuses one iteration's buffers.  ``force_scan``: the caller knows the
    rest of HBM is already committed (the grouped huge-n path keeps the
    full 8*n*C f64 output resident, so even a per-GROUP unrolled loop's
    co-scheduled chunk temporaries OOM — round-5 q1a died on a 16 KB
    upload with ~5 GB of interleaved spike temps next to the 8.6 GB X)."""
    from .kernels.pallas import spike_solve

    scan = force_scan or float(n) * float(K) * 12.0 > 8e9
    return jax.jit(lambda d, e, lam, V: spike_solve.spike_refine(
        d, e, lam, V, nb=nb, chunk=chunk, scan=scan), donate_argnums=(3,))


def _refine_ops(d, e, n: int, C: int, config: SolverConfig):
    """The two building blocks of the refinement epilogue, shared by the
    staged path (`_refine_vectors`) and the fused small-n backtransform.

    one_pass: one inverse-iteration pass — the Pallas Spike path on TPU
    (whole pass in VMEM kernels with the dstein residual ||v||/||x|| for
    free) or column-chunked XLA solves; returns (V, res_estimate or None).
    SE_FORCE_SPIKE=1: tests substitute a fake spike_refine on CPU to
    exercise the estimate-honesty / rescue machinery end-to-end.

    residuals_chunked: MEASURED residual norms, all chunks in one dispatch
    + one host fetch."""
    chunk = max(1, min(config.vec_chunk, config.resolved_refine_chunk(n)))
    use_spike = (config.use_pallas_refine and n >= 512
                 and (jax.default_backend() == "tpu"
                      or os.environ.get("SE_FORCE_SPIKE") == "1"))
    # one dispatch for the whole chunked pass by default: eager spike_refine
    # is 2 dispatches per column chunk (~16 ms each on the tunnel — 0.26 s
    # of the n=16384 pass1's 0.29 s).  The jit's chunk loop unrolls with the
    # same bounded per-chunk working set; SE_SPIKE_ONE_DISPATCH=0 opts back
    # if a scheduler co-schedules chunks into an OOM at some new size.
    spike_one = (os.environ.get("SE_SPIKE_ONE_DISPATCH", "1") == "1"
                 and jax.default_backend() == "tpu")

    # the grouped huge-n path keeps the full 8*n*C output resident: force
    # the scan chunk loop inside every spike jit (see _compiled_spike_refine)
    force_scan = 12.0 * float(n) * float(C) > _grouped_bt_bytes()

    def one_pass(lam_c, V_c, nb, allow_spike=True):
        if use_spike and allow_spike:
            from .kernels.pallas.spike_solve import spike_refine
            if spike_one:
                return _compiled_spike_refine(
                    n, int(lam_c.shape[0]), nb, chunk,
                    force_scan)(d, e, lam_c, V_c)
            return spike_refine(d, e, lam_c, V_c, nb=nb, chunk=chunk,
                                scan=force_scan)
        nc = int(lam_c.shape[0])
        if nc <= chunk:
            return _compiled_refine(n, nc, config, nb)(d, e, lam_c, V_c), None
        parts = []
        for o in range(0, nc, chunk):
            w = min(chunk, nc - o)
            parts.append(_compiled_refine(n, w, config, nb)(
                d, e, lam_c[o:o + w], V_c[:, o:o + w]))
        return jnp.concatenate(parts, axis=1), None

    def residuals_chunked(lam_c, V_c):
        # one dispatch for ALL chunks (see _compiled_residuals) + one fetch
        nc = int(lam_c.shape[0])
        if nc <= chunk:
            return np.asarray(_residual_norms_jit(d, e, lam_c, V_c))
        return np.asarray(_compiled_residuals(n, nc, chunk)(d, e, lam_c, V_c))

    return one_pass, residuals_chunked


def _refine_vectors(d, e, lam, sel, V, config: SolverConfig, subtimer=None,
                    lam_host=None, pass1_done: bool = False, res1_dev=None):
    """Mixed-precision epilogue: one f64 inverse-iteration pass restores
    working-precision residuals from the f32 downsweep; clusters that inverse
    iteration cannot separate are re-orthonormalized (dstein-style).

    ``subtimer`` (a PhaseTimer) records per-step walls with device syncs —
    profiling only, the syncs serialize the epilogue's async dispatch.
    ``lam_host``: host copy of ``lam`` if the caller already fetched it —
    saves this function's norm_t reduction dispatch + two fetches (~80 ms
    of the n=16384 headline's backtransformation phase).
    ``pass1_done``: the caller already ran the first refinement pass (the
    grouped downsweep path interleaves it with the downsweep to bound HBM);
    ``res1_dev`` then carries its residual estimates (or None)."""
    from .kernels.refine import orthonormalize_clusters
    from .utils.timing import PhaseTimer
    from .utils.timing import sync as _sync
    prof = subtimer is not None
    subtimer = subtimer if prof else PhaseTimer()

    lam_sel = lam[sel]
    C = int(sel.shape[0])
    n = int(d.shape[0])
    one_pass, residuals_chunked = _refine_ops(d, e, n, C, config)

    # first inverse-iteration pass over everything (unless the caller's
    # grouped downsweep already folded it in)
    if not pass1_done:
        with subtimer.phase("refine_pass1"):
            V, res1_dev = one_pass(lam_sel, V, config.refine_block)
            if prof:
                _sync(V)

    if lam_host is not None:
        norm_t = float(np.max(np.abs(lam_host))) if lam_host.size else 0.0
        lam_np = lam_host[np.asarray(sel)]
    else:
        norm_t = float(jnp.max(jnp.abs(lam)))
        lam_np = np.asarray(lam_sel)

    did_triage = config.refine_steps > 1 and C > 1
    touched = np.zeros(C, dtype=bool)
    if did_triage:
        # dstein-style: explicitly orthonormalize EVERY near-degenerate
        # segment the f32 downsweep could not resolve, BEFORE residual
        # triage.  Gaps below ~refine_risky_gap_factor*u_f32*||T|| leave
        # O(eps_f32*||T||/gap) intra-cluster mixing that one refinement pass
        # shrinks only by (lam_err/gap) — at gap ~ 1e-7*||T|| that stalls
        # around 1e-6 (the round-2 Poisson blemish).  One batched CholeskyQR
        # removes the mixing EXACTLY at residual cost ~ mixing*gap
        # (<=1e-13*||T||), so no gap-based second refinement pass is needed
        # at all: round-3 profiling showed the gap heuristic flagged 2842
        # columns at n=16384 of which ONE had a residual problem — ~0.5 s of
        # extra solves replaced by widening this pass's band from
        # ortho_gap_factor to the full risky band.
        u_f32 = float(jnp.finfo(jnp.float32).eps) / 2.0
        gap_mid = max(config.ortho_gap_factor,
                      config.refine_risky_gap_factor * u_f32)
        with subtimer.phase("ortho_mid"):
            V = orthonormalize_clusters(lam_np, V, norm_t,
                                        gap_factor=gap_mid,
                                        min_gap_factor=config.cluster_gap_factor)
            if prof:
                _sync(V)
        with subtimer.phase("residuals1"):
            # MEASURED residuals, always: the Spike estimate (||v||/||x||,
            # the dstein quantity) systematically UNDERSHOOTS for
            # block-resonant columns whose solve engaged many clamped pivots
            # (Poisson n=16384: two columns truly at 2e-12*||T|| estimated
            # below threshold), so triage must not trust it.  The matvec
            # pass is cheap (~0.03 s at n=16384 — the latency the kernel
            # saves is in the SOLVES, not here).  The kernel's 1e30 clip
            # sentinel still forces a column into the extra pass, but the
            # measured value stays the improvement baseline so a sentinel
            # column whose vector is actually fine is never overwritten by
            # a worse re-solve.
            res1 = residuals_chunked(lam_sel, V)
            sentinel = (np.asarray(res1_dev) > 1e29) \
                if res1_dev is not None else np.zeros(C, dtype=bool)
        V, touched = _triage_passes(d, e, lam_sel, V, res1, sentinel, norm_t,
                                    config, one_pass, residuals_chunked,
                                    subtimer, prof)
    # final cleanup.  After the triage pipeline only two kinds of segment can
    # still be non-orthonormal: genuinely degenerate clusters (every gap below
    # cluster_gap_factor*||T|| — the mid pass deliberately skipped them) and
    # segments containing a column the extra/rescue passes modified AFTER the
    # mid orthonormalization.  Everything else was CholeskyQR'd at the wide
    # band already and has not changed since — re-running it cost ~0.24 s of
    # the n=16384 headline for near-identity transforms.
    with subtimer.phase("ortho_final"):
        if did_triage:
            V = orthonormalize_clusters(
                lam_np, V, norm_t, gap_factor=gap_mid,
                touched=touched,
                degenerate_below=config.cluster_gap_factor)
        else:
            # no triage ran (single-pass config or a single column): the
            # full wide-threshold cleanup is still required
            V = orthonormalize_clusters(lam_np, V, norm_t,
                                        gap_factor=config.ortho_gap_factor)
        if prof:
            _sync(V)
    return V


@functools.lru_cache(maxsize=32)
def _compiled_fused_extra(n: int, b: int, config: SolverConfig,
                          spike_extra: bool):
    """The whole extra-pass triage step in ONE dispatch: gather the risky
    bucket, run the alternate-block passes, measure residuals, accept only
    improved columns, and scatter the winners back — the host gets (V,
    packed=[res_b, improved]) with a single fetch.  The unfused version
    cost ~4 dispatches + 2 fetches (~0.13 s of the n=16384 headline) to
    re-solve ONE column.  ``idx`` is padded to b with C (out-of-range,
    dropped by the scatter); ``res1_idx`` pads are -inf so pads never
    'improve'."""
    from .kernels.refine import inverse_iteration

    def fn(d, e, lam_r, V, idx, res1_idx):
        idx_safe = jnp.minimum(idx, V.shape[1] - 1)
        Vr = V[:, idx_safe]
        for _ in range(config.refine_steps - 1):
            if spike_extra:
                from .kernels.pallas.spike_solve import spike_refine
                Vr, _ = spike_refine(d, e, lam_r, Vr,
                                     nb=config.refine_block_alt,
                                     chunk=max(b, 8))
            else:
                Vr = inverse_iteration(d, e, lam_r, Vr, steps=1,
                                       block=config.refine_block_alt)
        res_b = residual_norms(d, e, lam_r, Vr)
        improved = res_b < res1_idx
        # NEVER a 2-D column scatter (16 MB scoped-VMEM fault on these
        # shapes) — build the (C,) mask/srcpos with tiny 1-D scatters and
        # merge with one full-width gather+select (the phase is still a
        # single dispatch; the full-V pass is ~5 ms of HBM traffic).
        C = V.shape[1]
        mask = jnp.zeros((C + 1,), bool).at[idx].set(improved)[:C]
        srcpos = jnp.zeros((C + 1,), idx.dtype).at[idx].set(
            jnp.arange(b, dtype=idx.dtype))[:C]
        V = jnp.where(mask[None, :], Vr[:, srcpos], V)
        packed = jnp.concatenate([res_b, improved.astype(res_b.dtype)])
        return V, packed

    return jax.jit(fn, donate_argnums=(3,))


def _triage_passes(d, e, lam_sel, V, res1, sentinel, norm_t,
                   config: SolverConfig, one_pass, residuals_chunked,
                   subtimer, prof):
    """Residual triage + extra/rescue refinement passes (shared by the
    staged epilogue and the fused small-n backtransform).

    Flags columns whose MEASURED residual exceeds the threshold (or whose
    spike estimate hit the 1e30 clip sentinel), gives them extra passes at
    alternate block sizes, and accepts a re-solve only when the measured
    residual improves — no column ever ends worse than its best attempt.
    Returns (V, touched) where touched marks columns actually replaced."""
    from .utils.timing import sync as _sync
    n = int(d.shape[0])
    C = int(lam_sel.shape[0])
    touched = np.zeros(C, dtype=bool)
    thr_res = config.refine_residual_factor * config.eps() * \
        max(norm_t, 1e-30)
    risky = (res1 > thr_res) | sentinel
    idx = np.nonzero(risky)[0]
    if prof:
        print(f"  [profile] risky columns: {idx.size} "
              f"(residual-flagged {int((res1 > thr_res).sum())}, "
              f"clip-sentinel {int(sentinel.sum())})",
              flush=True)
    if idx.size:
        # pad to a power-of-two bucket to bound recompilations
        b = 1
        while b < idx.size:
            b *= 2
        chunk = max(1, min(config.vec_chunk, config.resolved_refine_chunk(n)))
        # XLA solver by default (use_pallas_refine_extra=False): the
        # bucket is narrow so its scan latency is small, and its
        # emulated-f64 arithmetic leaves less mixing/residual on the
        # resonant and tight-gap columns this pass targets than the
        # pair kernel (SolverConfig docstring has the measurements).
        # Keep the BETTER of pre/post-pass per column — by MEASURED
        # residual: a column resonant with the alternate block size gets
        # *degraded* by the extra pass (observed: Poisson columns at
        # ~k*(alt_nb+1) block-eigenvalue spacings), so the pass must
        # never be allowed to lose ground.
        if b <= chunk and not config.use_pallas_refine_extra:
            # (the spike-extra config keeps the unfused path: tests substitute
            # a host-side fake spike_refine that cannot trace inside a jit)
            # fused single-dispatch path (bucket fits one residual chunk)
            idx_p = np.full(b, C, np.int64)      # pads dropped by scatter
            idx_p[: idx.size] = idx
            res1_idx = np.full(b, -np.inf)       # pads never 'improve'
            res1_idx[: idx.size] = res1[idx]
            lam_r = lam_sel[jnp.asarray(np.minimum(idx_p, C - 1))]
            with subtimer.phase("refine_extra"):
                V, packed = _compiled_fused_extra(n, b, config, False)(
                    d, e, lam_r, V, jnp.asarray(idx_p),
                    jnp.asarray(res1_idx))
                packed = np.asarray(packed)      # the one fetch
            res_b = packed[:b]
            improved = np.zeros(C, dtype=bool)
            improved[idx] = packed[b:][: idx.size] > 0.5
            keep = risky & improved
            touched |= keep
        else:
            idx_p = np.concatenate([idx, np.zeros(b - idx.size, np.int64)])
            idx_j = jnp.asarray(idx_p)
            with subtimer.phase("refine_extra"):
                Vr = V[:, idx_j]
                lam_r = lam_sel[idx_j]
                for _ in range(config.refine_steps - 1):
                    Vr, _unused = one_pass(
                        lam_r, Vr, config.refine_block_alt,
                        allow_spike=config.use_pallas_refine_extra)
                res_b = residuals_chunked(lam_r, Vr)
                improved = np.zeros(C, dtype=bool)
                improved[idx] = res_b[: idx.size] < res1[idx]
                keep = risky & improved
                touched |= keep
                # write back with gather+select: any large scatter busts the
                # TPU's 16MB scoped-VMEM limit in either orientation
                srcpos = np.zeros(C, np.int64)
                srcpos[idx] = np.arange(idx.size)
                V = jax.jit(
                    lambda V, Vr, mask, sp: jnp.where(mask[None, :],
                                                      Vr[:, sp], V))(
                    V, Vr, jnp.asarray(keep), jnp.asarray(srcpos))
                if prof:
                    _sync(V)
        # Measured-residual rescue: columns whose BOTH spike passes
        # failed the threshold (e.g. the pair-arithmetic back-substitution
        # cascade hit the +-2^80 clip at both block sizes — the kernel
        # flags those with a 1e30 estimate) get XLA-path passes at a
        # third block size, accepted only on an EXPLICIT residual
        # measurement.  Rare (0-10 columns), so the extra matvec pass is
        # cheap; guarantees no column ever ends worse than its best
        # attempt.
        res_after = res1.copy()
        if idx.size:
            res_after[idx] = np.where(improved[idx], res_b[: idx.size],
                                      res1[idx])
        still = np.nonzero(risky & (res_after > thr_res))[0]
        if still.size:
            b2 = 1
            while b2 < still.size:
                b2 *= 2
            st_p = np.concatenate(
                [still, np.zeros(b2 - still.size, np.int64)])
            st_j = jnp.asarray(st_p)
            with subtimer.phase("refine_rescue"):
                Vr2 = V[:, st_j]
                lam_r2 = lam_sel[st_j]
                for _ in range(2):
                    Vr2 = _compiled_refine(
                        n, b2, config, config.refine_block_rescue)(
                        d, e, lam_r2, Vr2)
                res2 = residuals_chunked(lam_r2, Vr2)
                improved2 = np.zeros(C, dtype=bool)
                improved2[still] = res2[: still.size] < res_after[still]
                touched |= improved2
                srcpos2 = np.zeros(C, np.int64)
                srcpos2[still] = np.arange(still.size)
                V = jax.jit(
                    lambda V, Vr, mask, sp: jnp.where(mask[None, :],
                                                      Vr[:, sp], V))(
                    V, Vr2, jnp.asarray(improved2), jnp.asarray(srcpos2))
                if prof:
                    _sync(V)

    return V, touched


def _fused_bt_enabled(n: int, config: SolverConfig, leaf_only: bool, mesh,
                      want_vectors: bool, C: int) -> bool:
    """Gate for the fused small-n backtransformation (one jit for downsweep
    + refine pass1 + cluster-orth + measured residuals).

    TPU-only by default (the win is the ~16 ms/dispatch + ~33 ms/fetch
    tunnel tax — a dozen round-trips were most of the clustered n=4096
    bench); SE_FORCE_FUSED_BT=1 lets CPU tests drive the same path.
    Sizes above SE_FUSED_BT_MAX_N (default 8192) keep the stepped,
    donation-friendly path — the whole-solve jit's HLO temporaries OOM at
    n=16384 f64 (CLAUDE.md)."""
    if not want_vectors or leaf_only or mesh is not None:
        return False
    if not config.mixed_precision_vectors or config.refine_steps <= 1:
        return False
    if C <= 1:
        return False
    if n > int(os.environ.get("SE_FUSED_BT_MAX_N", "8192")):
        return False
    if os.environ.get("SE_FORCE_FUSED_BT") == "1":
        return True
    if os.environ.get("SE_DISABLE_FUSED_BT") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _spike_refine_enabled(n: int, config: SolverConfig) -> bool:
    """Route the f64 refinement pass through the Pallas Spike kernels."""
    return (config.use_pallas_refine and n >= 512
            and (jax.default_backend() == "tpu"
                 or os.environ.get("SE_FORCE_SPIKE") == "1"))


@functools.lru_cache(maxsize=16)
def _compiled_fused_bt_a(n: int, config: SolverConfig, ncols: int,
                         spike: bool):
    """Fused small-n backtransformation, part A: f32 downsweep (fused
    Pallas Cauchy matmuls) -> f64 inverse-iteration pass (Spike kernels).

    Depends on NOTHING the host computes from the eigenvalues, so the staged
    driver dispatches it immediately after the upsweep dispatch — BEFORE the
    blocking lam fetch — and the device rolls straight into the downsweep
    while the host waits out the ~33 ms tunnel round trip and plans the
    cluster orthonormalization (part B).  Splitting the round-3 single fused
    jit in two costs one extra dispatch (~16 ms of host time, fully
    overlapped with part A's device execution) and an HBM round trip of V.
    Returns (V, est)."""
    from .kernels.refine import inverse_iteration

    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    block = config.block_size
    chunk = max(1, min(config.vec_chunk, config.resolved_refine_chunk(n)))

    def fn(reps, Q, d, e, lam_flat, sel):
        top = jax.tree.map(lambda a: a[0], reps[-1])
        X = assemble_u(top, cols=sel, block=block, dtype=jnp.float32)
        for li in range(plan.num_levels - 2, -1, -1):
            lv = plan.levels[li]
            k, m = lv.num_merges, lv.merge_size
            X = X.reshape(k, m, ncols)
            X = apply_u_level(reps[li], X, block=block)
            X = X.reshape(k * m, ncols)
        X = X.reshape(plan.num_leaves, plan.leaf_pad, ncols)
        X = jnp.einsum("kij,kjc->kic", Q.astype(X.dtype), X,
                       precision=jax.lax.Precision.HIGHEST)
        X = X.reshape(plan.padded_n, ncols)
        V = X[jnp.asarray(plan.row_map())]
        lam_sel = lam_flat[:n][sel]
        if spike:
            from .kernels.pallas.spike_solve import spike_refine
            V, est = spike_refine(d, e, lam_sel, V,
                                  nb=config.refine_block, chunk=chunk)
        else:
            V = inverse_iteration(d, e, lam_sel, V, steps=1,
                                  block=config.refine_block)
            est = jnp.zeros((ncols,), V.dtype)
        return V, est

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _compiled_fused_bt_b(n: int, config: SolverConfig, ncols: int, sig):
    """Fused small-n backtransformation, part B: bucketed cluster CholeskyQR
    (host-planned from lam, device acceptance) -> measured residual norms.

    Returns (V, packed) where packed = [res (C,), est (C,), seg_ok
    (#planned segments,)] so the host needs exactly ONE fetch to run
    triage.  ``sig`` is `plan_cluster_orth`'s static bucket signature."""
    from .kernels.refine import apply_cluster_orth_plan

    def fn(V, est, d, e, lam_flat, sel, starts_l, widths_l, seg_of_col,
           srcpos, mask_plan):
        lam_sel = lam_flat[:n][sel]
        V, ok_cat = apply_cluster_orth_plan(V, sig, starts_l, widths_l,
                                            seg_of_col, srcpos, mask_plan)
        res = residual_norms(d, e, lam_sel, V)
        packed = jnp.concatenate([res, est, ok_cat.astype(res.dtype)])
        return V, packed

    return jax.jit(fn, donate_argnums=(0,))


def _fused_backtransform(reps, Q, d, e, lam_flat, sel, config: SolverConfig,
                         subtimer=None, lam_np_all=None, pre=None):
    """Host orchestration of the fused small-n backtransformation: plans the
    cluster orthonormalization from the already-computed eigenvalues, runs
    the two fused dispatches (downsweep+refine part A — usually already
    dispatched by the caller before the lam fetch — and planned-orth +
    residuals part B), then (rarely) explicit-QRs rejected/oversized
    segments and triages risky columns exactly like the staged epilogue.

    Returns ``(V, synced)``: ``synced`` is True when no rescue/triage step
    replaced V after the in-jit residual fetch — that fetch depends on V, so
    V is already materialized and the caller can skip its own ~33 ms sync
    round trip.  ``lam_np_all``: host copy of lam_flat[:n] if the caller
    already fetched it (the staged path's phase sync does).  ``pre``: the
    already-dispatched part A outputs (V, est), letting the device overlap
    the downsweep with the host's fetch + planning."""
    from .kernels.refine import (_compiled_wide_orth, orth_explicit_qr,
                                 orthonormalize_clusters, plan_cluster_orth)
    from .utils.timing import PhaseTimer
    from .utils.timing import sync as _sync
    prof = subtimer is not None
    subtimer = subtimer if prof else PhaseTimer()

    n = int(d.shape[0])
    C = int(sel.shape[0])
    if lam_np_all is None:
        lam_np_all = np.asarray(lam_flat[:n])     # one (n,) fetch
    lam_np = lam_np_all[np.asarray(sel)]
    norm_t = float(np.max(np.abs(lam_np_all)))
    u_f32 = float(jnp.finfo(jnp.float32).eps) / 2.0
    gap_mid = max(config.ortho_gap_factor,
                  config.refine_risky_gap_factor * u_f32)
    (sig, starts_l, widths_l, seg_of_col, srcpos, mask_plan, seg_ranges,
     wide) = plan_cluster_orth(lam_np, norm_t, gap_mid, C, n)
    spike = _spike_refine_enabled(n, config)
    with subtimer.phase("fused_bt"):
        if pre is None:
            pre = _compiled_fused_bt_a(n, config, C, spike)(
                reps, Q, d, e, lam_flat, sel)
        V_a, est_a = pre
        V, packed = _compiled_fused_bt_b(n, config, C, sig)(
            V_a, est_a, d, e, lam_flat, sel,
            tuple(jnp.asarray(a) for a in starts_l),
            tuple(jnp.asarray(a) for a in widths_l),
            jnp.asarray(seg_of_col), jnp.asarray(srcpos),
            jnp.asarray(mask_plan))
        del pre, V_a
        packed = np.asarray(packed)           # the ONE fetch of the phase
    # packed is computed FROM V inside the jit, so this fetch already
    # materialized V; if nothing below replaces it, the caller can skip
    # its own sync (identity tracks "replaced": jnp ops never mutate)
    v_fetched = V
    res1 = packed[:C]
    est = packed[C:2 * C]
    ok = packed[2 * C:] > 0.5
    bad = [seg_ranges[i] for i in np.nonzero(~ok)[0]]
    if bad or wide:
        with subtimer.phase("ortho_rescue"):
            tpu_f64 = (jax.default_backend() == "tpu"
                       and V.dtype == jnp.float64)
            for s, t in wide:
                okw, Yw = _compiled_wide_orth(n, t - s, tpu_f64)(V[:, s:t])
                if bool(okw):
                    V = V.at[:, s:t].set(Yw)
                else:
                    q, _ = jnp.linalg.qr(V[:, s:t])
                    V = V.at[:, s:t].set(q)
            V = orth_explicit_qr(V, bad)
    sentinel = (est > 1e29) if spike else np.zeros(C, dtype=bool)
    one_pass, residuals_chunked = _refine_ops(d, e, n, C, config)
    if bad or wide:
        # res1 was measured inside part B, BEFORE the rescue QR above —
        # for columns in rescued segments the triage acceptance
        # (res_b < res1) would compare a re-solve against a STALE pre-QR
        # baseline and could replace a post-QR column with a worse one.
        # Re-measure just those columns (rescues are rare and bucket-sized).
        ridx = np.unique(np.concatenate(
            [np.arange(s, t) for s, t in (list(bad) + list(wide))]))
        if ridx.size:
            lam_r = lam_flat[:n][sel][jnp.asarray(ridx)]
            res1 = res1.copy()
            res1[ridx] = residuals_chunked(lam_r, V[:, jnp.asarray(ridx)])
    V, touched = _triage_passes(d, e, lam_flat[:n][sel], V, res1, sentinel,
                                norm_t, config, one_pass, residuals_chunked,
                                subtimer, prof)
    if touched.any():
        # segments containing a column the extra/rescue passes replaced
        # after the in-jit orthonormalization; everything else is already
        # orthonormal and unchanged
        with subtimer.phase("ortho_final"):
            V = orthonormalize_clusters(lam_np, V, norm_t,
                                        gap_factor=gap_mid, touched=touched)
            if prof:
                _sync(V)
    return V, V is v_fetched


def downsweep_stepped(reps, Q_leaf, n: int, config: SolverConfig, sel,
                      mesh=None):
    """Run the downsweep as one dispatch per level, and — since eigenvector
    columns are completely independent — in column chunks of
    ``config.vec_chunk``: XLA's emulated-f64 dot allocates ~4x the output in
    f32 temporaries, so bounding C bounds the peak well under HBM."""
    mesh_key = (id(mesh), mesh) if mesh is not None else None
    top = jax.tree.map(lambda a: a[0], reps[-1])

    try:
        m_fold = int(os.environ.get("SE_FOLD_LEVELS_M", "1024"))
    except ValueError:
        m_fold = 1024

    def run_chunk(sel_chunk):
        plan, root_fn, level_fns, leaf_fn, (deep_n, deep_fn) = \
            _compiled_downsweep_steps(n, config, int(sel_chunk.shape[0]),
                                      mesh_key, m_fold)
        X = root_fn(top, sel_chunk)
        for li in range(plan.num_levels - 2, deep_n - 1, -1):
            X = level_fns[li](reps[li], X)
        if deep_fn is not None:
            return deep_fn(tuple(reps[:deep_n]), Q_leaf, X)
        return leaf_fn(Q_leaf, X)

    C = int(sel.shape[0])
    chunk = max(1, config.vec_chunk)
    if C <= chunk:
        return run_chunk(sel)
    parts = [run_chunk(sel[o:o + chunk]) for o in range(0, C, chunk)]
    return jnp.concatenate(parts, axis=1)


@functools.lru_cache(maxsize=64)
def _compiled_colwrite(n: int, C: int, w: int, dt_key: str):
    """Donated in-place column-block write: X[:, o:o+w] = Xg (one dispatch).

    ``o`` is a traced operand so every group of the same width shares one
    executable; donation makes the update truly in place (no second copy of
    the 8*n*C-byte accumulator)."""
    def fn(X, Xg, o):
        return jax.lax.dynamic_update_slice(
            X, Xg.astype(X.dtype), (jnp.int32(0), o))
    return jax.jit(fn, donate_argnums=(0,))


def _grouped_bt_bytes() -> float:
    """Threshold (bytes of 12*n*C) above which the staged path interleaves
    downsweep column groups with the refinement's first pass.  Env-tunable so
    CPU tests can exercise the grouped path at toy sizes."""
    try:
        return float(os.environ.get("SE_GROUPED_BT_BYTES", 8e9))
    except ValueError:
        return 8e9


def _grouped_downsweep_refine(reps, Q, d, e, lam_host, sel, config, mesh,
                              subtimer=None):
    """Column-grouped downsweep + refinement pass 1 for huge full-eigenpair
    solves (n=32768 class).

    The plain staged path materializes the WHOLE f32 downsweep output
    (4 bytes/elem) and then refines it into f64 vectors (8 bytes/elem): both
    live at once is 12*n*C bytes — 12.9 GB at n=C=32768 — which plus the
    Spike pass's working set exhausts the 16 GB chip even with the scan
    chunk loop (round-4 q10b: generic ResourceExhausted at refine_pass1).
    Since eigenvector columns are independent end to end (downsweep AND the
    Spike interface solve are per-column), run both phases per column GROUP:
    the f32 group dies (donated into the refine jit) as soon as its f64
    refined columns land in the one preallocated output.  Peak HBM is
    8*n*C (the result itself) + 12*n*group + solver temps, ~10.5 GB at
    n=32768 with group=4096.

    Returns ``(V_f64, res1_dev)`` with ``res1_dev`` the concatenated Spike
    residual estimates (or None when any group used the estimate-free XLA
    path).  Ref analog: the reference's writeResults streams eigenvectors
    one at a time for the same never-hold-everything reason
    (filehandling.c:369-507); this is the TPU-granularity version.
    """
    from .utils.timing import PhaseTimer
    from .utils.timing import sync as _sync
    prof = subtimer is not None
    subtimer = subtimer if prof else PhaseTimer()

    n = int(d.shape[0])
    C = int(sel.shape[0])
    one_pass, _ = _refine_ops(d, e, n, C, config)
    # group size from a ~2 GB transient budget for the 12 bytes/elem of
    # (f32 group + its f64 refined copy), multiple of 256 for the Spike
    # kernels' column tiling
    g = int(2e9 / (12.0 * max(n, 1)))
    g = max(256, min(max(config.vec_chunk, 256), (g // 256) * 256))
    sel_np = np.asarray(sel)
    lam_sel_np = lam_host[sel_np]

    X = jnp.zeros((n, C), config.dtype)
    res_parts = []
    with subtimer.phase("downsweep_refine_grouped"):
        for o in range(0, C, g):
            w = min(g, C - o)
            sel_g = jnp.asarray(sel_np[o:o + w])
            lam_g = jnp.asarray(lam_sel_np[o:o + w])
            Vg = downsweep_stepped(reps, Q, n, config, sel_g, mesh)
            Xg, rg = one_pass(lam_g, Vg, config.refine_block)
            res_parts.append(rg)
            X = _compiled_colwrite(n, C, w, str(config.dtype))(
                X, Xg, np.int32(o))
            # THROTTLE: dispatch is async and PJRT allocates every enqueued
            # program's output buffers up front, so racing ahead enqueues
            # all groups' downsweep+refine working sets at once — the q11a
            # n=32768 run ResourceExhausted on a tiny host upload with 7
            # groups in flight.  One ~33 ms element fetch per group bounds
            # live groups to one; negligible next to a group's ~1 s of work.
            _sync(X)
    if any(r is None for r in res_parts):
        return X, None
    res1_dev = (jnp.concatenate(res_parts) if len(res_parts) > 1
                else res_parts[0])
    return X, res1_dev


def solve_tridiagonal_staged(d, e, *, config: SolverConfig = DEFAULT_CONFIG,
                             compute_vectors: bool = False, select=None,
                             mesh=None, timer=None):
    """Two-dispatch variant used by the CLI so the eigenvalue phase and the
    backtransformation can be timed separately (ref timers main.c:672-678 and
    filehandling.c:564-569).  Library code should prefer ``solve_tridiagonal``
    (single jit, one device dispatch)."""
    from .utils.timing import PhaseTimer  # local import to avoid cycle
    d = jnp.asarray(d, config.dtype)
    e = jnp.asarray(e, config.dtype)
    n = int(d.shape[0])
    mesh_key = (id(mesh), mesh) if mesh is not None else None
    fn, plan, leaf_only = _compiled_upsweep(n, config, mesh_key)

    from .utils.timing import sync as _sync
    if timer is None:
        timer = PhaseTimer()
    want_vectors = compute_vectors or (select is not None)
    if select is not None:
        sel = jnp.asarray(np.asarray(select, dtype=np.int64))
    else:
        sel = jnp.arange(n)
    use_fused = want_vectors and _fused_bt_enabled(
        n, config, leaf_only, mesh, want_vectors, int(sel.shape[0]))

    # prescale + lam rescale happen INSIDE the upsweep jit (one dispatch);
    # d, e come back prescaled for the refinement epilogue
    with timer.phase("eigenvalues"):
        if leaf_only:
            lam, lam_flat, Q, d, e = fn(d, e)
            reps = None
        else:
            reps, lam, lam_flat, Q, d, e = fn(d, e)
        # Enqueue the (n,)-slice BEFORE part A: the device stream is
        # in-order, so a slice enqueued after part A would make the host's
        # lam fetch below wait for the whole downsweep — exactly the
        # serialization the early dispatch exists to remove.
        lam_n = lam_flat[:n]
        # The fused backtransformation's part A (downsweep + refine pass 1)
        # depends on nothing the host computes, so dispatch it NOW — the
        # device rolls from the upsweep straight into the downsweep while
        # the host waits out the lam fetch below and plans the cluster
        # orthonormalization (part B).
        pre_a = None
        if use_fused and not leaf_only:
            pre_a = _compiled_fused_bt_a(
                n, config, int(sel.shape[0]),
                _spike_refine_enabled(n, config))(reps, Q, d, e, lam_flat,
                                                  sel)
        # The phase sync doubles as the epilogue's host fetch of the
        # prescaled eigenvalues: fetching lam_flat[:n] blocks on the whole
        # upsweep exactly like the one-leaf _sync (one ~33 ms tunnel round
        # trip either way), and both the fused-BT planner and the staged
        # refine triage need exactly this array on host — each used to
        # spend its own round trip (plus a norm_t reduction dispatch)
        # re-fetching it.
        lam_host = np.asarray(lam_n)

    V = None
    if want_vectors:
        # SE_PROFILE_BACKTRANSFORM=1: record per-step walls (with device
        # syncs between steps — profiling only, perturbs async overlap)
        prof = os.environ.get("SE_PROFILE_BACKTRANSFORM") == "1"
        subtimer = PhaseTimer() if prof else None
        with timer.phase("backtransformation"):
            bt_synced = False
            if leaf_only:
                V = Q[0][:, :n][:, sel]
            elif use_fused:
                V, bt_synced = _fused_backtransform(
                    reps, Q, d, e, lam_flat, sel, config,
                    subtimer=subtimer, lam_np_all=lam_host, pre=pre_a)
            elif (config.mixed_precision_vectors
                  and 12.0 * n * int(sel.shape[0]) > _grouped_bt_bytes()):
                # huge full-eigenpair solves: the full f32 downsweep output
                # plus the f64 refined vectors don't fit HBM together —
                # interleave downsweep groups with refinement pass 1
                V, res1_dev = _grouped_downsweep_refine(
                    reps, Q, d, e, lam_host, sel, config, mesh,
                    subtimer=subtimer)
                V = _refine_vectors(d, e, lam_flat[:n], sel, V, config,
                                    subtimer=subtimer, lam_host=lam_host,
                                    pass1_done=True, res1_dev=res1_dev)
            else:
                if prof:
                    with subtimer.phase("downsweep"):
                        V = _sync(downsweep_stepped(reps, Q, n, config, sel,
                                                    mesh))
                else:
                    V = downsweep_stepped(reps, Q, n, config, sel, mesh)
                if config.mixed_precision_vectors:
                    # refine in the *prescaled* system (d, e here are already
                    # divided by snorm): shifts must match that scaling
                    V = _refine_vectors(d, e, lam_flat[:n], sel, V, config,
                                        subtimer=subtimer,
                                        lam_host=lam_host)
            if not bt_synced:
                V = _sync(V)
        if prof:
            for k, v in subtimer.times.items():
                timer.times[f"bt.{k}"] = v
    return EighTridiagonalResult(eigenvalues=lam, eigenvectors=V), timer


def solve_tridiagonal_streamed(d, e, *, config: SolverConfig = DEFAULT_CONFIG,
                               group: int = 4096, halo: int = 256,
                               timer=None):
    """Full-eigenpair solve that never holds the whole eigenvector basis.

    At n=65536 the f64 basis is 34 GB — over double a v5e chip's HBM — and
    even at n=32768 (8.6 GB resident) the resident epilogue's transient
    group working sets exhaust the chip in practice.  This is the
    TPU-granularity version of the reference's ``writeResults``, which
    streams eigenvectors to disk one at a time for the same
    never-hold-everything reason (filehandling.c:369-507): eigenvalues once,
    then eigenvector columns in fixed-width halo'd windows — each window
    downswept, refined, sliced to its owned ``group`` columns, and yielded.

    Boundary clusters: every window carries ``halo`` columns on each side
    and only its central ``group`` columns are owned.  A near-degenerate
    cluster that straddles an owned boundary is then INTERIOR to both
    neighboring windows: both run the identical cluster orthonormalization
    on the identical column set (same executable, same data -> same
    result), so the owned halves stay mutually orthogonal.  That property
    is measured, not assumed: tests and the N65536_FULL.json artifact check
    the adjacent-window cross-Gram, each window's internal Gram, and the
    reference's own per-column residual (filehandling.c:511-537).

    Single-chip route by design (the multi-device path shards the resident
    solve instead; see ``solve_tridiagonal(mesh=...)``).

    Returns ``(lam, blocks, timer)``: ``lam`` the (n,) ascending
    eigenvalues, ``blocks`` a generator yielding ``(col_start, V_owned)``
    with ``V_owned`` an (n, <=group) f64 block of eigenvector columns
    ``col_start : col_start + V_owned.shape[1]``, in order.  The timer
    gains "eigenvalues" up front and accumulates
    "backtransformation_streamed" as the generator is drained.
    """
    from .utils.timing import PhaseTimer
    from .utils.timing import sync as _sync
    if timer is None:
        timer = PhaseTimer()
    d = jnp.asarray(d, config.dtype)
    e = jnp.asarray(e, config.dtype)
    n = int(d.shape[0])
    group = max(1, min(group, n))
    halo = max(0, halo)
    W = min(n, group + 2 * halo)
    fn, plan, leaf_only = _compiled_upsweep(n, config, None)
    with timer.phase("eigenvalues"):
        if leaf_only:
            lam, lam_flat, Q, d, e = fn(d, e)
            reps = None
        else:
            reps, lam, lam_flat, Q, d, e = fn(d, e)
        lam_host = np.asarray(lam_flat[:n])   # the fetch syncs the upsweep

    def window(s):
        sel = jnp.arange(s, s + W)
        if leaf_only:
            return Q[0][:, :n][:, sel]
        Vw = downsweep_stepped(reps, Q, n, config, sel, None)
        if config.mixed_precision_vectors:
            Vw = _refine_vectors(d, e, lam_flat[:n], sel, Vw, config,
                                 lam_host=lam_host)
        return Vw

    def blocks():
        V_full = window(0) if W == n else None   # one window covers all
        for a in range(0, n, group):
            g = min(group, n - a)
            t0 = time.perf_counter()
            if V_full is not None:
                Vo = jax.lax.dynamic_slice_in_dim(V_full, a, g, axis=1)
            else:
                s = min(max(a - halo, 0), n - W)
                Vw = window(s)
                Vo = jax.lax.dynamic_slice_in_dim(Vw, a - s, g, axis=1)
                del Vw
            _sync(Vo)
            timer.times["backtransformation_streamed"] = (
                timer.times.get("backtransformation_streamed", 0.0)
                + time.perf_counter() - t0)
            yield a, Vo

    return lam, blocks(), timer


def eigh_tridiagonal(d, e, *, config: SolverConfig = DEFAULT_CONFIG,
                     eigvals_only: bool = False, mesh=None):
    """scipy-style convenience wrapper: returns lam or (lam, V)."""
    res = solve_tridiagonal(d, e, config=config,
                            compute_vectors=not eigvals_only, mesh=mesh)
    if eigvals_only:
        return res.eigenvalues
    return res.eigenvalues, res.eigenvectors


@functools.lru_cache(maxsize=32)
def _compiled_eigh(n: int, config: SolverConfig, eigvals_only: bool,
                   mesh_id, panel: int, band: int = 0):
    """Cached jit for the dense path: the front-end's first compile is ~10 min
    on the tunneled TPU, so repeat calls must reuse the traced function.

    ``band`` > 0 selects the two-stage SBR front-end (dense -> band(b) by
    GEMM panels -> tridiagonal by wavefront bulge chasing;
    kernels/band_reduce.py) with eigenvectors back through Q1 Q2."""
    from .kernels.tridiagonalize import apply_q, tridiagonalize

    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    mesh = mesh_id[1] if mesh_id is not None else None

    @jax.jit
    def fn(A):
        if band > 0:
            from .kernels.band_reduce import (apply_q2_wave_blocked,
                                              band_to_tridiag_wave,
                                              reduce_to_band)
            B, Yt, taus = reduce_to_band(A, band,
                                         buckets=4 if n >= 8192 else 1,
                                         want_reflectors=not eigvals_only)
            d, e, vlog = band_to_tridiag_wave(B, band,
                                              want_log=not eigvals_only)
        else:
            d, e, Yt, taus = tridiagonalize(A, panel=panel,
                                            buckets=4 if n >= 8192 else 1)
        lam, W = _solve(d, e, None, plan, config,
                        want_vectors=not eigvals_only, mesh=mesh)
        if eigvals_only:
            return lam, None
        if band > 0:
            W = apply_q2_wave_blocked(n, band, vlog, W)
            X = apply_q(Yt, taus, W, panel=band)
        else:
            X = apply_q(Yt, taus, W, panel=panel)
        return lam, X

    return fn


@functools.lru_cache(maxsize=8)
def _compiled_tridiagonalize(n: int, dtype_name: str, panel: int):
    from .kernels.tridiagonalize import tridiagonalize

    # donate A: the 2 GB (n=16384 f64) dense input buffer is dead after the
    # front-end, and the staged pipeline needs the headroom
    # buckets: trailing-submatrix streaming optimization — the per-column
    # matvec is the dominant cost at n=16384 (see tridiagonalize docstring)
    return jax.jit(functools.partial(tridiagonalize, panel=panel,
                                     buckets=4 if n >= 8192 else 1),
                   donate_argnums=(0,))


@functools.lru_cache(maxsize=8)
def _compiled_apply_q(n: int, ncols: int, dtype_name: str, panel: int):
    from .kernels.tridiagonalize import apply_q

    def fn(Vt, taus, X):
        return apply_q(Vt, taus, X, panel=panel)

    return jax.jit(fn, donate_argnums=(2,))


def eigh(A, *, config: SolverConfig = DEFAULT_CONFIG,
         eigvals_only: bool = False, mesh=None, panel: int = 32,
         band: int = 0):
    """Dense symmetric eigensolver: Householder tridiagonalization front-end
    (kernels/tridiagonalize.py) + the Cuppen tridiagonal solver + compact-WY
    backtransformation.  Returns lam or (lam, V) like jnp.linalg.eigh.

    ``band`` > 0 selects the two-stage SBR front-end instead (dense -> band
    by GEMM panels -> tridiagonal by WAVEFRONT bulge chasing,
    kernels/band_reduce.py: Theta(n) batched-window dispatches, not
    Theta(n^2) sequential rotations).

    (The reference has no dense path — this fulfils BASELINE.md's end-to-end
    dense requirement.)
    """
    A = jnp.asarray(A, config.dtype)
    n = A.shape[0]
    if A.shape != (n, n):
        raise ValueError("A must be square")

    # Two-stage SBR on TPU ALWAYS runs staged (any n): the in-jit wave
    # chase is one dispatch, and the platform watchdog kills dispatches
    # over ~40-70 s (round-4 q8a "TPU device error" at n >= 1024).
    if band > 0:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        if on_tpu or (not eigvals_only
                      and n > config.resolved_single_jit_max_n()):
            lam, X = _eigh_two_stage_staged(A, config, eigvals_only,
                                            mesh, int(band))
            return lam if eigvals_only else (lam, X)

    # Above the single-jit limit, run the dense pipeline in stages (mirrors
    # solve_tridiagonal's auto-route): jit front-end -> staged tridiagonal
    # solve -> jit backtransform stage(s), donating the big buffers
    # between stages so peak HBM stays bounded at the headline sizes.
    if (not eigvals_only) and n > config.resolved_single_jit_max_n():
        d, e, Vt, tau = _compiled_tridiagonalize(
            n, str(A.dtype), panel)(A)
        res, _ = solve_tridiagonal_staged(
            d, e, config=config, compute_vectors=True, mesh=mesh)
        X = _compiled_apply_q(n, int(res.eigenvectors.shape[1]),
                              str(A.dtype), panel)(Vt, tau,
                                                   res.eigenvectors)
        return res.eigenvalues, X

    mesh_key = (id(mesh), mesh) if mesh is not None else None
    fn = _compiled_eigh(n, config, eigvals_only, mesh_key, panel,
                        int(band))
    lam, X = fn(A)
    if eigvals_only:
        return lam
    return lam, X


@functools.lru_cache(maxsize=8)
def _compiled_band_frontend(n: int, dtype_name: str, band: int,
                            want_reflectors: bool = True):
    """Staged two-stage SBR stage 1 (dense -> band) as one jit.

    Donates A (dead after stage 1); returns (B, Yt, taus).  Stage 2 (the
    wave chase) runs SEGMENTED on the host (band_to_tridiag_wave_staged):
    a long-running single-dispatch chase kills the device at n >= 1024
    (round-4 q8a crash; see _chase_update_mode)."""
    from .kernels.band_reduce import reduce_to_band

    def fn(A):
        return reduce_to_band(A, band, buckets=4 if n >= 8192 else 1,
                              want_reflectors=want_reflectors)

    return jax.jit(fn, donate_argnums=(0,))


def _eigh_two_stage_staged(A, config: SolverConfig, eigvals_only: bool,
                           mesh, band: int):
    """Host-orchestrated two-stage dense path: jit stage 1 -> segmented
    wave chase -> staged tridiagonal solve -> Q2/Q1 backtransform jits.
    Used for ALL band>0 solves on TPU (watchdog, see above) and above the
    single-jit size limit elsewhere."""
    from .kernels.band_reduce import band_to_tridiag_wave_staged

    n = int(A.shape[0])
    dt = str(A.dtype)
    B, Yt, taus = _compiled_band_frontend(n, dt, band, not eigvals_only)(A)
    d, e, vlog = band_to_tridiag_wave_staged(B, band,
                                             want_log=not eigvals_only)
    res, _ = solve_tridiagonal_staged(
        d, e, config=config, compute_vectors=not eigvals_only, mesh=mesh)
    if eigvals_only:
        return res.eigenvalues, None
    W = _compiled_apply_q2w(
        n, int(band), int(res.eigenvectors.shape[1]), dt)(
            vlog, res.eigenvectors)
    X = _compiled_apply_q(n, int(W.shape[1]), dt, int(band))(Yt, taus, W)
    return res.eigenvalues, X


@functools.lru_cache(maxsize=8)
def _compiled_apply_q2w(n: int, band: int, ncols: int, dtype_name: str):
    from .kernels.band_reduce import apply_q2_wave_blocked

    def fn(vlog, X):
        return apply_q2_wave_blocked(n, band, vlog, X)

    return jax.jit(fn, donate_argnums=(1,))


@functools.lru_cache(maxsize=16)
def _compiled_eigh_banded(n: int, u: int, config: SolverConfig,
                          eigvals_only: bool, mesh_id):
    """Cached jit for the banded path: band(u) -> tridiagonal by wavefront
    bulge chasing (kernels/band_reduce.py) + Cuppen D&C + reflector
    backtransform."""
    from .kernels.band_reduce import (apply_q2_wave_blocked,
                                      band_to_tridiag_wave)

    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    mesh = mesh_id[1] if mesh_id is not None else None

    @jax.jit
    def fn(B):
        # prescale to O(1): reflectors are scale-invariant, and TPU f64 has
        # only the f32 exponent range (see _solve)
        s = jnp.maximum(jnp.max(jnp.abs(B)), jnp.asarray(1e-30, B.dtype))
        d, e, vlog = band_to_tridiag_wave(B / s, u)
        lam, W = _solve(d, e, None, plan, config,
                        want_vectors=not eigvals_only, mesh=mesh)
        if eigvals_only:
            return lam * s, None
        return lam * s, apply_q2_wave_blocked(n, u, vlog, W)

    return fn


def eigh_banded(a_band, *, lower: bool = False,
                config: SolverConfig = DEFAULT_CONFIG,
                eigvals_only: bool = False, mesh=None):
    """All eigenpairs of a real symmetric BANDED matrix, from LAPACK-style
    band storage (``scipy.linalg.eig_banded`` conventions).

    Args:
      a_band: (u+1, n) band storage of the symmetric matrix A with u
        off-diagonals.  Upper form (default): ``a_band[u + i - j, j] = A[i, j]``
        for ``max(0, j-u) <= i <= j``; lower form (``lower=True``):
        ``a_band[i - j, j] = A[i, j]`` for ``j <= i <= min(n-1, j+u)``.
        Entries outside the valid range are ignored.
      lower: which form ``a_band`` uses.
      eigvals_only: skip eigenvectors.

    Returns ``lam`` or ``(lam, V)`` with eigenvalues ascending.

    u <= 1 routes straight to the tridiagonal solver.  u >= 2 runs the
    band -> tridiagonal WAVEFRONT bulge chase (kernels/band_reduce.py,
    Theta(n) batched-window dispatches; design PLAN_SBR2.md, exact-structure
    oracle tools/oracle_chase_wave.py) and transforms eigenvectors back
    through the reflector log.  The reference has no banded input path
    (src/main.c reads tridiagonal MTX only) — this is BASELINE.md
    completeness surface, mirroring LAPACK's dsbevd tier.
    """
    a_band = np.asarray(a_band)
    if a_band.ndim != 2 or a_band.shape[0] < 1:
        raise ValueError("a_band must be a (u+1, n) band-storage array")
    u = int(a_band.shape[0]) - 1
    n = int(a_band.shape[1])
    if n == 0:
        raise ValueError("empty matrix")
    # extract diagonal k (>= 0): diag_k[j] = A[j, j+k] for j in [0, n-k)
    def diag_k(k):
        if lower:
            return a_band[k, : n - k]       # A[j+k, j]
        return a_band[u - k, k:]            # A[j, j+k] stored at col j+k

    if u == 0 or n == 1:
        diag = jnp.asarray(diag_k(0), config.dtype)
        order = jnp.argsort(diag)
        lam = diag[order]
        if eigvals_only:
            return lam
        return lam, jnp.eye(n, dtype=config.dtype)[:, order]

    if u == 1:
        res = solve_tridiagonal(diag_k(0), diag_k(1), config=config,
                                compute_vectors=not eigvals_only, mesh=mesh)
        if eigvals_only:
            return res.eigenvalues
        return res.eigenvalues, res.eigenvectors

    # densify (host-side, cheap relative to the chase) for the general case
    A = np.zeros((n, n), dtype=np.asarray(a_band).dtype)
    np.fill_diagonal(A, diag_k(0))
    for k in range(1, min(u, n - 1) + 1):
        bk = np.asarray(diag_k(k))
        idx = np.arange(n - k)
        A[idx, idx + k] = bk
        A[idx + k, idx] = bk
    mesh_key = (id(mesh), mesh) if mesh is not None else None
    fn = _compiled_eigh_banded(n, u, config, eigvals_only, mesh_key)
    lam, V = fn(jnp.asarray(A, config.dtype))
    if eigvals_only:
        return lam
    return lam, V


def residuals(d, e, result: EighTridiagonalResult, select=None):
    """Per-eigenpair residual ||T v - lam v|| (ref filehandling.c:513-531)."""
    lam = result.eigenvalues
    if select is not None:
        lam = lam[jnp.asarray(select)]
    return residual_norms(d, e, lam, result.eigenvectors)
