"""On-device correctness check for the Pallas kernels (VERDICT r1 item 8).

Compares each compiled Pallas kernel against its XLA reference path on the
real TPU at bench-relevant shapes; interpreter-mode unit tests cannot catch
Mosaic lowering issues (e.g. FMA contraction or tiling bugs), this does.

Run:  PYTHONPATH=.:/root/.axon_site python tools/check_pallas_on_tpu.py
Record the printed max-abs-diff numbers in PARITY.md.
"""
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from symmetric_eigenvalue_tpu.kernels.pallas.cauchy_matmul import (
    cauchy_matmul, split_f64)
from symmetric_eigenvalue_tpu.kernels.pallas.dword_matvec import dword_vecmat


def check_cauchy(m=16384, C=2048, seed=0, precision=None):
    """Fused Cauchy matmul vs the XLA f64-generate + f32-dot path at the
    n=16384 bench shape (m slots x vec_chunk columns).

    ``precision`` pins SE_DOWNSWEEP_PRECISION for the call (None = shipped
    default): each MXU dot tier has its own accuracy grade — "highest" is
    ~1e-7, "bf16_3x" ~1.5e-5 by design (cauchy_matmul.py:26-39) — so the
    gate must be tier-aware (ADVICE r4 medium)."""
    saved = os.environ.get("SE_DOWNSWEEP_PRECISION")
    if precision is not None:
        os.environ["SE_DOWNSWEEP_PRECISION"] = precision
    try:
        return _check_cauchy_impl(m, C, seed, precision or "default")
    finally:
        if precision is not None:
            if saved is None:
                os.environ.pop("SE_DOWNSWEEP_PRECISION", None)
            else:
                os.environ["SE_DOWNSWEEP_PRECISION"] = saved


def _check_cauchy_impl(m, C, seed, tier):
    rng = np.random.default_rng(seed)
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    tau[m // 3] = 1e-13            # near-pole root: needs the pair arithmetic
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    X = rng.standard_normal((m, C)).astype(np.float32)

    Y = np.asarray(cauchy_matmul(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X)))

    @jax.jit
    def xla_path(poles, shift_val, tau, zhat, ncolinv, X):
        den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
        M = (zhat[:, None] / den) * ncolinv[None, :]
        # HIGHEST: the default f32 dot is a single bf16 MXU pass (~4e-3)
        return jnp.matmul(M.astype(jnp.float32), X,
                          precision=jax.lax.Precision.HIGHEST)

    Yx = np.asarray(xla_path(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X)))
    scale = np.abs(Yx).max()
    diff = np.abs(Y - Yx).max()
    print(f"cauchy_matmul   m={m} C={C} tier={tier}: "
          f"max|pallas-xla|={diff:.3e} "
          f"(scale {scale:.3e}, rel {diff/scale:.3e})")
    return diff / scale


def check_dword_matvec(n=4096, seed=0):
    """Double-word matvec vs the XLA emulated-f64 matvec."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    v = rng.standard_normal(n)
    Ah, Al = split_f64(jnp.asarray(A))
    y = np.asarray(jax.jit(dword_vecmat)(jnp.asarray(v), Ah, Al))
    yx = np.asarray(jax.jit(lambda v, A: v @ A)(jnp.asarray(v), jnp.asarray(A)))
    scale = np.abs(yx).max()
    diff = np.abs(y - yx).max()
    print(f"dword_vecmat    n={n}: max|pallas-xla|={diff:.3e} "
          f"(scale {scale:.3e}, rel {diff/scale:.3e})")
    return diff / scale


def check_dword_matmul(M=2048, K=512, N=2048, seed=0):
    """MXU-sliced f64 GEMM vs the XLA emulated-f64 dot."""
    from symmetric_eigenvalue_tpu.kernels.pallas.dword_matmul import (
        dword_matmul)
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, K))
    B = rng.standard_normal((K, N))
    Y = np.asarray(dword_matmul(jnp.asarray(A), jnp.asarray(B)))
    Yx = np.asarray(jax.jit(jnp.matmul)(jnp.asarray(A), jnp.asarray(B)))
    scale = np.abs(A) @ np.abs(B)
    rel = (np.abs(Y - Yx) / np.maximum(scale, 1e-30)).max()
    print(f"dword_matmul    {M}x{K}x{N}: max|pallas-xla|/(|A||B|)={rel:.3e}")
    return rel


def check_dword_slicing(K=16384, C=256):
    """Exact-slicing invariant of the double-word GEMM, checked ON DEVICE.

    Guards against compiler transformations of the slicing arithmetic: with
    --xla_allow_excess_precision=true (pinned by this platform's terminal)
    XLA's algebraic simplifier folded the old (r + C) - C grid rounding away
    in SOME fusion contexts — gaussian O(1) inputs passed while the
    orthogonality-check Gram silently degraded to ~1e-3.  Two invariants:
    every slice lies exactly on its 2^-8(t+1) grid, and the slices sum back
    to the normalized input at ~2^-48."""
    from symmetric_eigenvalue_tpu.kernels.pallas.dword_matmul import (
        KB, NSLICE, slice_lhs)

    @jax.jit
    def run():
        j = jnp.arange(1, K + 1, dtype=jnp.float64)
        i = jnp.arange(1, C + 1, dtype=jnp.float64)
        # small-magnitude oscillatory entries (the regime that exposed the
        # folding; gaussian O(1) did not)
        A = jnp.sqrt(2.0 / (K + 1)) * jnp.sin(
            jnp.pi * i[:, None] * j[None, :] / (K + 1))
        asl, sa = slice_lhs(A)
        rinv = 1.0 / jnp.repeat(sa.T, KB, axis=1)
        recon = jnp.sum(asl.astype(jnp.float64), axis=0)
        recon_err = jnp.max(jnp.abs(recon - A * rinv.astype(jnp.float64)))
        gm = []
        for t in range(NSLICE):
            v = asl[t].astype(jnp.float32) * np.float32(2.0 ** (8 * (t + 1)))
            gm.append(jnp.max(jnp.abs(v - jnp.round(v))))
        return recon_err, jnp.stack(gm)

    recon_err, gm = run()
    gm_max = float(jnp.max(gm))
    print(f"dword_slicing   K={K}: recon={float(recon_err):.3e} "
          f"grid={gm_max:.3e}")
    return float(recon_err), gm_max


def check_cauchy_rowsum(m=16384, seed=0):
    """Fused boundary-row sums vs the XLA emulated-f64 path — f64-grade
    required (feeds the next level's z-vector)."""
    from symmetric_eigenvalue_tpu.kernels.pallas.cauchy_rowsum import (
        cauchy_rowsum)
    rng = np.random.default_rng(seed)
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    tau[m // 3] = 1e-13
    shift_val = poles.copy()
    wz = rng.standard_normal((2, m)) * 0.2
    S = np.asarray(cauchy_rowsum(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(wz)))

    @jax.jit
    def xla_path(poles, shift_val, tau, wz):
        den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
        return wz @ (1.0 / den)

    Sx = np.asarray(xla_path(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(wz)))
    scale = np.abs(Sx).max()
    rel = np.abs(S - Sx).max() / scale
    print(f"cauchy_rowsum   m={m}: max|pallas-xla|/scale={rel:.3e}")
    return rel


def check_secular_sums(m=16384, B=2048, seed=0):
    """Root-finder reduction kernel vs the XLA emulated-f64 sums at the
    n=16384 top-merge shape (the hot loop, ref eigenvalues.c:8-17)."""
    from symmetric_eigenvalue_tpu.kernels.pallas.secular_sums import (
        secular_sums)
    rng = np.random.default_rng(seed)
    poles = np.sort(rng.standard_normal(m))
    z2 = (rng.standard_normal(m) * 0.1) ** 2
    sl = np.sort(rng.integers(0, m, B)).astype(np.int32)
    shift_val = poles[sl]
    tau = 1e-3 * rng.random(B) + 1e-14
    tau[B // 3] = 1e-13
    S1, S2, S1L, S2L = secular_sums(
        jnp.asarray(poles), jnp.asarray(z2), jnp.asarray(shift_val),
        jnp.asarray(tau), jnp.asarray(sl))

    @jax.jit
    def xla_path(poles, z2, shift_val, tau, sl):
        dif = (poles[None, :] - shift_val[:, None]) - tau[:, None]
        inv = 1.0 / dif
        t1 = z2[None, :] * inv
        t2 = t1 * inv
        mask = jnp.arange(m)[None, :] <= sl[:, None]
        return (jnp.sum(t1, axis=1), jnp.sum(t2, axis=1),
                jnp.sum(jnp.where(mask, t1, 0.0), axis=1),
                jnp.sum(jnp.where(mask, t2, 0.0), axis=1),
                jnp.max(jnp.abs(t1), axis=1), jnp.max(jnp.abs(t2), axis=1))
    X1, X2, X1L, X2L, t1m, t2m = [np.asarray(a) for a in xla_path(
        jnp.asarray(poles), jnp.asarray(z2), jnp.asarray(shift_val),
        jnp.asarray(tau), jnp.asarray(sl))]
    r_s1 = max((np.abs(np.asarray(S1) - X1) / np.maximum(np.abs(X1), t1m)).max(),
               (np.abs(np.asarray(S1L) - X1L) / np.maximum(np.abs(X1L), t1m)).max())
    r_s2 = max((np.abs(np.asarray(S2) - X2) / np.maximum(np.abs(X2), t2m)).max(),
               (np.abs(np.asarray(S2L) - X2L) / np.maximum(np.abs(X2L), t2m)).max())
    print(f"secular_sums    m={m} B={B}: S1 rel={r_s1:.3e} S2 rel={r_s2:.3e}")
    return r_s1, r_s2


def check_spike_solve(n=4096, K=2048, seed=0):
    """Pallas Spike refinement kernels vs the XLA blocked solver at a
    bench-relevant shape, with inverse-iteration-grade shifts (true
    eigenvalues of a scheme-2 matrix: closed-form, no host eigensolve)."""
    from symmetric_eigenvalue_tpu.core.tridiag import (
        create_matrix_scheme2, eigenvalues_of_scheme2)
    from symmetric_eigenvalue_tpu.kernels.pallas.spike_solve import (
        spike_refine)
    from symmetric_eigenvalue_tpu.kernels.refine import inverse_iteration

    rng = np.random.default_rng(seed)
    d, e = create_matrix_scheme2(n)
    lam_all = np.asarray(eigenvalues_of_scheme2(n))
    lam = jnp.asarray(np.sort(lam_all)[
        np.sort(rng.choice(n, K, replace=False))])
    B = rng.standard_normal((n, K)).astype(np.float32)
    B /= np.linalg.norm(B, axis=0, keepdims=True)
    B = jnp.asarray(B)

    X, res = spike_refine(d, e, lam, B, nb=128, chunk=1024)
    Xr = jax.jit(lambda d, e, lam, B: inverse_iteration(
        d, e, lam, B, steps=1, block=128))(d, e, lam, B)
    X, res, Xr = np.asarray(X), np.asarray(res), np.asarray(Xr)
    # both are unit eigenvector approximations: compare residuals, not
    # entries (sign/roundoff may differ)
    dn, en = np.asarray(d), np.asarray(e)
    normT = np.abs(lam_all).max()

    def resid(Y):
        TY = dn[:, None] * Y
        TY[1:] += en[:, None] * Y[:-1]
        TY[:-1] += en[:, None] * Y[1:]
        return np.linalg.norm(TY - Y * np.asarray(lam)[None, :], axis=0)

    r_pallas = resid(X).max() / normT
    r_xla = resid(Xr).max() / normT
    r_est = np.abs(res - resid(X)).max() / normT
    # the meaningful acceptance is parity with the XLA Spike solver (same
    # decomposition): both sit ~7e-11 at these exact-eigenvalue shifts
    ratio = r_pallas / max(r_xla, 1e-300)
    print(f"spike_refine    n={n} K={K}: pallas res={r_pallas:.3e} "
          f"xla res={r_xla:.3e} ratio={ratio:.3f} est err={r_est:.3e} "
          f"(x ||T||)")
    return ratio, r_est


def check_cauchy_deflation_skip(m=4096, C=2048, K=137, seed=2):
    """kact-skip path: BIT-exact vs the full-contraction kernel (slots are
    survivors-first; ncolinv zero past K makes skipped blocks exact zeros)."""
    rng = np.random.default_rng(seed)
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    ncolinv[K:] = 0.0
    X = rng.standard_normal((m, C)).astype(np.float32)
    args = tuple(jnp.asarray(a)
                 for a in (poles, shift_val, tau, zhat, ncolinv, X))
    Yf = np.asarray(cauchy_matmul(*args))
    Ys = np.asarray(cauchy_matmul(*args, kact=K))
    diff = np.abs(Yf - Ys).max()
    print(f"cauchy_deflskip m={m} C={C} K={K}: max|full-skip|={diff:.3e} "
          f"(must be 0)")
    return diff


def check_cauchy_materialize(m=16384, C=2048, K=9000, seed=3):
    """VMEM pair-f32 U materialization (downsweep ROOT) vs the XLA f64
    row_block formula, incl. deflated identity columns."""
    from symmetric_eigenvalue_tpu.kernels.pallas.cauchy_matmul import \
        cauchy_materialize
    rng = np.random.default_rng(seed)
    poles = np.sort(rng.standard_normal(m))
    shift_idx = rng.integers(0, m, m)
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    zhat = rng.standard_normal(m) * 0.1
    ncol = np.abs(rng.standard_normal(m)) + 0.5
    slots = rng.permutation(m)[:C]
    act = slots < K
    ninv = np.where(act, 1.0 / ncol[slots], 0.0)
    U = np.asarray(cauchy_materialize(
        jnp.asarray(poles), jnp.asarray(poles[shift_idx[slots]]),
        jnp.asarray(tau[slots]), jnp.asarray(zhat), jnp.asarray(ninv),
        jnp.asarray(slots), K))

    @jax.jit
    def xla_path():
        denom = (jnp.asarray(poles)[:, None]
                 - jnp.asarray(poles[shift_idx[slots]])[None, :]) \
            - jnp.asarray(tau[slots])[None, :]
        u = jnp.asarray(zhat)[:, None] / denom / jnp.asarray(
            ncol[slots])[None, :]
        eye = (jnp.arange(m)[:, None] == jnp.asarray(slots)[None, :])
        return jnp.where(jnp.asarray(act)[None, :], u, eye.astype(u.dtype))

    ref = np.asarray(xla_path())
    scale = np.abs(ref).max()
    rel = np.abs(U - ref).max() / scale
    eye_exact = np.array_equal(
        U[:, ~act], (np.arange(m)[:, None] == slots[None, ~act]))
    print(f"cauchy_material m={m} C={C} K={K}: rel={rel:.3e} "
          f"eye_exact={eye_exact}")
    return rel, eye_exact


def run_all(write: bool = True) -> dict:
    """Run every on-hardware kernel check; optionally write PALLAS_TPU.json.

    Callable in-process (bench.py's extras pass regenerates the artifact each
    round — VERDICT r3 #8) as well as from the CLI below."""
    # the cauchy MXU dot tier is selectable (SE_DOWNSWEEP_PRECISION): check
    # BOTH tiers against their own by-design grades — "highest" is ~6 bf16
    # passes (~1e-7), "bf16_3x" (the shipped default) captures ~16 mantissa
    # bits (~1.5e-5); gate at the matching test tolerances (ADVICE r4).
    r1h = check_cauchy(precision="highest")
    r1hb = check_cauchy(m=64, C=2048, seed=1,
                        precision="highest")   # small-m full-tile path
    r1x = check_cauchy(precision="bf16_3x")
    r1xb = check_cauchy(m=64, C=2048, seed=1, precision="bf16_3x")
    r2 = check_dword_matvec()
    r3 = check_dword_matmul()
    r4 = check_cauchy_rowsum()
    r5, r5b = check_secular_sums()
    r6, r6gm = check_dword_slicing()
    r7, r7e = check_spike_solve()
    r8 = check_cauchy_deflation_skip()
    r9, r9eye = check_cauchy_materialize()
    ok = (r1h < 1e-6 and r1hb < 1e-6
          and r1x < 1e-4 and r1xb < 1e-4
          and r2 < 1e-12 and r3 < 1e-12
          and r4 < 1e-11 and r5 < 1e-12 and r5b < 1e-5
          and r6 < 1e-13 and r6gm == 0.0
          and r7 < 1.5 and r7e < 1e-12
          and r8 == 0.0 and r9 < 1e-5 and r9eye)
    # machine-readable artifact: real-hardware kernel validation must be
    # driver-durable, not hand-copied prose (VERDICT r2)
    import json
    import time
    out = {
        "when": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "backend": jax.default_backend(),
        "rel_errors": {
            "cauchy_matmul_highest_m16384_C2048": float(f"{r1h:.3e}"),
            "cauchy_matmul_highest_m64_C2048": float(f"{r1hb:.3e}"),
            "cauchy_matmul_bf16_3x_m16384_C2048": float(f"{r1x:.3e}"),
            "cauchy_matmul_bf16_3x_m64_C2048": float(f"{r1xb:.3e}"),
            "dword_vecmat_n4096": float(f"{r2:.3e}"),
            "dword_matmul_2048x512x2048": float(f"{r3:.3e}"),
            "cauchy_rowsum_m16384": float(f"{r4:.3e}"),
            "secular_sums_S1_m16384_B2048": float(f"{r5:.3e}"),
            "secular_sums_S2_m16384_B2048": float(f"{r5b:.3e}"),
            "dword_slicing_recon_K16384": float(f"{r6:.3e}"),
            "dword_slicing_grid_offsets": float(r6gm),
            "spike_refine_res_ratio_vs_xla_n4096_K2048": float(f"{r7:.3e}"),
            "spike_refine_res_est_err": float(f"{r7e:.3e}"),
            "cauchy_deflation_skip_bitexact_diff": float(r8),
            "cauchy_materialize_m16384_C2048": float(f"{r9:.3e}"),
            "cauchy_materialize_eye_exact": bool(r9eye),
        },
        "ok": bool(ok),
    }
    if write:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "PALLAS_TPU.json"), "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        print(f"backend is {jax.default_backend()}, not tpu — aborting")
        sys.exit(1)
    out = run_all()
    print("OK" if out["ok"] else "FAIL")
    sys.exit(0 if out["ok"] else 1)
