"""Pallas TPU kernel: the Spike-partitioned shifted-tridiagonal solve in VMEM.

The mixed-precision epilogue's dominant cost is NOT flops: one f64
inverse-iteration pass at n=16384 is ~16 ms of real VPU work, but the XLA
implementation (kernels/refine.py::solve_shifted_tridiagonal_blocked) spends
~0.64 s because its lax.scans dispatch nb + P sequential fused kernels per
column chunk (~0.1 ms in-jit floor each, CLAUDE.md) — pure latency.  This
module runs the same Spike decomposition as THREE phases with the sequential
recurrences inside Pallas kernels, where a loop iteration costs nanoseconds
instead of a dispatch:

  pass A (kernel): per (row-block, column-tile), pivoted block-LU forward
      elimination + back substitution for the rhs and the two unit boundary
      loads, emitting ONLY the 6 boundary values each block contributes to
      the interface system.  The unit-load right-hand sides are implicit
      (their rows are j==0 / j==nb-1 indicators), so the extra RHS cost no
      memory traffic.
  interface (XLA): the 2x2 block-tridiagonal coupling solve over P blocks —
      (P, K)-shaped scans, small and latency-cheap, shared with the XLA
      fallback implementation (refine.py::interface_solve).
  pass B (kernel): re-eliminates each block (recomputing the factorization
      is ~free — latency was the enemy, not flops) with the neighbor
      couplings folded into the first/last rhs rows AT LOAD TIME (so the
      fold is correct regardless of pivoting row swaps), and writes the
      full solution plus per-block max-abs partials for the caller's
      normalization.

All arithmetic is double-word f32-pair (kernels/pallas/dword_ops): TPU has
no f64 ALU and Mosaic takes no f64 operands.  Accuracy is ~2^-47, the same
as the platform's emulated f64.

Column layout: a column tile of T = 1024 eigenpairs is viewed as one
(8, 128) vreg per row — 8 sublane groups of 128 lanes, ALL holding distinct
columns, so every step of the row recurrence is a full-width VPU op.  A
naive (1, T) row layout would idle 7/8 of every vector register (the
recurrence is sequential over rows, so rows cannot provide the sublane
parallelism).

Residuals for free: inverse iteration solves (T - lam_i) x_i = v_i with
``||v_i|| = 1``, so the residual of the normalized output is EXACTLY
``||(T - lam_i) x_hat_i|| = ||v_i|| / ||x_i||`` up to solver roundoff — the
LAPACK dstein acceptance quantity.  The caller gets it from the norms it
computes anyway, replacing the driver's explicit residual matvec passes.

Reference analog: LAPACK dstein's factor/solve per eigenvalue (the
reference delegates eigenvectors to its own secular extraction,
/root/reference/src/eigenvalues.c:291-358; this kernel backs the repo's
beyond-parity mixed-precision refinement pipeline, SURVEY §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dword_ops as dw

_T = 1024               # columns per tile: 8 sublane groups x 128 lanes
_BIG = 2.0 ** 80        # back-substitution cascade clip (matches refine.py)


def _r8(nb: int) -> int:
    """Per-block band rows, padded so Mosaic's sublane tiling accepts the
    block: the band BlockSpecs are (rows, 1) and the sublane dim must be a
    multiple of 8 (the natural nb+1 = 129 is not).  Pad rows are zero and
    never read (the kernel touches rows 0..nb only)."""
    return ((nb + 1) + 7) // 8 * 8


def _sel(m, a, b):
    """Elementwise pair select: where(m, a, b)."""
    return jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1])


def _clamp_piv(p, tiny):
    """Magnitude-floor a pivot pair at +-tiny (hi-word sign; lo zeroed when
    the clamp engages — the clamped value is exactly +-tiny)."""
    small = jnp.abs(p[0]) < tiny
    return (jnp.where(small, jnp.where(p[0] < 0, -tiny, tiny), p[0]),
            jnp.where(small, jnp.zeros_like(p[1]), p[1]))


def _bwd_row(ud, u1, u2, rj, x1, x2):
    """x = clip((r - u1*x1 - u2*x2) / ud)."""
    t1 = dw.mul(u1[0], u1[1], x1[0], x1[1])
    t2 = dw.mul(u2[0], u2[1], x2[0], x2[1])
    s = dw.add(t1[0], t1[1], t2[0], t2[1])
    num = dw.sub(rj[0], rj[1], s[0], s[1])
    x = dw.div(num[0], num[1], ud[0], ud[1])
    over = jnp.abs(x[0]) >= _BIG
    return (jnp.clip(x[0], -_BIG, _BIG),
            jnp.where(over, jnp.zeros_like(x[1]), x[1]))


def _build_kernel(nb: int, boundary: bool):
    """Kernel body for pass A (boundary=True: 3 rhs, boundary-only outputs)
    or pass B (boundary=False: 1 rhs with couplings folded, full output)."""
    nrhs = 3 if boundary else 1

    def kernel(dh, dl, eh, el, lamh, laml, vh, vl, tinyr, *refs):
        if boundary:
            bnd = refs[0]
            scr = refs[1:]
        else:
            Lh, Ll, Fh, Fl, ech, ecl, out_h, out_l, mxr = refs[:9]
            scr = refs[9:]
        s_ud = (scr[0], scr[1])
        s_u1 = (scr[2], scr[3])
        s_u2 = (scr[4], scr[5])
        s_r = scr[6:]                       # 2*nrhs refs

        lam = (lamh[0, 0], laml[0, 0])      # (8, 128)
        tiny = tinyr[0, 0]
        shape = lam[0]

        # Concrete-layout zero: broadcasts of scalars get a REPLICATED
        # Mosaic layout, and a fori_loop whose carry is initialized
        # replicated cannot yield the body's concrete-layout vectors
        # (concrete->replicated relayout is invalid).  Adding czero pins
        # every broadcast that can reach a loop carry to lam's concrete
        # layout.  (x*0 is not folded: the kernel jaxpr has no algebraic
        # simplifier, and lam is a VMEM load, not a constant.)
        czero = shape * 0.0

        def scal(h_ref, l_ref, j):
            return (czero + h_ref[j, 0], czero + l_ref[j, 0])

        zero = (czero, czero)

        if not boundary:
            eca = scal(ech, ecl, 0)         # coupler above this block
            ecb = scal(ech, ecl, 1)         # coupler below this block
            tL = dw.mul(eca[0], eca[1], Lh[0, 0], Ll[0, 0])
            tF = dw.mul(ecb[0], ecb[1], Fh[0, 0], Fl[0, 0])

        def rhs_row(q, j):
            """RHS q's row j (traced j): the rhs itself (with couplings
            folded at the boundary rows for pass B) or a unit indicator."""
            if q == 0:
                r = (vh[0, j, 0], vl[0, j, 0])
                if not boundary:
                    # fold ec_above*L_above into row 0, ec_self*F_below into
                    # row nb-1 (at LOAD time, so pivot swaps see it too)
                    at0 = j == 0
                    atl = j == nb - 1
                    fh = (jnp.where(at0, tL[0], 0.0)
                          + jnp.where(atl, tF[0], 0.0))
                    fl = (jnp.where(at0, tL[1], 0.0)
                          + jnp.where(atl, tF[1], 0.0))
                    r = dw.sub(r[0], r[1], fh, fl)
                return r
            tgt = 0 if q == 1 else nb - 1
            ind = jnp.where(j == tgt, 1.0, 0.0).astype(jnp.float32)
            return (czero + ind, czero)

        # ---- forward elimination (partial pivoting) ---------------------
        a0 = dw.add(*scal(dh, dl, 0), -lam[0], -lam[1])
        c0 = scal(eh, el, 0)
        r0 = tuple(rhs_row(q, 0) for q in range(nrhs))

        def fwd_body(j, carry):
            a, c, r = carry
            sub = scal(eh, el, j)
            a0n = dw.add(*scal(dh, dl, j + 1), -lam[0], -lam[1])
            c0n = scal(eh, el, j + 1)      # zero at the block edge (padded)
            rn = tuple(rhs_row(q, j + 1) for q in range(nrhs))

            swap = jnp.abs(sub[0]) > jnp.abs(a[0])
            piv = _clamp_piv(_sel(swap, sub, a), tiny)
            num = _sel(swap, a, sub)
            m = dw.div(num[0], num[1], piv[0], piv[1])

            s_ud[0][j], s_ud[1][j] = piv
            u1 = _sel(swap, a0n, c)
            s_u1[0][j], s_u1[1][j] = u1
            u2 = _sel(swap, c0n, zero)
            s_u2[0][j], s_u2[1][j] = u2
            for q in range(nrhs):
                rj = _sel(swap, rn[q], r[q])
                s_r[2 * q][j], s_r[2 * q + 1][j] = rj

            ax, ay = _sel(swap, c, a0n), _sel(swap, a0n, c)
            t = dw.mul(m[0], m[1], ay[0], ay[1])
            a_new = dw.sub(ax[0], ax[1], t[0], t[1])
            tc = dw.mul(m[0], m[1], c0n[0], c0n[1])
            c_new = _sel(swap, (-tc[0], -tc[1]), c0n)
            r_new = []
            for q in range(nrhs):
                rx, ry = _sel(swap, r[q], rn[q]), _sel(swap, rn[q], r[q])
                tq = dw.mul(m[0], m[1], ry[0], ry[1])
                r_new.append(dw.sub(rx[0], rx[1], tq[0], tq[1]))
            return a_new, c_new, tuple(r_new)

        a, _, r = jax.lax.fori_loop(0, nb - 1, fwd_body, (a0, c0, r0))

        j_last = nb - 1
        s_ud[0][j_last], s_ud[1][j_last] = _clamp_piv(a, tiny)
        s_u1[0][j_last], s_u1[1][j_last] = zero
        s_u2[0][j_last], s_u2[1][j_last] = zero
        for q in range(nrhs):
            s_r[2 * q][j_last], s_r[2 * q + 1][j_last] = r[q]

        # ---- back substitution -----------------------------------------
        def bwd_body(i, carry):
            x1, x2, last, mx_acc = carry
            j = nb - 1 - i
            ud = (s_ud[0][j], s_ud[1][j])
            u1 = (s_u1[0][j], s_u1[1][j])
            u2 = (s_u2[0][j], s_u2[1][j])
            x1n, x2n, lastn = [], [], []
            for q in range(nrhs):
                rj = (s_r[2 * q][j], s_r[2 * q + 1][j])
                x = _bwd_row(ud, u1, u2, rj, x1[q], x2[q])
                x2n.append(x1[q])
                x1n.append(x)
                lastn.append(_sel(i == 0, x, last[q]))
                if not boundary and q == 0:
                    out_h[0, j, 0] = x[0]
                    out_l[0, j, 0] = x[1]
                    mx_acc = jnp.maximum(mx_acc, jnp.abs(x[0] + x[1]))
            return tuple(x1n), tuple(x2n), tuple(lastn), mx_acc

        z = (zero,) * nrhs
        first, _, last, mx_acc = jax.lax.fori_loop(
            0, nb, bwd_body, (z, z, z, czero))

        if boundary:
            # rows: [uf, ul, s1f, s1l, s2f, s2l] x (hi, lo) interleaved
            vals = [first[0], last[0], first[1], last[1], first[2], last[2]]
            for i, (h, l) in enumerate(vals):
                bnd[2 * i, 0, 0] = h
                bnd[2 * i + 1, 0, 0] = l
        else:
            mxr[0, 0] = mx_acc

    return kernel


def _in_specs(nb):
    # band rows and the pivot floor are SCALARS read one row at a time:
    # they live in SMEM (a VMEM scalar load broadcast to a vector needs a
    # concrete->replicated relayout Mosaic refuses; SMEM scalar -> vector
    # broadcast is native)
    sb = pl.BlockSpec((_r8(nb), 1), lambda p, c: (p, 0),
                      memory_space=pltpu.SMEM)
    lamb = pl.BlockSpec((1, 1, 8, 128), lambda p, c: (c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vb = pl.BlockSpec((1, nb, 1, 8, 128), lambda p, c: (p, 0, c, 0, 0),
                      memory_space=pltpu.VMEM)
    tb = pl.BlockSpec((1, 1), lambda p, c: (0, 0), memory_space=pltpu.SMEM)
    return [sb, sb, sb, sb, lamb, lamb, vb, vb, tb]


def _scratch(nb, nrhs):
    return [pltpu.VMEM((nb, 8, 128), jnp.float32)] * (6 + 2 * nrhs)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _pass_a(dh, dl, eh, el, lamh, laml, vh, vl, tiny, nb: int,
            interpret: bool = False):
    """Boundary pass: bnd (12, P, K) f32 — [uf, ul, s1f, s1l, s2f, s2l]
    as (hi, lo) interleaved rows."""
    P = dh.shape[0] // _r8(nb)
    nT = lamh.shape[0]
    with jax.enable_x64(False):
        bnd = pl.pallas_call(
            _build_kernel(nb, True),
            grid=(P, nT),
            in_specs=_in_specs(nb),
            out_specs=pl.BlockSpec((12, 1, 1, 8, 128),
                                   lambda p, c: (0, p, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12, P, nT, 8, 128), jnp.float32),
            scratch_shapes=_scratch(nb, 3),
            interpret=interpret,
        )(dh, dl, eh, el, lamh, laml, vh, vl, tiny)
    return bnd.reshape(12, P, nT * _T)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _pass_b(dh, dl, eh, el, lamh, laml, vh, vl, tiny,
            Lh, Ll, Fh, Fl, ech, ecl, nb: int, interpret: bool = False):
    """Full solve with folded couplings: (Xh, Xl (n, K), mx (P, K))."""
    P = dh.shape[0] // _r8(nb)
    nT = lamh.shape[0]
    pkb = pl.BlockSpec((1, 1, 8, 128), lambda p, c: (p, c, 0, 0),
                       memory_space=pltpu.VMEM)
    ecb = pl.BlockSpec((8, 1), lambda p, c: (p, 0), memory_space=pltpu.SMEM)
    xb = pl.BlockSpec((1, nb, 1, 8, 128), lambda p, c: (p, 0, c, 0, 0),
                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out_h, out_l, mx = pl.pallas_call(
            _build_kernel(nb, False),
            grid=(P, nT),
            in_specs=_in_specs(nb) + [pkb, pkb, pkb, pkb, ecb, ecb],
            out_specs=[xb, xb, pkb],
            out_shape=[
                jax.ShapeDtypeStruct((P, nb, nT, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((P, nb, nT, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((P, nT, 8, 128), jnp.float32),
            ],
            scratch_shapes=_scratch(nb, 1),
            interpret=interpret,
        )(dh, dl, eh, el, lamh, laml, vh, vl, tiny,
          Lh, Ll, Fh, Fl, ech, ecl)
    n = P * nb
    K = nT * _T
    return out_h.reshape(n, K), out_l.reshape(n, K), mx.reshape(P, K)


@functools.partial(jax.jit, static_argnames=("nb",))
def _band_prep(d, e, nb: int):
    """Pad/split the band arrays once per solve: returns the kernel-layout
    band pairs, the cross couplers, and the pivot floor."""
    dtype = jnp.float64
    n = d.shape[0]
    d = d.astype(dtype)
    e = e.astype(dtype)
    scale = jnp.max(jnp.abs(d)) + 2.0 * jnp.max(jnp.abs(e))
    tiny = (jnp.asarray(2.0 ** -48, jnp.float32)
            * jnp.maximum(scale, 1e-30).astype(jnp.float32)).reshape(1, 1)
    pad = (-n) % nb
    npad = n + pad
    if pad:
        # decoupled, well-conditioned pad rows (same scheme as refine.py)
        dbig = 4.0 * scale + 4.0
        d = jnp.concatenate([d, jnp.full((pad,), dbig, dtype)])
    P = npad // nb
    db = d.reshape(P, nb)
    e_all = jnp.concatenate(
        [e, jnp.zeros((npad - e.shape[0],), dtype)]).reshape(P, nb)
    # per-block bands padded with a trailing zero row: the kernel reads row
    # j+1 for both d and e, and the in-block superdiagonal after the last
    # row must be zero (block decoupling)
    r8 = _r8(nb)
    ebx = jnp.concatenate([e_all[:, : nb - 1],
                           jnp.zeros((P, r8 - (nb - 1)), dtype)], axis=1)
    dbx = jnp.concatenate([db, jnp.zeros((P, r8 - nb), dtype)], axis=1)
    e_cross = e_all[:, nb - 1]
    ec_above = jnp.concatenate([jnp.zeros((1,), dtype), e_cross[:-1]])
    dh, dl = dw.from_f64(dbx.reshape(P * r8, 1))
    eh, el = dw.from_f64(ebx.reshape(P * r8, 1))
    # couplers padded to 8 sublane rows per block for the same tiling rule
    ecp = jnp.concatenate([ec_above[:, None], e_cross[:, None],
                           jnp.zeros((P, 6), dtype)], axis=1)   # (P, 8)
    ech, ecl = dw.from_f64(ecp.reshape(P * 8, 1))
    return dh, dl, eh, el, ech, ecl, e_cross, ec_above, tiny


def _pad_cols(lam, B, npad):
    K = lam.shape[0]
    kpad = (-K) % _T
    n = B.shape[0]
    if npad > n:
        B = jnp.concatenate(
            [B, jnp.zeros((npad - n, K), B.dtype)], axis=0)
    if kpad:
        lam = jnp.concatenate([lam, jnp.zeros((kpad,), lam.dtype)])
        B = jnp.concatenate([B, jnp.zeros((npad, kpad), B.dtype)], axis=1)
    return lam, B


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _chunk_a(dh, dl, eh, el, ech, ecl, tiny, lam, B, nb: int,
             interpret: bool = False):
    """Chunk boundary pass: lam (Kc,), B (npad, Kc) -> bnd (12, P, Kc) f64."""
    P = dh.shape[0] // _r8(nb)
    nT = lam.shape[0] // _T
    lamh, laml = dw.from_f64(lam.astype(jnp.float64).reshape(nT, 1, 8, 128))
    vh, vl = dw.from_f64(
        B.astype(jnp.float64).reshape(P, nb, nT, 8, 128))
    bnd = _pass_a(dh, dl, eh, el, lamh, laml, vh, vl, tiny, nb=nb,
                  interpret=interpret)
    return bnd.astype(jnp.float64)


@jax.jit
def _interface(bnd, e_cross, ec_above):
    """bnd (12, P, K) f64 -> (L_above, F_below) (P, K) f64."""
    from ..refine import interface_solve
    dtype = bnd.dtype
    K = bnd.shape[2]
    uf = bnd[0] + bnd[1]
    ul = bnd[2] + bnd[3]
    pf = (bnd[4] + bnd[5]) * ec_above[:, None]
    pl_ = (bnd[6] + bnd[7]) * ec_above[:, None]
    qf = (bnd[8] + bnd[9]) * e_cross[:, None]
    ql = (bnd[10] + bnd[11]) * e_cross[:, None]
    F, L = interface_solve(pf, pl_, qf, ql, uf, ul)
    L_above = jnp.concatenate([jnp.zeros((1, K), dtype), L[:-1]], axis=0)
    F_below = jnp.concatenate([F[1:], jnp.zeros((1, K), dtype)], axis=0)
    return L_above, F_below


@functools.partial(jax.jit, static_argnames=("nb", "interpret", "normalize"),
                   donate_argnums=(8,))
def _chunk_b(dh, dl, eh, el, ech, ecl, tiny, lam, B, L_above, F_below,
             nb: int, interpret: bool = False, normalize: bool = True):
    """Chunk full solve: returns (X (npad, Kc) f64 [normalized], res (Kc,))."""
    dtype = jnp.float64
    P = dh.shape[0] // _r8(nb)
    nT = lam.shape[0] // _T
    Kp = lam.shape[0]
    lamh, laml = dw.from_f64(lam.astype(dtype).reshape(nT, 1, 8, 128))
    vnorm = jnp.linalg.norm(B.astype(jnp.float32), axis=0).astype(dtype)
    vh, vl = dw.from_f64(B.astype(dtype).reshape(P, nb, nT, 8, 128))
    Lh, Ll = dw.from_f64(L_above.reshape(P, nT, 8, 128))
    Fh, Fl = dw.from_f64(F_below.reshape(P, nT, 8, 128))
    Xh, Xl, mx = _pass_b(dh, dl, eh, el, lamh, laml, vh, vl, tiny,
                         Lh, Ll, Fh, Fl, ech, ecl, nb=nb,
                         interpret=interpret)
    X = Xh.astype(dtype) + Xl.astype(dtype)
    if not normalize:
        return X, jnp.zeros((Kp,), dtype)
    # max-prescaled normalization (squares stay inside the f32 exponent
    # range of the platform's emulated f64) + the free dstein residual
    mx_raw = jnp.max(mx, axis=0)                       # (Kp,) f32
    mxc = jnp.maximum(mx_raw, 1e-30).astype(dtype)
    Y = X / mxc[None, :]
    nrm = jnp.linalg.norm(Y, axis=0)
    nrm_safe = jnp.maximum(nrm, 1e-30)
    res = vnorm / (mxc * nrm_safe)
    # HONESTY GUARD: ||v||/||x|| assumes x actually solves the system.  When
    # the back-substitution cascade hits the +-_BIG clip the output is NOT a
    # solution (the clip truncates the growth mid-cascade and garbles the
    # direction), and the estimate comes out absurdly SMALL (~1e-25) exactly
    # when the column is worthless — observed at 4/16384 columns of the
    # n=16384 headline, whose pair-arithmetic pivot decisions diverged from
    # the XLA solver's on near-singular systems.  Flag clipped/non-finite
    # columns with a huge sentinel so the driver's risky-column machinery
    # (extra pass + measured-residual rescue) picks them up.
    clipped = (~jnp.isfinite(mx_raw)) | (
        mx_raw >= jnp.asarray(_BIG * 0.99, mx_raw.dtype))
    res = jnp.where(clipped, jnp.asarray(1e30, dtype), res)
    return Y / nrm_safe[None, :], res


def spike_refine(d, e, lam, V, nb: int = 128, chunk: int = 2048,
                 interpret: bool = False, normalize: bool = True,
                 scan: bool = False):
    """One f64-grade inverse-iteration pass through the Pallas Spike
    kernels: returns (X (n, K) f64 normalized, res_est (K,) f64).

    ``res_est[i] = ||v_i|| / ||x_i||`` — the residual
    ``||(T - lam_i) x_hat_i||`` of the normalized output up to solver
    roundoff (the dstein acceptance quantity), replacing the driver's
    explicit residual matvec passes.

    Columns are processed in ``chunk``-wide slices (bounding the pair-array
    working set) with ONE interface solve across all chunks; every chunk
    shape hits the same jit cache entries.

    ``scan=True`` runs the chunk loop as a ``lax.scan`` writing into one
    preallocated output (for use INSIDE a jit): the unrolled Python loop
    gives XLA nch interleaved-lifetime chunk temporaries whose packing
    failure OOM'd n=32768 with 4 GB of fragmentation (used 15.93 G of
    15.75 G with only 11.88 G of live buffers) — the scan body reuses one
    iteration's buffers.
    """
    n = d.shape[0]
    K = lam.shape[0]
    nb = int(nb)
    chunk = max(_T, (int(chunk) // _T) * _T)
    dh, dl, eh, el, ech, ecl, e_cross, ec_above, tiny = _band_prep(d, e, nb)
    npad = (dh.shape[0] // _r8(nb)) * nb

    if scan and K > chunk:
        return _spike_refine_scan(
            dh, dl, eh, el, ech, ecl, e_cross, ec_above, tiny, lam, V,
            n, npad, nb, chunk, interpret, normalize)

    bnds = []
    for o in range(0, K, chunk):
        w = min(chunk, K - o)
        lam_c, B_c = _pad_cols(lam[o:o + w], V[:, o:o + w], npad)
        bnds.append(_chunk_a(dh, dl, eh, el, ech, ecl, tiny, lam_c, B_c,
                             nb=nb, interpret=interpret))
    bnd = jnp.concatenate(bnds, axis=2) if len(bnds) > 1 else bnds[0]
    L_above, F_below = _interface(bnd, e_cross, ec_above)

    outs, ress = [], []
    for ci, o in enumerate(range(0, K, chunk)):
        w = min(chunk, K - o)
        lam_c, B_c = _pad_cols(lam[o:o + w], V[:, o:o + w], npad)
        Kp = lam_c.shape[0]
        X_c, r_c = _chunk_b(dh, dl, eh, el, ech, ecl, tiny, lam_c, B_c,
                            L_above[:, ci * chunk: ci * chunk + Kp],
                            F_below[:, ci * chunk: ci * chunk + Kp],
                            nb=nb, interpret=interpret, normalize=normalize)
        outs.append(X_c[:n, :w])
        ress.append(r_c[:w])
    X = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    res = jnp.concatenate(ress) if len(ress) > 1 else ress[0]
    return X, res


def _spike_refine_scan(dh, dl, eh, el, ech, ecl, e_cross, ec_above, tiny,
                       lam, V, n, npad, nb, chunk, interpret, normalize):
    """Chunk loop of :func:`spike_refine` as two ``lax.scan``s (phase A over
    chunks -> one interface solve -> phase B updating a preallocated X).

    Column padding to a chunk multiple uses zero right-hand sides (a zero
    column solves to zero; with ``normalize`` its max-prescale clamps at
    1e-30 so nothing divides by zero) and the pads are sliced off."""
    K = lam.shape[0]
    kpad = (-K) % chunk
    Kp = K + kpad
    lam_p = (jnp.concatenate([lam, jnp.zeros((kpad,), lam.dtype)])
             if kpad else lam)
    Vp = V
    if npad > n:
        Vp = jnp.concatenate(
            [Vp, jnp.zeros((npad - n, K), Vp.dtype)], axis=0)
    if kpad:
        Vp = jnp.concatenate(
            [Vp, jnp.zeros((npad, kpad), Vp.dtype)], axis=1)
    nch = Kp // chunk
    P = dh.shape[0] // _r8(nb)

    def fa(_, i):
        lam_c = jax.lax.dynamic_slice(lam_p, (i * chunk,), (chunk,))
        B_c = jax.lax.dynamic_slice(Vp, (0, i * chunk), (npad, chunk))
        bnd_c = _chunk_a(dh, dl, eh, el, ech, ecl, tiny, lam_c, B_c,
                         nb=nb, interpret=interpret)
        return None, bnd_c
    _, bnds = jax.lax.scan(fa, None, jnp.arange(nch))      # (nch, 12, P, chunk)
    bnd = jnp.moveaxis(bnds, 0, 2).reshape(12, P, Kp)
    L_above, F_below = _interface(bnd, e_cross, ec_above)  # (P, Kp)

    X0 = jnp.zeros((npad, Kp), jnp.float64)

    def fb(X, i):
        lam_c = jax.lax.dynamic_slice(lam_p, (i * chunk,), (chunk,))
        B_c = jax.lax.dynamic_slice(Vp, (0, i * chunk), (npad, chunk))
        La = jax.lax.dynamic_slice(L_above, (0, i * chunk), (P, chunk))
        Fb = jax.lax.dynamic_slice(F_below, (0, i * chunk), (P, chunk))
        X_c, r_c = _chunk_b(dh, dl, eh, el, ech, ecl, tiny, lam_c, B_c,
                            La, Fb, nb=nb, interpret=interpret,
                            normalize=normalize)
        X = jax.lax.dynamic_update_slice(X, X_c, (0, i * chunk))
        return X, r_c
    X, ress = jax.lax.scan(fb, X0, jnp.arange(nch))
    return X[:n, :K], ress.reshape(Kp)[:K]


def solve_shifted_tridiagonal_spike(d, e, lam, B, nb: int = 128,
                                    interpret: bool = False):
    """Pallas Spike solve of (T - lam_i I) x_i = B[:, i] for every column.

    Same decomposition and pivoting as
    refine.py::solve_shifted_tridiagonal_blocked; returns the UNNORMALIZED
    solution X (n, K) f64.  ``interpret=True`` runs the kernels in
    interpreter mode (CPU testing)."""
    X, _ = spike_refine(d, e, lam, B, nb=nb, interpret=interpret,
                        normalize=False)
    return X
