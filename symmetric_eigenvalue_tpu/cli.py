"""Command-line driver ``cuppen`` — flag parity with the reference binary.

Reference usage (main.c:703-734 ``showHelp``):
    cuppens [options] [outputfile]
      -h            help
      -i FILENAME   tridiagonal matrix in MTX format
      -s NUM        predefined scheme 1|2 (ignored when -i given)
      -n NUM        dimension for -s (default 1000)
      -e(FILENAME)  compute eigenvectors: bare -e = all; -eFILE = indices from
                    file (no blank between option and filename; a blank also
                    works here)
TPU-specific extras: --leaf-size, --devices, --profile-dir, --f32.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional

import numpy as np


def _preprocess_argv(argv: List[str]) -> List[str]:
    """getopt ``-e::`` semantics: the filename must be glued (``-eFILE``); a bare
    ``-e`` means all eigenvectors (main.c:123-127: 'there is no blank between
    the option and the filename')."""
    out = []
    for a in argv:
        if a.startswith("-e") and len(a) > 2 and not a.startswith("-e="):
            out.extend(["--evfile", a[2:]])
        else:
            out.append(a)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cuppen",
        description="Compute all eigenpairs of a symmetric tridiagonal matrix "
                    "with a TPU-native parallel Cuppen divide-and-conquer "
                    "algorithm. Results can be written to an output file.",
    )
    p.add_argument("-i", metavar="FILENAME", dest="inputfile", default=None,
                   help="file containing a tridiagonal matrix in mtx format")
    p.add_argument("-s", metavar="NUM", dest="scheme", type=int, default=1,
                   help="predefined matrix scheme: 1 = [-1, d_i, -1] with d_i "
                        "evenly spaced in [1,100]; 2 = Poisson [-1,2,-1] "
                        "(eigenvalue i is 2+2cos(pi*i/(n+1)))")
    p.add_argument("-n", metavar="NUM", dest="dim", type=int, default=1000,
                   help="dimension of the matrix chosen with -s (default 1000)")
    p.add_argument("-e", dest="eall", action="store_true",
                   help="compute all eigenvectors; use -eFILENAME (no blank) "
                        "to read 1-based indices from a file (one per line)")
    p.add_argument("--evfile", dest="evfile", default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("outputfile", nargs="?", default=None)
    p.add_argument("--leaf-size", type=int, default=None,
                   help="target base-case block size of the merge tree "
                        "(default: auto — 2 on TPU, 32 elsewhere)")
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices to shard over (default: all)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--f32", action="store_true",
                   help="solve in float32 (faster, ~1e-5 residuals)")
    # multi-host bootstrap (analog of the reference's mpd.hosts / mpirun -f,
    # Makefile:37): DCN-connected slices via jax.distributed
    p.add_argument("--coordinator", default=None,
                   help="coordinator address for multi-host execution")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        build_parser().print_help()
        return 0
    args = build_parser().parse_args(_preprocess_argv(argv))

    if args.inputfile is None and args.scheme not in (1, 2):
        print("Invalid argument for option -s. See help.", file=sys.stderr)
        return 1
    if args.dim < 1:
        print("Invalid argument for option -n. See help.", file=sys.stderr)
        return 1

    # Heavy imports after arg validation (fast ``-h``).
    import jax
    import jax.numpy as jnp

    if args.coordinator or args.num_processes:
        from .dist.mesh import distributed_init
        distributed_init(args.coordinator, args.num_processes, args.process_id)

    from . import SolverConfig
    from .core.tridiag import (create_matrix_scheme1, create_matrix_scheme2,
                               residual_norms)
    from .dist.mesh import make_mesh
    from .driver import solve_tridiagonal_staged
    from .io.evselect import determine_eigenvectors_to_compute
    from .io.mtx import read_symmetric_tridiagonal
    from .io.results import write_results
    from .utils.timing import PhaseTimer, maybe_profile

    dtype = jnp.float32 if args.f32 else jnp.float64

    if args.inputfile is not None:
        print(f"Input file: {args.inputfile}")
        try:
            d_np, e_np = read_symmetric_tridiagonal(args.inputfile)
        except (OSError, ValueError) as exc:
            # clean diagnostic + nonzero exit, matching the reference's file
            # error handling (main.c:181 MPI_ABORT path); MTXFormatError is a
            # ValueError subclass
            print(f"Could not read input file: {exc}", file=sys.stderr)
            return 1
        n = d_np.shape[0]
        d = jnp.asarray(d_np, dtype)
        e = jnp.asarray(e_np, dtype)
    else:
        n = args.dim
        print(f"Use a matrix of scheme {args.scheme} with dimension {n}")
        gen = create_matrix_scheme1 if args.scheme == 1 else create_matrix_scheme2
        d, e = gen(n, dtype=dtype)

    compute_ev = args.eall or args.evfile is not None
    ev_filename = args.evfile
    if compute_ev:
        if ev_filename is not None:
            print(f"Compute the eigenvectors defined in: {ev_filename}")
        else:
            print("Program will compute all eigenvectors")
    if args.outputfile is not None:
        print(f"Output file: {args.outputfile}")

    ndev = len(jax.devices()) if args.devices is None else args.devices
    print()
    print(f"Number of devices is: {ndev}  (backend: {jax.default_backend()})")
    mesh = make_mesh(args.devices) if ndev > 1 else None

    selection = determine_eigenvectors_to_compute(compute_ev, ev_filename, n)
    select = None
    if selection.indices is not None:
        select = np.asarray(sorted(set(selection.indices)), dtype=np.int64)
        if select.size == 0 and not selection.all:
            compute_ev = False
            select = None

    config = SolverConfig(leaf_size=args.leaf_size, dtype=dtype)

    print("Start divide phase ...")
    print("Apply batched eigensolver on leaves ...")
    print("Start Conquer Phase ...")
    # Huge all-eigenvector solves: the output file holds eigenvalues plus
    # per-column residuals, never the vectors themselves (ref writeResults
    # streams vectors to disk one at a time for exactly this reason,
    # filehandling.c:369-507) — so columns can be produced in halo'd
    # windows, residual-checked on device, and released.  Resident-route
    # transients exhaust a 16 GB chip past ~12*n^2 bytes (r5 q1a, n=32768).
    import os as _os
    stream_bytes = float(_os.environ.get("SE_STREAM_BT_BYTES", "12e9"))
    use_streamed = (compute_ev and select is None and mesh is None
                    and (jax.default_backend() == "tpu"
                         or _os.environ.get("SE_FORCE_STREAMED") == "1")
                    and 12.0 * float(n) * n > stream_bytes)

    timer = PhaseTimer()
    res_vals = None
    computed_idx = None
    with maybe_profile(args.profile_dir):
        if use_streamed:
            from .driver import (_compiled_residuals,
                                 solve_tridiagonal_streamed)
            lam, blocks, timer = solve_tridiagonal_streamed(
                d, e, config=config, timer=timer)
            lam_np = np.asarray(lam)
            chunk = max(1, min(config.vec_chunk,
                               config.resolved_refine_chunk(n)))
            parts = []
            for a, Vo in blocks:
                w = int(Vo.shape[1])
                parts.append(np.asarray(
                    _compiled_residuals(n, w, min(chunk, w))(
                        d, e, jnp.asarray(lam_np[a:a + w]), Vo)))
            res_vals = np.concatenate(parts)
            from .driver import EighTridiagonalResult
            result = EighTridiagonalResult(eigenvalues=lam,
                                           eigenvectors=None)
        else:
            result, timer = solve_tridiagonal_staged(
                d, e, config=config,
                compute_vectors=(compute_ev and select is None),
                select=select, mesh=mesh, timer=timer)

    print()
    print(timer.report())

    if args.outputfile is not None:
        print()
        print("Write results to file ...")
        if result.eigenvectors is not None:
            lam_for_res = (result.eigenvalues if select is None
                           else result.eigenvalues[jnp.asarray(select)])
            res_vals = np.asarray(
                residual_norms(d, e, lam_for_res, result.eigenvectors))
            computed_idx = select if select is not None else None
        write_results(args.outputfile, np.asarray(result.eigenvalues),
                      res_vals, computed_idx)

    print()
    print("Program finished successfully!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
