"""Phase timing instrumentation.

The reference brackets phases with ``omp_get_wtime`` and prints seconds plus
percentage fractions (main.c:672-678, filehandling.c:564-569).  Here each timed
block synchronizes on its device results (``block_until_ready``) so the numbers
are honest under JAX's async dispatch; an optional ``jax.profiler`` trace
directory gives the deep view the reference never had.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def sync(tree):
    """Robust device synchronization.

    ``block_until_ready`` is a no-op on some tunneled PJRT platforms (observed
    on axon-proxied TPU), so additionally fetch one element of ONE array leaf
    to the host: outputs of a dispatch materialize together, so a single fetch
    waits for the whole program (per-leaf fetches would cost a ~33 ms tunnel
    round-trip each).  Returns ``tree`` unchanged.
    """
    tree = jax.block_until_ready(tree)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[0])
            break
    return tree


class PhaseTimer:
    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def time_phase(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = sync(fn(*args, **kwargs))
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0
        return out

    def report(self, total_key: str = "eigenvalues") -> str:
        """Reference-style report lines (main.c:676-678, filehandling.c:567-568)."""
        lines = []
        total = self.times.get(total_key, 0.0)
        if total_key in self.times:
            lines.append(
                f"Required time to compute all eigenvalues: {total:f} seconds")
        if "root_finding" in self.times and total > 0:
            rs = self.times["root_finding"]
            lines.append(
                f"Required time for root finding: {rs:f} seconds; "
                f"fraction: {100*rs/total:.1f}%")
        if "eigenvector_extraction" in self.times and total > 0:
            es = self.times["eigenvector_extraction"]
            lines.append(
                "Required time for eigenvector extraction from U_i's: "
                f"{es:f} seconds; fraction: {100*es/total:.1f}%")
        if "backtransformation" in self.times:
            bs = self.times["backtransformation"]
            lines.append(
                f"Required time for backtransformation: {bs:f} seconds")
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace wrapper (--profile-dir CLI flag)."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
