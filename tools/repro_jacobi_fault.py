"""Minimal repro hunt for the n=65536 2048-block Jacobi device fault.

Round-1 observation (config.py leaf-count cap): a batched-Jacobi leaf stage
with P=2048 blocks of b=32 (n=65536, max_leaves uncapped) faults the device
('UNAVAILABLE: TPU device error').  Bisect over (P, b) directly on the
jacobi_eigh kernel to find the smallest faulting configuration.
"""
import os, sys, time
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from symmetric_eigenvalue_tpu.kernels.jacobi import jacobi_eigh
from symmetric_eigenvalue_tpu.utils.timing import sync

P = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
b = int(sys.argv[2]) if len(sys.argv) > 2 else 32

rng = np.random.default_rng(0)
# tridiagonal-ish blocks like the leaf stage produces
A = np.zeros((P, b, b))
d = rng.standard_normal((P, b))
e = rng.standard_normal((P, b - 1)) * 0.5
for i in range(b):
    A[:, i, i] = d[:, i]
for i in range(b - 1):
    A[:, i, i + 1] = e[:, i]
    A[:, i + 1, i] = e[:, i]
A = jnp.asarray(A)

print(f"P={P} b={b}: compiling...", flush=True)
f = jax.jit(jacobi_eigh)
t0 = time.perf_counter()
lam, V = f(A)
lam = sync(lam)
print(f"P={P} b={b}: OK in {time.perf_counter()-t0:.1f}s "
      f"(lam[0,0]={float(lam[0][0]):.3f})", flush=True)
