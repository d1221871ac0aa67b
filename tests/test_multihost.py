"""Multi-process (multi-host analog) test through ``distributed_init``.

The reference launches one MPI process per host via ``mpirun -f mpd.hosts``
(Makefile:37); the TPU build's analog is ``jax.distributed.initialize`` +
a global mesh spanning all processes' devices.  This test runs TWO separate
Python processes (4 virtual CPU devices each -> 8 global devices), solves the
same tridiagonal problem through the sharded upsweep, and checks eigenvalues
and the in-jit residual on every process.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_ENABLE_X64"] = "1"

import jax
from symmetric_eigenvalue_tpu.dist.mesh import distributed_init, make_mesh

distributed_init(coordinator=f"localhost:{port}", num_processes=2,
                 process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import symmetric_eigenvalue_tpu as se
from symmetric_eigenvalue_tpu.core.tree import build_plan
from symmetric_eigenvalue_tpu.driver import _solve

n = 256
config = se.SolverConfig(leaf_size=8)   # 32 leaves sharded over 8 global devices
plan = build_plan(n, config.leaf_size)
mesh = make_mesh()

def fn(d, e):
    lam, V = _solve(d, e, None, plan, config, want_vectors=True, mesh=mesh)
    # residual computed in-jit: V is sharded across processes, so only a
    # replicated scalar comes home (out-shardings of scalars are replicated)
    Tv = (d[:, None] * V
          + jnp.pad(e[:, None] * V[1:], ((0, 1), (0, 0)))
          + jnp.pad(e[:, None] * V[:-1], ((1, 0), (0, 0))))
    res = jnp.max(jnp.abs(Tv - V * lam[None, :]))
    return lam, res

rng = np.random.default_rng(7)
d = rng.standard_normal(n) * 2
e = rng.standard_normal(n - 1)
# replicated outputs: every process holds the full lam (the compiler would
# otherwise pick a cross-process sharding, which is not host-fetchable)
from jax.sharding import NamedSharding, PartitionSpec as P
rep = NamedSharding(mesh, P())
lam, res = jax.jit(fn, out_shardings=(rep, rep))(jnp.asarray(d), jnp.asarray(e))
lam = np.asarray(lam)
res = float(res)

from symmetric_eigenvalue_tpu.core.tridiag import dense_from_tridiag
wref = np.linalg.eigvalsh(dense_from_tridiag(d, e))
lam_err = np.abs(lam - wref).max()
scale = np.abs(wref).max()
assert lam_err < 1e-12 * scale, f"eigenvalue error {lam_err}"
assert res < 1e-12 * scale, f"residual {res}"
print(f"proc {proc_id}: lam_err {lam_err:.2e} residual {res:.2e} OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    # workers must not inherit the 8-device flag the suite conftest sets
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i}:" in out and "OK" in out, out
