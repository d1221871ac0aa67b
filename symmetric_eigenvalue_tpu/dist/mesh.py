"""Device mesh construction and sharding helpers.

The reference's communication layer is tag-based point-to-point Intel MPI threaded
through an ``MPIHandle`` (helper.h:92-97; protocol inventory in SURVEY.md §2).
The TPU build replaces the whole protocol with data sharding over a 1-D
``jax.sharding.Mesh``: per-level merge batches are sharded over devices while the
batch is wide, and the downsweep's eigenvector block is sharded over columns, so
XLA inserts the (few) collectives and everything rides ICI.

``make_mesh`` is the analog of the MPI bootstrap (main.c:23-36);
``distributed_init`` is the multi-host hook (jax.distributed) for DCN-connected
slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "dev"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return jax.make_mesh((len(devs),), (AXIS,), devices=devs)


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (analog of MPI_Init; see Makefile:37 / mpd.hosts)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard(x, mesh: Optional[Mesh], axis: Optional[int]):
    """Constrain ``x`` to be sharded over mesh axis 0 along array axis ``axis``
    (None = replicated).  No-op without a mesh or when the dim doesn't divide.
    """
    if mesh is None:
        return x
    if axis is None:
        spec = P()
    else:
        ndev = mesh.devices.size
        if x.shape[axis] % ndev != 0:
            return x
        parts = [None] * x.ndim
        parts[axis] = AXIS
        spec = P(*parts)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
