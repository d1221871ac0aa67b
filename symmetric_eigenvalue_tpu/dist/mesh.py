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
    return jax.make_mesh((len(devs),), (AXIS,),
                         axis_types=(jax.sharding.AxisType.Auto,),
                         devices=devs)


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


def batch_mapped(vfn, mesh: Optional[Mesh], batch: int):
    """Run a vmapped, collective-free kernel sharded over its leading batch axis.

    When the batch divides the mesh, wrap in shard_map (explicit SPMD: each
    device runs the kernel on its local slice — the TPU analog of the
    reference's 'every rank works on its own merges', main.c:495-664).  When it
    doesn't, run fully replicated under shard_map (every device computes the
    whole level — matching the reference's non-owner ranks at the top of the
    tree, eigenvalues.c:63-66).  Keeping even the replicated case inside
    shard_map is deliberate: the GSPMD partitioner must never see the scatter /
    scan / custom-call internals of these kernels (observed value-corrupting
    partitionings on CPU otherwise).
    """
    if mesh is None:
        return vfn
    ndev = mesh.devices.size
    if batch % ndev == 0 and batch >= ndev:
        spec = P(AXIS)
    else:
        spec = P()
    # check_vma off: kernels are collective-free, and constants created inside
    # scan carries would otherwise trip the varying-axis checker.
    return jax.shard_map(vfn, mesh=mesh, in_specs=spec, out_specs=spec,
                         check_vma=False)


def last_axis_sharded(fn, mesh: Mesh, in_ndims, out_ndim: int):
    """shard_map ``fn`` with each positional arg's *last* axis sharded over the
    mesh (None in ``in_ndims`` = replicated arg), used for the column-sharded
    downsweep: the eigenvector block's columns live one shard per device, so
    every level's U application is embarrassingly parallel with zero
    collectives — the TPU answer to the reference's row-at-a-time
    backtransformation pipeline."""

    def spec(nd):
        if nd is None:
            return P()
        return P(*([None] * (nd - 1) + [AXIS]))

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=tuple(spec(nd) for nd in in_ndims),
                         out_specs=spec(out_ndim), check_vma=False)


def replicated(fn, mesh: Optional[Mesh]):
    """Run ``fn`` fully replicated under shard_map (identical on all devices)."""
    if mesh is None:
        return fn
    return jax.shard_map(fn, mesh=mesh, in_specs=P(), out_specs=P(),
                         check_vma=False)
