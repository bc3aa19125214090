"""Device mesh + ray-axis sharding.

The reference's parallelism (DDP over images, nn.DataParallel over the ray
dim; SURVEY §2.3) maps to ONE mechanism here: a 1-D ``jax.sharding.Mesh``
over all chips with the per-ray pipeline sharded along the ray axis. Inside
a single jitted train/render step we place a sharding constraint on the
generated rays; GSPMD then partitions the entire per-ray program (sampling,
kNN, MLPs, compositing) across devices and inserts psums only at the loss
reductions — the moral analog of sequence/context parallelism for this
workload (SURVEY §5 long-context note).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_device_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh: Mesh, tree):
    """Fully-replicated placement for params/buffers."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def ray_sharder(mesh: Optional[Mesh], batched: bool = True):
    """Returns a constraint fn applied to per-ray arrays inside the jitted
    step. Ray axis is axis 1 for batched (B, N_rays, ...) arrays, axis 0
    otherwise. None mesh -> identity (single device)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return lambda x: x

    def constrain(x):
        ray_axis = 1 if batched else 0
        if x.ndim <= ray_axis:
            return x
        spec = [None] * x.ndim
        spec[ray_axis] = DATA_AXIS
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return constrain


def shard_rays(mesh: Optional[Mesh], rays_o, rays_d, batched: bool = True):
    f = ray_sharder(mesh, batched)
    return f(rays_o), f(rays_d)
