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
BATCH_AXIS = "batch"


def get_device_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_global_mesh() -> Mesh:
    """2-D ('batch', 'data') mesh for (multi-host) data-parallel training:
    axis 0 = one row per PROCESS (the reference's DDP rank axis,
    train.py:244-252 — images shard across it), axis 1 = the process's
    local devices (the nn.DataParallel ray axis, models/trainer.py:39-42).

    Device order is (process_index, id)-sorted so every process constructs
    the identical mesh and row p holds exactly process p's local devices —
    the layout `jax.make_array_from_process_local_data` needs for a
    batch-axis-sharded global array (see make_global_batch). Single
    process: shape (1, n_local_devices)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    n_local = len(devs) // n_proc
    arr = np.asarray(devs).reshape(n_proc, n_local)
    return Mesh(arr, (BATCH_AXIS, DATA_AXIS))


def make_global_batch(mesh: Mesh, tree):
    """Assemble per-process local batches into ONE global jax.Array per
    leaf, sharded along axis 0 over the 'batch' (process) mesh axis and
    replicated over the per-process 'data' axis.

    This is the multi-host-sound replacement for feeding process-local
    `jnp.asarray` inputs into a global-mesh jitted step (undefined under
    real multi-host JAX): the global batch axis is process_count x
    local_batch, each process contributing its own images — the
    reference's DistributedSampler semantics (train.py:244-252). On a
    single process this is a plain device_put with the same sharding."""
    sharding = NamedSharding(mesh, P(BATCH_AXIS))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully-replicated placement for params/buffers."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def ray_sharder(mesh: Optional[Mesh], batched: bool = True):
    """Returns a constraint fn applied to per-ray arrays inside the jitted
    step. Ray axis is axis 1 for batched (B, N_rays, ...) arrays, axis 0
    otherwise. On a 2-D ('batch', 'data') global mesh (get_global_mesh)
    the batch axis is additionally pinned to the process axis, so the
    per-image ray pipeline runs on the owning process's devices and GSPMD
    inserts cross-process psums only at the loss reductions (the
    reference's DDP grad all-reduce, train.py:326-332). None mesh ->
    identity (single device)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return lambda x: x
    has_batch_axis = BATCH_AXIS in mesh.axis_names

    def constrain(x):
        ray_axis = 1 if batched else 0
        if x.ndim <= ray_axis:
            return x
        spec = [None] * x.ndim
        spec[ray_axis] = DATA_AXIS
        if has_batch_axis and batched:
            spec[0] = BATCH_AXIS
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return constrain


def shard_rays(mesh: Optional[Mesh], rays_o, rays_d, batched: bool = True):
    f = ray_sharder(mesh, batched)
    return f(rays_o), f(rays_d)


def sharded_surface_render(model, params, rays_o, rays_d,
                           mesh: Optional[Mesh] = None,
                           force_shard_map: bool = False,
                           **surface_kwargs):
    """Multi-chip surface rendering: shard_map over the ray axis.

    The headline serving path (ray_casting.surface_render with tiled
    contexts + fused Pallas kernels) is embarrassingly parallel per ray
    tile, but `pallas_call` programs do not partition under GSPMD sharding
    constraints — so unlike the volume path (which shards with a
    with_sharding_constraint inside one jitted program, ray_sharder), the
    surface path is explicitly mapped: each device runs the full
    single-chip render program on its contiguous ray shard, params and the
    mesh-scaffold tables replicated, no collectives (the moral analog of
    the reference's nn.DataParallel(dim=1) ray scatter,
    reference models/trainer.py:39-42).

    rays_o/rays_d: (R, 3) with R divisible by the mesh size (and each
    shard divisible by `ray_tile` when tiling — callers pad, see
    render.py). Returns exactly what surface_render returns, with every
    output sharded along its leading ray axis.
    """
    from ..render.ray_casting import surface_render

    # force_shard_map=True runs the explicit shard_map even on a 1-device
    # mesh — bench.py measures the shard path's overhead (padding,
    # dispatch) against the direct program on one chip (VERDICT r3 #6)
    if mesh is None or (int(np.prod(mesh.devices.shape)) == 1
                        and not force_shard_map):
        return surface_render(model, params, rays_o, rays_d,
                              **surface_kwargs)
    n_dev = int(np.prod(mesh.devices.shape))
    if rays_o.shape[0] % n_dev:
        raise ValueError(
            f"ray count {rays_o.shape[0]} not divisible by mesh size "
            f"{n_dev}; pad the ray batch (render.py pads chunks)")

    def local_render(p, o, d):
        return surface_render(model, p, o, d, **surface_kwargs)

    return jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        # the body closes over mesh-grid tables and runs pallas_call;
        # varying-manual-axes inference has no rules for those
        check_vma=False,
    )(params, rays_o, rays_d)


def sharded_volume_render(model, params, rays_o, rays_d, key=None,
                          mesh: Optional[Mesh] = None,
                          force_shard_map: bool = False,
                          **volume_kwargs):
    """Multi-chip VOLUME rendering: shard_map over the ray axis.

    The volume serving path (root-anchored sampling + fused Pallas
    density/color kernels, render/volume.py::volume_render_rays) is
    per-ray independent like the surface path, and its pallas_call
    programs likewise do not partition under GSPMD constraints — so it is
    explicitly mapped: each device runs the full single-chip volume
    program on its contiguous ray shard, params and mesh-scaffold tables
    replicated, no collectives (the reference scatters ANY render over
    devices via nn.DataParallel(dim=1) wrapping the renderer,
    reference models/trainer.py:39-42; VERDICT r4 #2 — the pure-XLA
    route keeps ray_sharder + with_sharding_constraint instead).

    rays_o/rays_d: (R, 3) with R divisible by the mesh size and each
    shard divisible by `ray_tile` when tiling (callers pad; render.py
    pads chunks). The same `key` is broadcast to every shard — serving
    runs perturb=False, so placement is deterministic and key-independent.
    Returns volume_render_rays' output dict with every leaf sharded
    along its leading ray axis."""
    from ..render.volume import volume_render_rays

    if mesh is None or (int(np.prod(mesh.devices.shape)) == 1
                        and not force_shard_map):
        return volume_render_rays(model, params, rays_o, rays_d, key,
                                  **volume_kwargs)
    n_dev = int(np.prod(mesh.devices.shape))
    if rays_o.shape[0] % n_dev:
        raise ValueError(
            f"ray count {rays_o.shape[0]} not divisible by mesh size "
            f"{n_dev}; pad the ray batch (render.py pads chunks)")
    if key is None:
        key = jax.random.PRNGKey(0)

    def local_render(p, o, d, k):
        return volume_render_rays(model, p, o, d, k, **volume_kwargs)

    return jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(params, rays_o, rays_d, key)
