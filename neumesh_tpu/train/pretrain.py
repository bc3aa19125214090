"""SIREN-SDF sphere pretraining hook (reference models/base.py:259-267,
314-350): before main training, fit a SIREN implicit surface to an analytic
sphere so the geometric init assumption holds."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..utils.print_fn import log


def maybe_pretrain_siren(args, model, params, logger=None):
    surface = getattr(model, "implicit_surface", None)
    if surface is None or not getattr(surface, "use_siren", False):
        return params
    if not getattr(surface, "geometric_init", True):
        return params

    num_iters = int(args.training.get("pretrain_num_iters", 5000))
    lr = float(args.training.get("pretrain_lr", 1.0e-4))
    batch_points = int(args.training.get("pretrain_batch_points", 5000))
    target_radius = surface.radius_init
    bound = surface.obj_bounding_size

    log.info(f"=> pretraining SIREN sdf to sphere r={target_radius} "
             f"({num_iters} iters)")

    opt = optax.adam(lr)
    sub = params["implicit_surface"]
    opt_state = opt.init(sub)

    def loss_fn(p, pts):
        sdf_gt = jnp.linalg.norm(pts, axis=-1) - target_radius
        sdf_pred = surface.forward(p, pts)
        return jnp.mean(jnp.abs(sdf_pred - sdf_gt))

    @jax.jit
    def step(p, s, key):
        pts = jax.random.uniform(
            key, (batch_points, 3), minval=-bound, maxval=bound)
        l, g = jax.value_and_grad(loss_fn)(p, pts)
        updates, s = opt.update(g, s)
        p = optax.apply_updates(p, updates)
        return p, s, l

    key = jax.random.PRNGKey(31)
    for i in range(num_iters):
        key, k = jax.random.split(key)
        sub, opt_state, l = step(sub, opt_state, k)
        if logger is not None and i % 100 == 0:
            logger.add("pretrain_siren", "loss_l1", float(l), i)
    log.info(f"=> SIREN pretraining done, final l1 {float(l):.4f}")
    params = dict(params)
    params["implicit_surface"] = sub
    return params
