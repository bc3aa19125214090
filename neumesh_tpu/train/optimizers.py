"""Optimizer & LR-schedule factories (reference models/base.py:578-687).

optax re-design: a single Adam transform whose per-leaf learning rate is the
product of (a) a per-parameter-group base lr — the reference's lr-dict keyed
by top-level parameter/module name (models/base.py:582-612) — and (b) a
global schedule factor (warmup-cosine / exponential / multistep,
models/base.py:618-687). The schedule is a jnp-traceable function of the
global step, so the whole update sits inside the jitted train step.
"""
from __future__ import annotations

import numbers
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_factor(total_steps: int, warmup_steps: int,
                         min_factor: float = 0.1) -> Callable:
    """reference models/base.py:618-634 (NeuS schedule)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        cos = (jnp.cos(jnp.pi * (step - warmup_steps)
                       / (total_steps - warmup_steps)) + 1.0) \
            * 0.5 * (1 - min_factor) + min_factor
        return jnp.where(step < warmup_steps, warm, cos)
    return fn


def exponential_factor(total_steps: int, min_factor: float = 0.1) -> Callable:
    """reference models/base.py:637-645."""
    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
        return jnp.exp(t * jnp.log(min_factor))
    return fn


def multistep_factor(milestones, gamma: float) -> Callable:
    """torch MultiStepLR semantics (reference models/base.py:650-656)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def fn(step):
        n_passed = jnp.sum(jnp.asarray(step, jnp.float32) >= ms)
        return gamma ** n_passed
    return fn


def get_schedule_factor(args) -> Callable:
    stype = args.training.scheduler.type
    if stype == "warmupcosine":
        return warmup_cosine_factor(
            total_steps=args.training.num_iters,
            warmup_steps=args.training.scheduler.warmup_steps,
            min_factor=args.training.scheduler.setdefault("min_factor", 0.1))
    if stype == "exponential_step":
        return exponential_factor(
            total_steps=args.training.num_iters,
            min_factor=args.training.scheduler.setdefault("min_factor", 0.1))
    if stype == "multistep":
        return multistep_factor(
            args.training.scheduler.milestones, args.training.scheduler.gamma)
    raise NotImplementedError(f"unknown scheduler type: {stype}")


def _lr_tree(params, lr_cfg):
    """Per-leaf base lr from the reference's lr-dict convention: keys select
    top-level entries of the param pytree; 'default' covers the rest."""
    if isinstance(lr_cfg, numbers.Number):
        return jax.tree.map(lambda _: float(lr_cfg), params)
    lr_dict = dict(lr_cfg)
    default_lr = float(lr_dict.pop("default"))
    for k in lr_dict:
        if k not in params:
            raise RuntimeError(f"wrong lr key: {k}")
    out = {}
    for name, sub in params.items():
        lr = float(lr_dict.get(name, default_lr))
        out[name] = jax.tree.map(lambda _: lr, sub)
    return out


def get_optimizer(args, params,
                  step_scale: int = 1) -> optax.GradientTransformation:
    """Adam with per-group lr x schedule factor. Matches torch.optim.Adam
    defaults (betas=(0.9, 0.999), eps=1e-8) as used in reference
    models/base.py:580,612.

    step_scale: multiplier mapping the optimizer's internal update count
    to the GLOBAL iteration the schedule is evaluated at — world_size
    under multi-process data parallelism, where each update advances the
    global counter by world_size (the reference steps its scheduler on
    the global it, train.py:196,442)."""
    lr_cfg = args.training.lr
    factor_fn = get_schedule_factor(args)
    lr_tree = _lr_tree(params, lr_cfg)

    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    def scale_update(updates, state, params=None):
        del params
        step = state
        f = factor_fn(step * step_scale)
        updates = jax.tree.map(
            lambda u, lr: -u * lr * f, updates, lr_tree)
        return updates, step + 1

    scaler = optax.GradientTransformation(
        lambda params: jnp.zeros((), jnp.int32), scale_update)
    return optax.chain(adam, scaler)


def current_lr(args, step) -> float:
    """Scalar default-group lr at `step` (for logging)."""
    lr_cfg = args.training.lr
    base = lr_cfg if isinstance(lr_cfg, numbers.Number) else lr_cfg["default"]
    return float(base) * float(get_schedule_factor(args)(step))
