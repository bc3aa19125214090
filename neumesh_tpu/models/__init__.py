"""Framework registry (reference models/frameworks/__init__.py).

``build_framework(args, name)`` ->
    (model, params, trainer, render_kwargs_train, render_kwargs_test, render_fn)
"""
from __future__ import annotations


def build_framework(args, name: str, key=None):
    if name.lower() == "neus":
        from .neus import get_model
    elif name.lower() == "neumesh":
        from .neumesh import get_model
    else:
        raise RuntimeError(f"Please specify a valid framework name: {name}")
    return get_model(args, key=key)
