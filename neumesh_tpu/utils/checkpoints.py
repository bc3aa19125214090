"""Checkpoint store (reference utils/checkpoints.py equivalent).

Native format: msgpack (flax.serialization) of a dict
{"model": params, "optimizer": opt_state, "global_step": int,
 "epoch_idx": int} — the same payload layout as the reference's torch.save
(utils/checkpoints.py:33-46). File naming and ordering semantics preserved:
latest.ckpt (rolling), {it:08d}.ckpt (backups), final_{it:08d}.ckpt;
`sorted_ckpts` orders backups first, then latest, then final
(utils/checkpoints.py:149-169). Reference `.pt` checkpoints are read via
utils/torch_ckpt.py.

Load-time key filtering (ckpt_ignore_keys / ckpt_only_use_keys,
utils/checkpoints.py:59-113) operates on top-level model param keys.
"""
from __future__ import annotations

import os
import re
from typing import Iterable, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # to_state_dict converts tuples/namedtuples (e.g. optax states) into
    # msgpack-able nested dicts
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy_tree(payload)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load either a native .ckpt (msgpack) or a torch .pt zip checkpoint."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zip -> torch format
        from .torch_ckpt import load_torch_checkpoint
        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, loaded):
    """Restore `loaded` (dict-of-lists may have been msgpack'ed into
    dict-of-dicts with stringified int keys) into the structure of
    `template`."""
    if isinstance(template, dict):
        return {k: restore_into(template[k], loaded[k]) for k in template}
    if isinstance(template, list) or (isinstance(template, tuple)
                                      and not hasattr(template, "_fields")):
        if isinstance(loaded, dict):
            items = [loaded[str(i)] for i in range(len(template))]
        else:
            items = list(loaded)
        restored = [restore_into(t, l) for t, l in zip(template, items)]
        return restored if isinstance(template, list) else tuple(restored)
    if hasattr(template, "_fields") or not hasattr(template, "shape"):
        # namedtuples (optax states) and other structured leaves
        return serialization.from_state_dict(template, loaded)
    import jax.numpy as jnp
    arr = jnp.asarray(loaded)
    assert arr.shape == tuple(template.shape), (
        f"shape mismatch restoring checkpoint: {arr.shape} vs "
        f"{template.shape}")
    return arr.astype(template.dtype)


def sorted_ckpts(ckpt_dir: str) -> list:
    """Order: numbered backups ascending, then latest, then final_*
    (reference utils/checkpoints.py:149-169)."""
    if not os.path.isdir(ckpt_dir):
        return []
    names = [n for n in os.listdir(ckpt_dir)
             if n.endswith((".ckpt", ".pt"))]
    numbered, latest, final = [], [], []
    for n in names:
        stem = os.path.splitext(n)[0]
        if stem.startswith("final_"):
            final.append(n)
        elif stem == "latest":
            latest.append(n)
        elif re.fullmatch(r"\d+", stem):
            numbered.append(n)
        else:
            numbered.append(n)
    numbered.sort()
    final.sort()
    return [os.path.join(ckpt_dir, n) for n in numbered + latest + final]


class CheckpointIO:
    """Registry-based checkpoint manager (reference utils/checkpoints.py:20-146)."""

    def __init__(self, checkpoint_dir: str = "./chkpts"):
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def save(self, filename: str, **payload) -> str:
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        save_checkpoint(filename, payload)
        return filename

    def load_file(
        self,
        filepath: str,
        model_template=None,
        ignore_keys: Optional[Iterable[str]] = None,
        only_use_keys: Optional[Iterable[str]] = None,
    ) -> dict:
        """Load a checkpoint; if model_template is given, the 'model' entry
        is restored into its structure with optional top-level key
        filtering (filtered keys keep the template's values)."""
        if not os.path.isabs(filepath) and not os.path.exists(filepath):
            cand = os.path.join(self.checkpoint_dir, filepath)
            if os.path.exists(cand):
                filepath = cand
        ckpt = load_checkpoint(filepath)
        if model_template is not None and "model" in ckpt:
            loaded = ckpt["model"]
            if ignore_keys or only_use_keys:
                assert not (ignore_keys and only_use_keys), (
                    "ckpt_ignore_keys and ckpt_only_use_keys are exclusive")
                kept = {}
                for k in model_template:
                    use = (k in only_use_keys) if only_use_keys \
                        else (k not in (ignore_keys or ()))
                    kept[k] = loaded[k] if (use and k in loaded) \
                        else model_template[k]
                loaded = kept
            ckpt["model"] = restore_into(model_template, loaded)
        return ckpt

    def latest_path(self) -> Optional[str]:
        ckpts = sorted_ckpts(self.checkpoint_dir)
        return ckpts[-1] if ckpts else None
