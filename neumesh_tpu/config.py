"""Config/flag system (reference utils/io_util.py:212-382 equivalent).

- ``ConfigDict``: attribute-style nested dict that RAISES on missing keys
  (the reference's addict ``ForceKeyErrorDict`` semantics,
  utils/io_util.py:212-214) while still supporting ``setdefault`` so builder
  defaults double as schema (e.g. models/frameworks/neumesh/__init__.py:19-45).
- YAML load/save with nested-dict conversion.
- CLI override syntax ``--section:key value`` (and ``--key value``), values
  type-coerced against the existing config value (utils/io_util.py:266-289).
- ``load_config`` merge precedence: CLI > --config yaml > defaults; and
  ``--resume_dir`` reloads the experiment's saved config.yaml
  (utils/io_util.py:302-360).
"""
from __future__ import annotations

import argparse
import os
import shutil
from typing import Any, Optional

import yaml


class ConfigDict(dict):
    """Nested dict with attribute access; missing keys raise KeyError."""

    def __init__(self, d: Optional[dict] = None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = _wrap(v)
        for k, v in kwargs.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise KeyError(f"missing config key: {name!r}") from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, _wrap(value))

    def __delattr__(self, name: str) -> None:
        del self[name]

    def setdefault(self, key, default=None):
        if key not in self:
            self[key] = default
        return self[key]

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return _wrap(default)

    def to_dict(self) -> dict:
        return _unwrap(self)

    def copy(self) -> "ConfigDict":
        return ConfigDict(self.to_dict())


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, ConfigDict):
        return ConfigDict(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def _unwrap(v):
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


def load_yaml(path: str, default_path: Optional[str] = None) -> ConfigDict:
    with open(path, "r", encoding="utf8") as f:
        config = ConfigDict(yaml.safe_load(f) or {})
    if default_path is not None and path != default_path:
        with open(default_path, "r", encoding="utf8") as f:
            default = ConfigDict(yaml.safe_load(f) or {})
        _merge_into(default, config)
        return default
    return config


def save_yaml(config, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf8") as f:
        yaml.safe_dump(_unwrap(config), f, default_flow_style=False)


def _merge_into(dst: ConfigDict, src: dict) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _merge_into(dst[k], v)
        else:
            dst[k] = v


def _coerce(new_str: str, old_value: Any) -> Any:
    """Coerce a CLI string to the type of the existing config value."""
    if isinstance(old_value, bool):
        return new_str.lower() in ("1", "true", "yes", "on")
    if isinstance(old_value, int) and not isinstance(old_value, bool):
        return int(new_str)
    if isinstance(old_value, float):
        return float(new_str)
    if isinstance(old_value, (list, tuple)):
        return yaml.safe_load(new_str)
    if old_value is None:
        # unknown target type: let YAML guess (int/float/bool/str/null)
        return yaml.safe_load(new_str)
    return new_str


def update_config(config: ConfigDict, unknown: list) -> ConfigDict:
    """Apply ``--section:key value`` / ``--key value`` overrides in place."""
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--"):
            i += 1
            continue
        if "=" in tok:
            keypath, val = tok[2:].split("=", 1)
            i += 1
        else:
            keypath = tok[2:]
            if i + 1 >= len(unknown):
                raise ValueError(f"missing value for override {tok}")
            val = unknown[i + 1]
            i += 2
        keys = keypath.split(":")
        node = config
        for k in keys[:-1]:
            if k not in node:
                node[k] = ConfigDict()
            node = node[k]
        old = node[keys[-1]] if keys[-1] in node else None
        node[keys[-1]] = _coerce(val, old)
    return config


def create_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config", type=str, default=None, help="config yaml")
    parser.add_argument(
        "--resume_dir", type=str, default=None,
        help="experiment dir to resume from (reloads its config.yaml)")
    return parser


def load_config(args, unknown: Optional[list] = None,
                base_config_path: Optional[str] = None) -> ConfigDict:
    """CLI > --config yaml > base defaults; or resume from saved config."""
    unknown = unknown or []
    if getattr(args, "resume_dir", None) is not None:
        assert getattr(args, "config", None) is None, (
            "given --resume_dir, do not set --config")
        config = load_yaml(os.path.join(args.resume_dir, "config.yaml"))
        config.training.exp_dir = args.resume_dir
    else:
        assert getattr(args, "config", None) is not None, "--config is required"
        config = load_yaml(args.config, default_path=base_config_path)

    update_config(config, unknown)

    # copy plain argparse entries into the config (CLI wins)
    for k, v in vars(args).items():
        if k in ("config", "resume_dir"):
            continue
        if v is not None or k not in config:
            config[k] = v

    config.setdefault("device_ids", [0])
    config.setdefault("ddp", False)
    return config


def backup_sources(backup_dir: str, source_root: str = ".") -> None:
    """Snapshot .py/.yaml sources into the experiment dir
    (reference utils/io_util.py:78-121)."""
    os.makedirs(backup_dir, exist_ok=True)
    for dirpath, dirnames, filenames in os.walk(source_root):
        dirnames[:] = [
            d for d in dirnames
            if d not in (".git", "__pycache__", "logs", "out", "data",
                         ".pytest_cache", "node_modules")
        ]
        for fn in filenames:
            if fn.endswith((".py", ".yaml", ".json")):
                src = os.path.join(dirpath, fn)
                rel = os.path.relpath(src, source_root)
                dst = os.path.join(backup_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    shutil.copy2(src, dst)
                except OSError:
                    pass
