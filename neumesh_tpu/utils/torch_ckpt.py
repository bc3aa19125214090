"""Pure-python reader for torch zip-pickle checkpoints (.pt).

The reference ships pretrained checkpoints saved by torch.save (torch 1.8,
zip format: archive/data.pkl + archive/data/<key> raw storages). This module
loads them into numpy WITHOUT torch, so released NeuS/NeuMesh checkpoints
can be consumed directly (reference utils/checkpoints.py:33-46 saves
{model, optimizer, global_step, epoch_idx}).

If the unpickling hits an unsupported construct, we fall back to torch
(available CPU-only in this environment) when importable.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": np.uint16,  # raw bits; converted on demand
}


class _FakeTensor:
    """Stand-in rebuilt tensor: numpy view with torch stride semantics."""

    def __init__(self, array: np.ndarray):
        self.array = array


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    arr, dtype = storage
    itemsize = np.dtype(dtype).itemsize
    if len(size) == 0:
        return _FakeTensor(arr[storage_offset:storage_offset + 1]
                           .reshape(()).astype(dtype, copy=False))
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides_bytes)
    return _FakeTensor(np.ascontiguousarray(view))


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix
        self._storage_cache: Dict[str, Any] = {}

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {typename}")
        storage_type, key, location, numel = pid[1], pid[2], pid[3], pid[4]
        if key in self._storage_cache:
            return self._storage_cache[key]
        name = storage_type.__name__ if hasattr(storage_type, "__name__") \
            else str(storage_type)
        # torch >= 1.11 uses UntypedStorage + dtype arg pattern; torch 1.8
        # used typed storages
        dtype = _DTYPE_MAP.get(name.replace("torch.", ""), None)
        if dtype is None and hasattr(storage_type, "dtype"):
            dtype = np.dtype(str(storage_type.dtype).replace("torch.", ""))
        if dtype is None:
            dtype = np.uint8
        raw = self.zf.read(f"{self.prefix}/data/{key}")
        arr = np.frombuffer(raw, dtype=dtype)
        self._storage_cache[key] = (arr, dtype)
        return self._storage_cache[key]

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module.startswith("torch") and name.endswith("Storage"):
            return type(name, (), {"__name__": name})
        if module == "collections" and name == "OrderedDict":
            import collections
            return collections.OrderedDict
        if module.startswith("torch"):
            # dtypes and misc torch classes: return inert placeholders
            return type(name, (), {"__name__": name})
        return super().find_class(module, name)


def _unwrap(obj):
    if isinstance(obj, _FakeTensor):
        return obj.array
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_unwrap(v) for v in obj)
    return obj


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pt/.pth zip checkpoint into nested dicts of numpy
    arrays. Non-tensor leaves (ints, strs) pass through."""
    try:
        with zipfile.ZipFile(path) as zf:
            pkl_name = next(n for n in zf.namelist()
                            if n.endswith("data.pkl"))
            prefix = pkl_name[: -len("/data.pkl")]
            with zf.open(pkl_name) as f:
                data = f.read()
            up = _TorchUnpickler(io.BytesIO(data), zf, prefix)
            obj = up.load()
        return _unwrap(obj)
    except (zipfile.BadZipFile, StopIteration, pickle.UnpicklingError,
            AttributeError, KeyError) as e:
        try:
            import torch
            obj = torch.load(path, map_location="cpu", weights_only=False)

            def conv(o):
                if isinstance(o, torch.Tensor):
                    return o.detach().cpu().numpy()
                if isinstance(o, dict):
                    return {k: conv(v) for k, v in o.items()}
                if isinstance(o, (list, tuple)):
                    return type(o)(conv(v) for v in o)
                return o
            return conv(obj)
        except ImportError:
            raise RuntimeError(
                f"failed to read torch checkpoint {path}: {e}") from e


# ---------------------------------------------------------------------------
# torch state-dict -> neumesh_tpu param-tree converters
# ---------------------------------------------------------------------------

def _lin(sd, prefix):
    """Torch Linear/weight-norm-Linear state-dict entry -> our layer params
    (transposed to (in, out))."""
    if prefix + ".weight_v" in sd:
        return {
            "g": np.asarray(sd[prefix + ".weight_g"])[:, 0],
            "v": np.ascontiguousarray(np.asarray(sd[prefix + ".weight_v"]).T),
            "b": np.asarray(sd[prefix + ".bias"]),
        }
    return {
        "w": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T),
        "b": np.asarray(sd[prefix + ".bias"]),
    }


def neus_state_dict_to_params(sd: dict, model) -> dict:
    """Map a reference NeuS state_dict (models/frameworks/neus/neus.py) to a
    neumesh_tpu NeuS param tree."""
    params = {"ln_s": np.asarray(sd["ln_s"]).reshape(1)}
    surf = []
    for l in range(model.implicit_surface.D + 1):
        surf.append(_lin(sd, f"implicit_surface.surface_fc_layers.{l}"))
    params["implicit_surface"] = surf
    rad = []
    for l in range(model.radiance_net.D + 1):
        rad.append(_lin(sd, f"radiance_net.layers.{l}"))
    params["radiance_net"] = rad
    if any(k.startswith("nerf_outside.") for k in sd):
        no = {"pts_linears": [], "views_linears": []}
        i = 0
        while f"nerf_outside.pts_linears.{i}.weight" in sd:
            no["pts_linears"].append(_lin(sd, f"nerf_outside.pts_linears.{i}"))
            i += 1
        no["views_linears"].append(_lin(sd, "nerf_outside.views_linears.0"))
        for name in ("feature_linear", "alpha_linear", "rgb_linear"):
            if f"nerf_outside.{name}.weight" in sd:
                no[name] = _lin(sd, f"nerf_outside.{name}")
        params["nerf_outside"] = no
    return _to_jnp(params)


def neumesh_state_dict_to_params(sd: dict, model) -> dict:
    """Map a reference NeuMesh state_dict (neumesh.py:36-102; nn.Sequential
    nesting gives keys pts_linears.0.*, pts_linears.{i>=2}.0.*) to a
    neumesh_tpu NeuMesh param tree."""
    params = {
        "ln_s": np.asarray(sd["ln_s"]).reshape(1),
        "geometry_features": np.asarray(sd["geometry_features"]),
        "color_features": np.asarray(sd["color_features"]),
        "indicator_vector": np.asarray(sd["indicator_vector"]),
    }
    if "indicator_weight_raw" in sd:
        params["indicator_weight_raw"] = np.asarray(
            sd["indicator_weight_raw"]).reshape(1)

    pts = [_lin(sd, "pts_linears.0")]
    for i in range(1, model.D_density):
        pts.append(_lin(sd, f"pts_linears.{i + 1}.0"))
    params["pts_linears"] = pts
    params["density_linear"] = _lin(sd, "density_linear")

    views = [_lin(sd, "views_linears.0")]
    for i in range(1, model.D_color):
        views.append(_lin(sd, f"views_linears.{i + 1}.0"))
    params["views_linears"] = views
    params["color_linear"] = _lin(sd, "color_linear.0")
    return _to_jnp(params)


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(np.ascontiguousarray(tree), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Export: neumesh_tpu param trees -> reference torch state_dicts / .pt files
# (the exact inverses of the readers above, so released-checkpoint tooling
# and the reference codebase can consume models trained here)
# ---------------------------------------------------------------------------

def _lin_out(sd: dict, prefix: str, p: dict):
    """Our layer params -> torch Linear/weight-norm entries (transposed back
    to (out, in); weight_g regains its (out, 1) column shape)."""
    if "g" in p:
        sd[prefix + ".weight_g"] = np.asarray(p["g"])[:, None]
        sd[prefix + ".weight_v"] = np.ascontiguousarray(
            np.asarray(p["v"]).T)
        sd[prefix + ".bias"] = np.asarray(p["b"])
    else:
        sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        sd[prefix + ".bias"] = np.asarray(p["b"])


def neumesh_params_to_state_dict(params: dict, model) -> dict:
    """Inverse of neumesh_state_dict_to_params (reference key layout incl.
    the nn.Sequential nesting pts_linears.{i>=2}.0.*)."""
    sd = {
        "ln_s": np.asarray(params["ln_s"]).reshape(1),
        "geometry_features": np.asarray(params["geometry_features"]),
        "color_features": np.asarray(params["color_features"]),
        "indicator_vector": np.asarray(params["indicator_vector"]),
    }
    if "indicator_weight_raw" in params:
        sd["indicator_weight_raw"] = np.asarray(
            params["indicator_weight_raw"]).reshape(1)
    _lin_out(sd, "pts_linears.0", params["pts_linears"][0])
    for i in range(1, model.D_density):
        _lin_out(sd, f"pts_linears.{i + 1}.0", params["pts_linears"][i])
    _lin_out(sd, "density_linear", params["density_linear"])
    _lin_out(sd, "views_linears.0", params["views_linears"][0])
    for i in range(1, model.D_color):
        _lin_out(sd, f"views_linears.{i + 1}.0", params["views_linears"][i])
    _lin_out(sd, "color_linear.0", params["color_linear"])
    return sd


def neus_params_to_state_dict(params: dict, model) -> dict:
    """Inverse of neus_state_dict_to_params."""
    sd = {"ln_s": np.asarray(params["ln_s"]).reshape(1)}
    for l, p in enumerate(params["implicit_surface"]):
        _lin_out(sd, f"implicit_surface.surface_fc_layers.{l}", p)
    for l, p in enumerate(params["radiance_net"]):
        _lin_out(sd, f"radiance_net.layers.{l}", p)
    if "nerf_outside" in params:
        no = params["nerf_outside"]
        for i, p in enumerate(no["pts_linears"]):
            _lin_out(sd, f"nerf_outside.pts_linears.{i}", p)
        _lin_out(sd, "nerf_outside.views_linears.0", no["views_linears"][0])
        for name in ("feature_linear", "alpha_linear", "rgb_linear"):
            if name in no:
                _lin_out(sd, f"nerf_outside.{name}", no[name])
    return sd


def save_torch_checkpoint(path: str, params: dict, model,
                          global_step: int = 0, epoch_idx: int = 0):
    """Write a reference-format .pt checkpoint
    ({model: state_dict, global_step, epoch_idx}; reference
    utils/checkpoints.py:33-46) loadable by torch.load. Uses the torch
    runtime (CPU) for the zip-pickle container."""
    import torch

    if "geometry_features" in params:
        sd = neumesh_params_to_state_dict(params, model)
    else:
        sd = neus_params_to_state_dict(params, model)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
            sd.items()}
    torch.save({"model": sd_t, "global_step": int(global_step),
                "epoch_idx": int(epoch_idx)}, path)
    return path
