"""Training logger (reference utils/logger.py): stats dict pickled per
process + optional TensorBoard scalars/images + per-iteration image dumps.

TensorBoard is optional (torch.utils.tensorboard when importable); the stats
pickle `stats.p_<proc>` keeps the reference's offline-plotting format
{category: {key: [(it, val), ...]}} (utils/logger.py:153-169).
"""
from __future__ import annotations

import os
import pickle
from collections import defaultdict

import numpy as np

from .print_fn import log


def _proc_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


class Logger:
    def __init__(self, log_dir: str, img_dir: str = None,
                 monitoring: str = "none", monitoring_dir: str = None,
                 rank: int = None, is_master: bool = None):
        self.rank = _proc_index() if rank is None else rank
        self.is_master = (self.rank == 0) if is_master is None else is_master
        self.log_dir = log_dir
        self.img_dir = img_dir or os.path.join(log_dir, "imgs")
        self.stats = defaultdict(lambda: defaultdict(list))
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.img_dir, exist_ok=True)

        self.tb = None
        if monitoring == "tensorboard" and self.is_master:
            try:
                from torch.utils.tensorboard import SummaryWriter
                tb_dir = monitoring_dir or os.path.join(log_dir, "events")
                self.tb = SummaryWriter(tb_dir)
            except Exception as e:  # pragma: no cover
                log.warning(f"tensorboard unavailable: {e}")

    # ------------------------------------------------------------------
    def add(self, category: str, k: str, v, it: int):
        v = float(np.asarray(v))
        self.stats[category][k].append((it, v))
        if self.tb is not None:
            self.tb.add_scalar(f"{category}/{k}", v, it)

    def add_vector(self, category: str, k: str, vec, it: int):
        vec = np.asarray(vec)
        self.add(category, f"{k}_mean", vec.mean(), it)
        self.add(category, f"{k}_min", vec.min(), it)
        self.add(category, f"{k}_max", vec.max(), it)
        self.add(category, f"{k}_norm", np.linalg.norm(vec), it)

    def add_imgs(self, imgs, class_name: str, it: int):
        """imgs: (H, W, 3) float [0,1] or uint8."""
        outdir = os.path.join(self.img_dir, class_name)
        os.makedirs(outdir, exist_ok=True)
        arr = np.asarray(imgs)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        import imageio.v2 as imageio
        path = os.path.join(outdir, f"{it:08d}_{self.rank}.png")
        imageio.imwrite(path, arr)
        if self.tb is not None:
            self.tb.add_image(class_name, arr, it, dataformats="HWC")

    # ------------------------------------------------------------------
    def save_stats(self, filename: str = None):
        filename = filename or f"stats.p_{self.rank}"
        with open(os.path.join(self.log_dir, filename), "wb") as f:
            pickle.dump({k: dict(v) for k, v in self.stats.items()}, f)

    def load_stats(self, path: str):
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            loaded = pickle.load(f)
        for cat, kv in loaded.items():
            for k, v in kv.items():
                self.stats[cat][k] = list(v)
        return True

    def flush(self):
        if self.tb is not None:
            self.tb.flush()
        self.save_stats()
