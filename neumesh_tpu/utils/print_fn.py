"""Colored, rank-aware stdout logging (reference utils/print_fn.py).

Master-process filtering uses jax.process_index() instead of torch.distributed
rank; the format embeds the process index like the reference embeds rank.
"""
from __future__ import annotations

import logging
import sys

_COLORS = {
    "WARNING": "\033[33m",
    "INFO": "\033[32m",
    "DEBUG": "\033[36m",
    "CRITICAL": "\033[35m",
    "ERROR": "\033[31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelname)
        if color and sys.stdout.isatty():
            return f"{color}{msg}{_RESET}"
        return msg


class _MasterFilter(logging.Filter):
    def __init__(self, process_index_fn):
        super().__init__()
        self.process_index_fn = process_index_fn

    def filter(self, record):
        if getattr(record, "all_ranks", False):
            return True
        return self.process_index_fn() == 0


def _process_index() -> int:
    # lazy on purpose: jax.process_index() INITIALISES the XLA backend,
    # and doing that at import time (or before jax.distributed.initialize)
    # breaks multi-process bootstrap. Only query once something logs.
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


class _RankInjector(logging.Filter):
    def filter(self, record):
        record.procidx = _process_index()
        return True


log = logging.getLogger("neumesh_tpu")


def init_log(level=logging.INFO, master_only: bool = True):
    if log.handlers:
        return log
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(_ColorFormatter(
        "%(asctime)s [proc %(procidx)s] %(levelname)s %(message)s",
        datefmt="%H:%M:%S"))
    handler.addFilter(_RankInjector())
    if master_only:
        handler.addFilter(_MasterFilter(_process_index))
    log.addHandler(handler)
    log.setLevel(level)
    log.propagate = False
    return log


init_log()
