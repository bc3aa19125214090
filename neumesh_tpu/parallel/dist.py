"""Multi-host / multi-process runtime glue.

TPU-native replacement for reference utils/dist_util.py: NCCL process groups
and SLURM bootstrapping become ``jax.distributed.initialize`` (ICI within a
slice, DCN across slices — collectives are emitted by the partitioner, not a
hand-written comm layer; SURVEY §2.3). The reference's rank helpers map to
jax.process_index()/process_count().
"""
from __future__ import annotations

import os

from ..utils.print_fn import log

_initialized = False


def init_env(args=None, seed: int = 42):
    """Initialise the distributed runtime when running multi-host, and seed
    host-side RNGs (reference utils/dist_util.py:14-46 seeds globally after
    process-group init)."""
    global _initialized
    import numpy as np

    multi_host = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"))
    if multi_host and not _initialized:
        import jax
        jax.distributed.initialize()
        _initialized = True
        log.info(f"jax.distributed initialised: process "
                 f"{jax.process_index()}/{jax.process_count()}")
    np.random.seed(seed)
    return seed


def process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    try:
        import jax
        return jax.process_count()
    except Exception:
        return 1


def is_master() -> bool:
    return process_index() == 0


def local_device_count() -> int:
    import jax
    return jax.local_device_count()


def global_device_count() -> int:
    import jax
    return jax.device_count()
