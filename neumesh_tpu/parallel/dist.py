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


def first_slurm_node(node_list: str) -> str:
    """First hostname of a SLURM_NODELIST compact spec.

    Handles 'host1', 'host1,host2', bracket ranges like
    'cluster-[003-010,012]' / 'node[1,5-7]', and mixed lists like
    'nodeA,nodeB[01-05]' — the list is split on commas OUTSIDE brackets
    first, then the first element's bracket range is expanded (reference
    utils/dist_util.py:53-66 does the same truncation with string
    slicing; here the first node's name is reconstructed properly
    instead of assuming a site-specific hostname layout)."""
    node_list = node_list.strip()
    # first element of the comma list, ignoring commas inside [...]
    depth = 0
    first_spec = []
    for ch in node_list:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            break
        first_spec.append(ch)
    spec = "".join(first_spec)
    if "[" not in spec:
        return spec
    head, rest = spec.split("[", 1)
    body, _, suffix = rest.partition("]")
    first = body.split(",")[0].split("-")[0]
    return head + first + suffix


def slurm_coordinator_spec(environ=None, port: int | None = None):
    """(coordinator_address, num_processes, process_id) synthesized from
    SLURM_* env vars (reference utils/dist_util.py:49-77 builds
    MASTER_ADDR/PORT/RANK/WORLD_SIZE the same way for NCCL); None when not
    under SLURM."""
    env = os.environ if environ is None else environ
    if "SLURM_PROCID" not in env or "SLURM_NODELIST" not in env:
        return None
    addr = first_slurm_node(env["SLURM_NODELIST"])
    port = port or int(env.get("MASTER_PORT", 13333))
    return (f"{addr}:{port}", int(env["SLURM_NTASKS"]),
            int(env["SLURM_PROCID"]))


def init_env(args=None, seed: int = 42):
    """Initialise the distributed runtime when running multi-host, and seed
    host-side RNGs (reference utils/dist_util.py:14-46 seeds globally after
    process-group init).

    Multi-host bootstrap order: explicit coordinator env vars
    (COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS) take precedence, then
    SLURM_* synthesis (reference utils/dist_util.py:49-77's
    slurm_initialize). Launch recipe under SLURM:

        srun --ntasks=<hosts> --ntasks-per-node=1 python train.py ...

    — each task calls jax.distributed.initialize against port 13333 (or
    MASTER_PORT / args.port) on the first node of SLURM_NODELIST."""
    global _initialized
    import numpy as np

    explicit = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"))
    port = None
    if args is not None:
        # ConfigDict raises KeyError (not AttributeError) for missing
        # keys, so getattr(args, "port", None) would crash
        get = getattr(args, "get", None)
        port = get("port", None) if callable(get) else None
    slurm = slurm_coordinator_spec(port=port)
    if (explicit or slurm) and not _initialized:
        import jax
        # NOTE: no logging before initialize() — the log formatter queries
        # the process index, which would initialise the XLA backend and
        # make jax.distributed.initialize() fail
        if explicit or slurm is None:
            jax.distributed.initialize()
        else:
            addr, n_procs, proc_id = slurm
            jax.distributed.initialize(
                coordinator_address=addr, num_processes=n_procs,
                process_id=proc_id)
            log.info(f"SLURM bootstrap: coordinator {addr}, "
                     f"process {proc_id}/{n_procs}")
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
