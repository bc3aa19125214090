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
