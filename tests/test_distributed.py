"""Multi-host launcher argument paths (parallel/distributed.py).

Real multi-process startup can't run here (1 host), but every decision the
launcher makes before touching the network is testable: env-var cluster
detection (NF_*/SLURM/OpenMPI), explicit-arg pass-through, idempotency on
re-init, error propagation, and the 1-host fast paths.
"""

import jax
import pytest

from normalizingflows.jl_tpu.parallel import distributed as dist


def test_detect_nf_vars():
    env = {"NF_COORDINATOR": "10.0.0.1:9999", "NF_NUM_PROCESSES": "4",
           "NF_PROCESS_ID": "2"}
    assert dist.detect_cluster_env(env) == ("10.0.0.1:9999", 4, 2)


def test_detect_slurm_plain_and_ranged_nodelist():
    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8",
           "SLURM_STEP_NODELIST": "hosta,hostb"}
    addr, n, i = dist.detect_cluster_env(env)
    assert addr.startswith("hosta:") and (n, i) == (8, 3)

    env["SLURM_STEP_NODELIST"] = "tpu-node[017-020],tpu-node025"
    addr, n, i = dist.detect_cluster_env(env)
    assert addr.startswith("tpu-node017:")


def test_detect_slurm_falls_back_to_nodelist_var():
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_NODELIST": "n1,n2"}
    addr, n, i = dist.detect_cluster_env(env)
    assert addr.startswith("n1:") and (n, i) == (2, 0)


def test_detect_openmpi():
    env = {"OMPI_COMM_WORLD_RANK": "1", "OMPI_COMM_WORLD_SIZE": "4",
           "NF_COORDINATOR_HOST": "head0"}
    addr, n, i = dist.detect_cluster_env(env)
    assert addr == f"head0:{dist._DEFAULT_PORT}" and (n, i) == (4, 1)


def test_detect_nothing():
    assert dist.detect_cluster_env({}) == (None, None, None)


def test_initialize_passthrough_and_env(monkeypatch):
    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    # explicit args win
    dist.initialize("1.2.3.4:1", 2, 1)
    assert calls[-1] == ("1.2.3.4:1", 2, 1)

    # env detection fills missing args
    monkeypatch.setenv("NF_COORDINATOR", "5.6.7.8:2")
    monkeypatch.setenv("NF_NUM_PROCESSES", "16")
    monkeypatch.setenv("NF_PROCESS_ID", "7")
    dist.initialize()
    assert calls[-1] == ("5.6.7.8:2", 16, 7)

    # detect_env=False leaves everything to JAX auto-detection
    dist.initialize(detect_env=False)
    assert calls[-1] == (None, None, None)


def test_initialize_idempotent_and_error_propagation(monkeypatch):
    def raise_already(**kw):
        raise RuntimeError("Distributed runtime is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raise_already)
    dist.initialize("x:1", 1, 0)  # swallowed

    def raise_other(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", raise_other)
    with pytest.raises(RuntimeError, match="connection refused"):
        dist.initialize("x:1", 1, 0)


def test_single_host_helpers():
    assert dist.host_count() == 1
    assert dist.host_index() == 0
    assert not dist.is_multi_host()
    dist.barrier()  # no-op on one host, must not touch the network
