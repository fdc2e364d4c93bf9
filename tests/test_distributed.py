"""Multi-host init path + global mesh layout (`parallel/distributed.py`).

Runs in the standard 8-virtual-CPU-device test config; the multi-process
branches that need a real cluster are validated at the config level
(env parsing, launch detection) — the single-process degradation and the
global mesh/data-placement layout execute for real here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from agimus_controller_tpu.parallel import (
    DistributedConfig,
    host_local_to_global,
    initialize_distributed,
    make_global_mesh,
)


def test_single_process_is_noop(monkeypatch):
    for k in ("AGIMUS_COORDINATOR", "SLURM_JOB_ID",
              "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False
    # devices untouched, still the 8 virtual CPU devices
    assert len(jax.devices()) == 8


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("AGIMUS_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("AGIMUS_NUM_PROCESSES", "4")
    monkeypatch.setenv("AGIMUS_PROCESS_ID", "2")
    cfg = DistributedConfig.from_env()
    assert cfg.coordinator_address == "10.0.0.1:1234"
    assert cfg.num_processes == 4
    assert cfg.process_id == 2
    assert cfg.is_multiprocess()


def test_scheduler_autodetect(monkeypatch):
    monkeypatch.delenv("AGIMUS_COORDINATOR", raising=False)
    monkeypatch.setenv("SLURM_JOB_ID", "77")
    assert DistributedConfig.from_env().is_multiprocess()


def test_global_mesh_layout():
    mesh = make_global_mesh(t_shards=2)
    assert mesh.axis_names == ("batch", "t")
    assert mesh.shape == {"batch": 4, "t": 2}
    # contiguous t-groups: device ids within one t-row are adjacent
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert (np.diff(ids, axis=1) == 1).all()


def test_global_mesh_validation():
    with pytest.raises(ValueError):
        make_global_mesh(t_shards=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_global_mesh(t_shards=16)  # more than per-process devices


def test_host_local_to_global_roundtrip():
    mesh = make_global_mesh(t_shards=1)
    a = np.arange(8 * 3, dtype=np.float64).reshape(8, 3)
    tree = {"x": a, "u": a[:, :2].copy()}
    placed = host_local_to_global(mesh, tree)
    assert placed["x"].sharding == NamedSharding(mesh, P("batch"))
    np.testing.assert_array_equal(np.asarray(placed["x"]), a)
    # sharded compute over the placed array works end-to-end
    y = jax.jit(lambda t: jnp.sum(t["x"]) + jnp.sum(t["u"]))(placed)
    assert float(y) == a.sum() + a[:, :2].sum()
