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


def test_global_mesh_rejects_cross_host_t_groups(monkeypatch):
    # 2 hosts x 6 devices, t_shards=4: 6 % 4 != 0 so a t-row would span
    # both hosts and the Riccati collectives would ride DCN (r04 advisor)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="does not divide"):
        make_global_mesh(t_shards=4, devices=jax.devices()[:8] + jax.devices()[:4])


@pytest.mark.slow
def test_two_process_sharded_solve(tmp_path):
    """Launch TWO real OS processes through `jax.distributed.initialize`
    (env config path), solve a 4-scenario batch sharded across their 2x2
    virtual CPU devices, and assert each process's shard matches the
    single-process solve exactly (VERDICT r04 #5: the multi-host claim
    executed, not just parsed).  Reference analog: the multi-node graph
    `README.md:93-196` runs as separate OS processes."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    outs = [tmp_path / f"worker{i}.npz" for i in range(2)]
    import os as _os

    for pid in range(2):
        env = dict(_os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
        env.update(
            AGIMUS_COORDINATOR=f"localhost:{port}",
            AGIMUS_NUM_PROCESSES="2",
            AGIMUS_PROCESS_ID=str(pid),
            PYTHONPATH=str(repo),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(repo / "tests" / "_distributed_worker.py"),
             str(outs[pid])],
            env=env, cwd=str(repo),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        "worker failed:\n" + "\n---\n".join(logs))

    # single-process reference on the SAME problem
    from agimus_controller_tpu.solver.csqp import CSQPSettings
    from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp
    from tests._distributed_problem import build_tiny_problem

    model, params, spec, cf, refs, x0_of = build_tiny_problem()
    T = spec.horizon
    x0s = np.stack([x0_of(i) for i in range(4)])
    xs0 = np.repeat(x0s[:, None], T + 1, axis=1)
    us0 = np.zeros((4, T, 7))
    st = CSQPSettings(max_iters=4, reg_init=1e-7)
    solver = jax.jit(make_batch_sqp(model, params, spec, cf, st,
                                    backend="xla"))
    sol = solver(jnp.asarray(x0s), refs, jnp.asarray(xs0), jnp.asarray(us0))
    us_ref = np.asarray(sol.us)

    got = {}
    for path in outs:
        data = np.load(path)
        for i, row in zip(data["idx"], data["us"]):
            assert int(i) not in got, f"scenario {i} owned by two processes"
            got[int(i)] = row
    assert sorted(got) == [0, 1, 2, 3]
    for i in range(4):
        np.testing.assert_allclose(
            got[i], us_ref[i], rtol=0, atol=1e-10,
            err_msg=f"scenario {i}: 2-process solve != single-process")
