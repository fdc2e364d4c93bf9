"""Factory registries + engine-config loader tests (#7/#35 equivalents)."""

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.factory import create_ocp, create_warm_start
from agimus_controller_tpu.models.panda import load_panda
from agimus_controller_tpu.mpc.ocp_base import OCPParams
from agimus_controller_tpu.runtime.config import load_engine_config


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_create_ocp_goal_reaching(panda):
    model, params = panda
    ocp = create_ocp(
        "goal_reaching", model, params,
        OCPParams(dt=0.01, horizon_size=5),
        ee_frame="panda_hand_tcp", dtype=jnp.float64,
    )
    assert ocp.n_controls == 5
    assert ocp.dt == 0.01


def test_create_ocp_from_shipped_yaml(panda):
    model, params = panda
    ocp = create_ocp(
        "goal_reaching_yaml", model, params, OCPParams(dt=0.02, horizon_size=4),
        ee_frame="panda_hand_tcp", dtype=jnp.float64,
    )
    names = [c.name for c in ocp.spec.running_costs]
    assert names == ["control_reg", "state_reg", "goal_tracking"]


def test_create_ocp_collision_yaml():
    model, params = load_panda(self_collision=True, dtype=np.float64)
    ocp = create_ocp(
        "traj_tracking_collision_avoidance", model, params,
        OCPParams(dt=0.01, horizon_size=3),
        ee_frame="panda_hand_tcp", dtype=jnp.float64,
    )
    assert any(c.kind == "collision_distance" for c in ocp.spec.running_costs)
    assert len(ocp.spec.constraints) == 1


def test_create_warm_start(panda):
    model, params = panda
    ws = create_warm_start("reference", model, params)
    assert ws is not None
    ws2 = create_warm_start("shift_previous_solution", model, params,
                            timesteps=np.full(5, 0.01))
    assert ws2 is not None
    with pytest.raises(KeyError, match="unknown"):
        create_warm_start("nope", model, params)


REFERENCE_SCHEMA_FILE = (
    "/root/reference/agimus_controller_ros/agimus_controller_ros/"
    "agimus_controller_parameters.yaml"
)

VALUES_YAML = """
agimus_controller_params:
  ocp:
    dt: 0.01
    dt_factor_n_seq:
      factors: [1, 2, 4]
      n_steps: [30, 20, 10]
    horizon_size: 60
    armature: [0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]
    max_qp_iter: 200
    max_iter: 3
    n_threads: 8
    max_solve_time: 0.05
    termination_tolerance: 1e-4
  constant_delay: true
  rate: 100.0
  self_collision: false
  collision_pairs_names: [pair_1]
  pair_1:
    first: panda_link7_capsule
    second: obstacle_sphere
"""


def test_load_reference_schema_defaults():
    """The loader must parse the reference's own schema file (defaults)."""
    cfg = load_engine_config(REFERENCE_SCHEMA_FILE)
    assert cfg.ocp.dt == 0.01
    assert cfg.ocp.horizon_size == 19
    assert cfg.ocp.dt_factor_n_seq == ((1, 19),)
    assert cfg.ocp.solver_iters == 10
    assert cfg.runtime.rate == 100.0
    np.testing.assert_allclose(cfg.armature, np.full(7, 0.1))


def test_load_values_yaml():
    cfg = load_engine_config(VALUES_YAML)
    assert cfg.ocp.horizon_size == 60
    assert cfg.ocp.dt_factor_n_seq == ((1, 30), (2, 20), (4, 10))
    assert cfg.ocp.solver_iters == 3
    assert cfg.runtime.constant_delay
    assert cfg.collision_pairs == [("panda_link7_capsule", "obstacle_sphere")]
    # derived horizon timing must match the reference demo (1.3 s lookahead)
    from agimus_controller_tpu.ocp.spec import ProblemSpec, CostItem

    spec = ProblemSpec(
        running_costs=(CostItem(name="s", kind="state"),),
        terminal_costs=(), horizon=60, dt=0.01,
        dt_factor_n_seq=cfg.ocp.dt_factor_n_seq)
    assert spec.total_time == pytest.approx(1.1)  # 30*dt + 20*2dt + 10*4dt


def test_horizon_mismatch_raises():
    bad = VALUES_YAML.replace("horizon_size: 60", "horizon_size: 61")
    with pytest.raises(ValueError, match="horizon_size"):
        load_engine_config(bad)


def test_nthreads_validation():
    bad = VALUES_YAML.replace("n_threads: 8", "n_threads: 0")
    with pytest.raises(ValueError, match="n_threads"):
        load_engine_config(bad)
