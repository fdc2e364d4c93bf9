"""YAML OCP compiler + full OCPJax/MPC integration on the Panda.

Config-compatibility is tested against the REFERENCE'S OWN shipped YAML
problem definitions read from /root/reference (the DSL the compiler must
accept, `ocp/ocp_goal_reaching.yaml`)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.mpc.buffer import (
    DTFactorsNSeq,
    TrajectoryBuffer,
    TrajectoryPoint,
    TrajectoryPointWeights,
    WeightedTrajectoryPoint,
)
from agimus_controller_tpu.mpc.mpc import MPC
from agimus_controller_tpu.mpc.ocp_base import OCPJax, OCPParams
from agimus_controller_tpu.mpc.warm_start import (
    WarmStartReference,
    WarmStartShiftPreviousSolution,
)
from agimus_controller_tpu.ocp.yaml_compiler import load_ocp_spec
from agimus_controller_tpu.ops import kinematics

REF_YAML = Path(
    "/root/reference/agimus_controller/agimus_controller/ocp/ocp_goal_reaching.yaml"
)

GOAL_YAML = """
running_model:
  class: IntegratedActionModelEuler
  differential:
    class: DifferentialActionModelFreeFwdDynamics
    costs:
    - name: control_reg
      update: true
      weight: 1.0e-3
      cost:
        class: CostModelResidual
        activation: {class: ActivationModelWeightedQuad, weights: 1.0}
        residual: {class: ResidualModelControlGrav}
    - name: state_reg
      update: true
      weight: 0.1
      cost:
        class: CostModelResidual
        activation: {class: ActivationModelWeightedQuad, weights: 1.0}
        residual: {class: ResidualModelState}
    - name: goal_tracking
      update: true
      weight: 10.0
      cost:
        class: CostModelResidual
        activation: {class: ActivationModelWeightedQuad, weights: 1.0}
        residual: {class: ResidualModelFramePlacement, id: 0}
terminal_model:
  class: IntegratedActionModelEuler
  differential:
    class: DifferentialActionModelFreeFwdDynamics
    costs:
    - name: state_reg
      update: true
      weight: 0.1
      cost:
        class: CostModelResidual
        activation: {class: ActivationModelWeightedQuad, weights: 1.0}
        residual: {class: ResidualModelState}
    - name: goal_tracking
      update: true
      weight: 100.0
      cost:
        class: CostModelResidual
        activation: {class: ActivationModelWeightedQuad, weights: 1.0}
        residual: {class: ResidualModelFramePlacement, id: 0}
"""


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_parse_reference_shipped_yaml(panda):
    """The compiler must accept the reference's own goal-reaching YAML."""
    model, _ = panda
    spec = load_ocp_spec(
        REF_YAML, model, horizon=10, dt=0.01, default_ee_frame="panda_hand_tcp"
    )
    names = [c.name for c in spec.running_costs]
    assert names == ["control_reg", "state_reg", "goal_tracking"]
    kinds = [c.kind for c in spec.running_costs]
    assert kinds == ["control", "state", "frame_placement"]
    assert all(c.update for c in spec.running_costs)
    tnames = [c.name for c in spec.terminal_costs]
    assert tnames == ["state_reg", "goal_tracking"]
    assert spec.running_costs[2].frame == "panda_hand_tcp"


def test_parse_collision_yaml(panda):
    """Collision-avoidance schema: QuadExp activation cost + hard lower-bound
    constraint (reference `ocp_traj_tracking_collision_avoidance.yaml`)."""
    model, _ = load_panda(self_collision=True, dtype=np.float64)
    yaml_src = Path(
        "/root/reference/agimus_controller/agimus_controller/ocp/"
        "ocp_traj_tracking_collision_avoidance.yaml"
    )
    spec = load_ocp_spec(
        yaml_src, model, horizon=5, dt=0.01, default_ee_frame="panda_hand_tcp"
    )
    dist = [c for c in spec.running_costs if c.name == "distance"][0]
    assert dist.kind == "collision_distance"
    assert dist.activation == "quad_exp"
    assert dist.act_alpha == pytest.approx(1e-4)
    assert not dist.update
    assert len(spec.constraints) == 1
    con = spec.constraints[0]
    assert con.kind == "collision_distance"
    assert con.lower == (0.01,)


def test_dt_factor_mismatch_raises(panda):
    model, _ = panda
    with pytest.raises(ValueError, match="covers"):
        load_ocp_spec(GOAL_YAML, model, horizon=10, dt=0.01,
                      dt_factor_n_seq=((1, 3), (2, 3)),
                      default_ee_frame="panda_hand_tcp")


def make_point(i, t_ns, q, v, tau, pose, w_pose=50.0):
    pt = TrajectoryPoint(
        id=i, time_ns=t_ns, robot_configuration=np.asarray(q),
        robot_velocity=np.asarray(v), robot_acceleration=np.zeros(7),
        robot_effort=np.asarray(tau),
        end_effector_poses={"panda_hand_tcp": pose},
    )
    w = TrajectoryPointWeights(
        w_robot_configuration=np.full(7, 0.1),
        w_robot_velocity=np.full(7, 1.0),
        w_robot_effort=np.full(7, 1.0),
        w_end_effector_poses={"panda_hand_tcp": np.full(6, w_pose)},
    )
    return WeightedTrajectoryPoint(point=pt, weights=w)


@pytest.mark.slow  # Panda-scale FDDP MPC compile (~2 min); the default tier
# covers the closed loop on the 2-DoF arm (test_ring_control_loop)
def test_mpc_panda_end_to_end(panda):
    """Full pipeline: YAML spec -> OCPJax -> MPC loop with warm-start shift,
    tracking a fixed goal pose. The closed loop must drive the EE toward the
    goal and each solve must report success."""
    model, params = panda
    T = 10
    dt = 0.02
    spec = load_ocp_spec(GOAL_YAML, model, horizon=T, dt=dt,
                         default_ee_frame="panda_hand_tcp")
    ocp = OCPJax(model, params, spec, dtype=jnp.float64)
    buffer = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[T]))

    q0 = np.asarray(PANDA_Q_READY)
    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, jnp.asarray(q0), fid)
    R0, p0 = np.asarray(R0), np.asarray(p0)
    target = (R0, p0 + np.asarray([0.1, 0.05, -0.05]))

    from agimus_controller_tpu.ops import dynamics as dyn
    tau_g = np.asarray(dyn.generalized_gravity(model, params, jnp.asarray(q0)))

    ws_ref = WarmStartReference()
    ws_ref.setup(model, params)
    ws = WarmStartShiftPreviousSolution()
    ws.setup(model, params, spec.timesteps())

    mpc = MPC()
    mpc.setup(ocp, ws, buffer)

    # stream reference: hold q0 but ask the EE for the offset target
    next_id = 0
    for _ in range(T + 2):
        mpc.append_trajectory_point(
            make_point(next_id, int(next_id * dt * 1e9), q0, np.zeros(7), tau_g, target))
        next_id += 1

    # first solve with unlimited budget via WarmStartReference (reference
    # `setup_mpc_initial_guess`, `agimus_controller.py:359-381`)
    x0, x_init, u_init = ws_ref.generate(
        buffer[0].point, [wp.point for wp in buffer.horizon])
    ocp.set_reference_weighted_trajectory(buffer.horizon)
    res0 = ocp.solve(x0, x_init, u_init, use_iteration_limits_and_timeout=False)
    assert ocp.debug_data.problem_solved
    ws.update_previous_solution(res0)

    state = TrajectoryPoint(id=0, time_ns=0, robot_configuration=q0.copy(),
                            robot_velocity=np.zeros(7))
    _, e0 = _ee_error(model, params, state, fid, target)
    for it in range(15):
        res = mpc.run(state, int(it * dt * 1e9))
        assert res is not None
        assert mpc.mpc_debug_data.ocp.kkt_norm < 10.0
        # closed loop: apply first control through the OCP integrator
        x = ocp.integrate(state.robot_state, res.feed_forward_terms[0])
        state.robot_configuration = x[:7]
        state.robot_velocity = x[7:]
        mpc.append_trajectory_point(
            make_point(next_id, int(next_id * dt * 1e9), q0, np.zeros(7), tau_g, target))
        next_id += 1
    _, e1 = _ee_error(model, params, state, fid, target)
    assert e1 < 0.6 * e0, f"EE error did not shrink: {e0:.4f} -> {e1:.4f}"


def _ee_error(model, params, state, fid, target):
    _, p = kinematics.frame_placement(
        model, params, jnp.asarray(state.robot_configuration), fid)
    e = float(np.linalg.norm(np.asarray(p) - target[1]))
    return p, e
