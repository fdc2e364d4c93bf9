"""Trajectory generator tests (reference patterns:
`test_order_5_polynomial.py`, `test_sin_wave_configuration_space.py`,
`test_sin_wave_cartesian_space.py`, `test_generic_trajectory.py`)."""

import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.trajectories import (
    GenericTrajectory,
    GenericVisualServoingTrajectory,
    QuinticTrajectory,
    SinusWaveCartesianSpace,
    SinusWaveConfigurationSpace,
    SinWaveParams,
    TrajectoryBase,
    VisualServoingState,
    WeightIncreasing,
)


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


W7 = dict(w_q=np.ones(7), w_qdot=np.ones(7), w_qddot=np.zeros(7),
          w_robot_effort=np.full(7, 1e-3), w_pose=np.full(6, 10.0))


def test_quintic_boundary_conditions():
    qt = QuinticTrajectory(scale_duration=[2.0])
    p, v, a = qt.get_value_at_t(0.0)
    np.testing.assert_allclose([p[0], v[0], a[0]], [0, 0, 0], atol=1e-12)
    p, v, a = qt.get_value_at_t(2.0)
    np.testing.assert_allclose([p[0], v[0], a[0]], [1, 0, 0], atol=1e-12)
    p, v, a = qt.get_value_at_t(5.0)
    np.testing.assert_allclose([p[0], v[0], a[0]], [1, 0, 0], atol=1e-12)
    # midpoint: p=0.5 by symmetry, derivative consistent with FD
    p1, v1, _ = qt.get_value_at_t(1.0)
    assert p1[0] == pytest.approx(0.5)
    eps = 1e-6
    p2, _, _ = qt.get_value_at_t(1.0 + eps)
    assert v1[0] == pytest.approx((p2[0] - p1[0]) / eps, rel=1e-4)


def test_weight_increasing():
    wi = WeightIncreasing(max_weight=100.0, percent=0.95, time_reach_percent=2.0)
    assert wi.get_weight_at_t(0.0) == 0.0
    assert wi.get_weight_at_t(2.0) == pytest.approx(95.0)
    assert wi.get_weight_at_t(100.0) == pytest.approx(100.0, abs=1e-6)


def test_sine_wave_params():
    p = SinWaveParams(amplitude=[0.1], period=[2.0], scale_duration=[1.0])
    assert p.frequency == [0.5]
    assert p.pulsation[0] == pytest.approx(np.pi)
    # zero period -> zero frequency (reference safe-division semantics)
    p0 = SinWaveParams(amplitude=[0.1], period=[0.0], scale_duration=[1.0])
    assert p0.frequency == [0.0]


def test_sine_configuration_space(panda):
    model, params = panda
    sw = SinusWaveConfigurationSpace(
        SinWaveParams(amplitude=[0.2] * 7, period=[2.0] * 7,
                      scale_duration=[1.0] * 7),
        "panda_hand_tcp", **W7)
    sw.initialize(model, params, PANDA_Q_READY)
    wp = sw.get_traj_point_at_t(0.0)
    np.testing.assert_allclose(wp.point.robot_configuration, PANDA_Q_READY)
    # finite-difference derivative consistency
    eps = 1e-6
    t = 1.7
    p0 = sw.get_traj_point_at_t(t)
    p1 = sw.get_traj_point_at_t(t + eps)
    fd_v = (p1.point.robot_configuration - p0.point.robot_configuration) / eps
    np.testing.assert_allclose(p0.point.robot_velocity, fd_v, atol=1e-4)
    fd_a = (p1.point.robot_velocity - p0.point.robot_velocity) / eps
    np.testing.assert_allclose(p0.point.robot_acceleration, fd_a, atol=1e-4)
    # effort is RNEA along the reference
    from agimus_controller_tpu.ops import dynamics
    import jax.numpy as jnp
    u = dynamics.rnea(model, params,
                      jnp.asarray(p0.point.robot_configuration),
                      jnp.asarray(p0.point.robot_velocity),
                      jnp.asarray(p0.point.robot_acceleration))
    np.testing.assert_allclose(p0.point.robot_effort, np.asarray(u), atol=1e-9)


def test_sine_cartesian_space_ik(panda):
    model, params = panda
    sw = SinusWaveCartesianSpace(
        SinWaveParams(amplitude=[0.1, 0.05, 0.08], period=[4.0] * 3,
                      scale_duration=[1.0] * 3),
        "panda_hand_tcp", **W7)
    sw.initialize(model, params, PANDA_Q_READY)
    wp = sw.get_traj_point_at_t(1.3)
    # IK solution must place the EE at the requested pose
    des_rot, des_trans = wp.point.end_effector_poses["panda_hand_tcp"]
    R, p = sw.get_end_effector_pose_from_q(wp.point.robot_configuration)
    np.testing.assert_allclose(p, des_trans, atol=1e-4)
    np.testing.assert_allclose(R, des_rot, atol=1e-4)
    # velocity IK consistency: FK velocity matches requested EE velocity
    import jax.numpy as jnp
    from agimus_controller_tpu.ops import kinematics
    nu = kinematics.frame_velocity(
        model, params, jnp.asarray(wp.point.robot_configuration),
        jnp.asarray(wp.point.robot_velocity),
        model.frame_id("panda_hand_tcp"), "local_world_aligned")
    quint, dquint, _ = sw.quint_traj.get_value_at_t(1.3)
    expect_v = sw.amp * (dquint * np.sin(sw.w * 1.3) + quint * sw.w * np.cos(sw.w * 1.3))
    np.testing.assert_allclose(np.asarray(nu)[3:], expect_v, atol=1e-6)


def test_ik_3dof_masked(panda):
    model, params = panda
    sw = SinusWaveCartesianSpace(
        SinWaveParams(amplitude=[0.1, 0.0, 0.1], period=[4.0] * 3,
                      scale_duration=[1.0] * 3),
        "panda_hand_tcp", mask=(True, True, True, False, False, False), **W7)
    sw.initialize(model, params, PANDA_Q_READY)
    wp = sw.get_traj_point_at_t(0.9)
    des_rot, des_trans = wp.point.end_effector_poses["panda_hand_tcp"]
    _, p = sw.get_end_effector_pose_from_q(wp.point.robot_configuration)
    np.testing.assert_allclose(p, des_trans, atol=1e-4)


def test_generic_trajectory(panda):
    model, params = panda
    gt = GenericTrajectory("panda_hand_tcp", w_collision_avoidance=2.0, **W7)
    gt.initialize(model, params, PANDA_Q_READY)
    qs = [PANDA_Q_READY + 0.01 * i for i in range(5)]
    traj = gt.build_trajectory_from_q_dq_ddq_arrays(
        qs, [np.zeros(7)] * 5, [np.zeros(7)] * 5)
    gt.add_trajectory(traj)
    seen = []
    for i in range(7):  # overrun: playback clamps at the last point
        wp = gt.get_traj_point_at_t(i * 0.01)
        seen.append(wp.point.robot_configuration[0])
    assert gt.trajectory_is_done
    np.testing.assert_allclose(seen[4], seen[6])
    assert wp.weights.w_collision_avoidance == 2.0
    # effort equals gravity compensation for zero velocity/acceleration
    from agimus_controller_tpu.ops import dynamics
    import jax.numpy as jnp
    g = dynamics.generalized_gravity(model, params, jnp.asarray(qs[0]))
    np.testing.assert_allclose(traj[0].robot_effort, np.asarray(g), atol=1e-9)


def test_visual_servoing_state_machine(panda):
    model, params = panda
    wi = WeightIncreasing(max_weight=50.0, percent=0.95, time_reach_percent=0.5)
    vs = GenericVisualServoingTrajectory(
        "panda_hand_tcp", dt=0.1,
        w_q=np.ones(7), w_qdot=np.ones(7), w_qddot=np.zeros(7),
        w_robot_effort=np.full(7, 1e-3), w_pose=np.full(6, 10.0),
        w_increasing=wi, w_increasing_max_rotation=25.0,
        w_increasing_max_collision_avoidance=4.0, w_collision_avoidance=1.0)
    vs.initialize(model, params, PANDA_Q_READY)
    assert vs.robot_frame == "panda_hand_tcp_vs"

    gt = GenericTrajectory("panda_hand_tcp", **W7)
    gt.initialize(model, params, PANDA_Q_READY)
    traj = gt.build_trajectory_from_q_dq_ddq_arrays(
        [PANDA_Q_READY] * 10, [np.zeros(7)] * 10, [np.zeros(7)] * 10)

    wMo = (np.eye(3), np.asarray([0.4, 0.0, 0.3]))
    vs.add_trajectory(traj, visual_servoing_idx_range=(3, 7),
                      init_in_world_M_object=wMo)

    states, w_trans = [], []
    for i in range(10):
        wp = vs.get_traj_point_at_t(i * 0.1)
        states.append(vs.visual_servoing_state)
        w_trans.append(wp.weights.w_end_effector_poses["panda_hand_tcp_vs"][0])
    # IDLE before the window, active inside, ramp-down after
    assert states[0] == VisualServoingState.IDLE
    assert states[4] == VisualServoingState.USING_VISUAL_SERVOING
    assert states[8] == VisualServoingState.COMING_BACK_TO_IDLE
    assert w_trans[0] == 0.0
    assert w_trans[5] > w_trans[4] > 0.0  # ramping up
    assert w_trans[9] < w_trans[6]  # ramping down
    # references re-expressed in the object frame: oMee = wMo^-1 * wMee
    wp = vs.get_traj_point_at_t(1.0)
    _, p_obj = wp.point.end_effector_poses["panda_hand_tcp"]
    R0, p0 = gt.get_end_effector_pose_from_q(PANDA_Q_READY)
    np.testing.assert_allclose(p_obj, p0 - wMo[1], atol=1e-9)


def test_missing_detection_raises(panda):
    model, params = panda
    vs = GenericVisualServoingTrajectory(
        "panda_hand_tcp", dt=0.1, w_q=np.ones(7), w_qdot=np.ones(7),
        w_qddot=np.zeros(7), w_robot_effort=np.ones(7), w_pose=np.ones(6),
        w_increasing=WeightIncreasing(1.0, 0.9, 1.0),
        w_increasing_max_rotation=1.0, w_increasing_max_collision_avoidance=1.0)
    with pytest.raises(ValueError, match="detection"):
        vs.add_trajectory([], visual_servoing_idx_range=(1, 3))
