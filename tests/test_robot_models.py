"""Model factory tests (pattern of reference `tests/test_robot_models.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import (
    PANDA_DEFAULT_ARMATURE,
    PANDA_Q_READY,
    PANDA_URDF,
    load_panda,
)
from agimus_controller_tpu.models.urdf import (
    RobotModelParameters,
    build_model_from_urdf,
    build_robot_models,
)
from agimus_controller_tpu.ops import kinematics


ENV_URDF = """<?xml version="1.0"?>
<robot name="env">
  <link name="obstacle_base"/>
  <joint name="obstacle_joint" type="fixed">
    <parent link="obstacle_base"/><child link="obstacle"/>
    <origin xyz="0.5 0.0 0.5" rpy="0 0 0"/>
  </joint>
  <link name="obstacle">
    <collision name="obstacle_sphere">
      <geometry><sphere radius="0.1"/></geometry>
    </collision>
  </link>
</robot>
"""


def test_panda_loads():
    model, params = load_panda(dtype=np.float64)
    assert model.nq == 7
    assert model.nv == 7
    assert model.joint_names == tuple(f"panda_joint{i}" for i in range(1, 8))
    assert model.parents == (-1, 0, 1, 2, 3, 4, 5)
    np.testing.assert_allclose(params.armature, PANDA_DEFAULT_ARMATURE)
    np.testing.assert_allclose(params.effort_limit, [87, 87, 87, 87, 12, 12, 12])


def test_panda_fk_zero_config():
    """Known Panda FK: at q = 0 link8 sits at (0.088, 0, 0.926), z-axis down."""
    model, params = load_panda(dtype=np.float64)
    q = jnp.zeros(7)
    R, p = kinematics.frame_placement(model, params, q, model.frame_id("panda_link8"))
    np.testing.assert_allclose(p, [0.088, 0.0, 0.926], atol=1e-12)
    np.testing.assert_allclose(R[:, 2], [0.0, 0.0, -1.0], atol=1e-12)


def test_panda_fk_tcp_offset():
    model, params = load_panda(dtype=np.float64)
    q = jnp.asarray(PANDA_Q_READY)
    _, p8 = kinematics.frame_placement(model, params, q, model.frame_id("panda_link8"))
    _, ptcp = kinematics.frame_placement(
        model, params, q, model.frame_id("panda_hand_tcp")
    )
    np.testing.assert_allclose(np.linalg.norm(ptcp - p8), 0.1034, atol=1e-9)


def test_fixed_link_inertia_merged():
    """Hand mass merges into link7's body when joints are fixed."""
    model, params = load_panda(dtype=np.float64)
    # body 6 (joint7 child) carries link7 + hand inertia
    assert float(params.mass[6]) == pytest.approx(0.735522 + 0.73, abs=1e-9)


def test_model_reduction_locks_joints():
    """Locking joints reproduces `pin.buildReducedModel` semantics."""
    full, fparams = load_panda(dtype=np.float64)
    q0 = np.array([0.3, -0.5, 0.2, -2.0, 0.1, 1.5, 0.4])
    moving = [f"panda_joint{i}" for i in (1, 2, 4, 5, 6, 7)]  # lock joint3
    red, rparams = build_model_from_urdf(
        PANDA_URDF,
        moving_joint_names=moving,
        q0=q0,
        armature=np.full(6, 0.1),
        collision_as_capsule=True,
        dtype=np.float64,
    )
    assert red.nq == 6
    # FK must agree with the full model at the same physical configuration
    q_red = jnp.asarray(q0[[0, 1, 3, 4, 5, 6]])
    q_full = jnp.asarray(q0)
    fid_f = full.frame_id("panda_link8")
    fid_r = red.frame_id("panda_link8")
    Rf, pf = kinematics.frame_placement(full, fparams, q_full, fid_f)
    Rr, pr = kinematics.frame_placement(red, rparams, q_red, fid_r)
    np.testing.assert_allclose(pr, pf, atol=1e-12)
    np.testing.assert_allclose(Rr, Rf, atol=1e-12)


def test_env_append():
    """Environment URDF grafts onto the attachment frame
    (reference `pin.appendModel`, `factory/robot_model.py:214-229`)."""
    model, params = load_panda(env_urdf=ENV_URDF, dtype=np.float64)
    gid = model.geometry_id("obstacle_sphere")
    geo = model.geometries[gid]
    assert geo.parent_joint == -1  # world-fixed (attached to panda_link0)
    np.testing.assert_allclose(params.geom_trans[gid], [0.5, 0.0, 0.5], atol=1e-12)
    np.testing.assert_allclose(params.geom_radius[gid], 0.1)


def test_self_collision_pairs_from_srdf():
    model, _ = load_panda(self_collision=True, dtype=np.float64)
    assert len(model.collision_pairs) > 0
    # adjacent links are SRDF-disabled: no (link0, link1) pair
    g0 = model.geometry_id("panda_link0_capsule")
    g1 = model.geometry_id("panda_link1_capsule")
    assert (min(g0, g1), max(g0, g1)) not in model.collision_pairs


def test_explicit_collision_pairs():
    model, _ = load_panda(
        env_urdf=ENV_URDF,
        collision_pairs=[("panda_link7_capsule", "obstacle_sphere")],
        dtype=np.float64,
    )
    a = model.geometry_id("panda_link7_capsule")
    b = model.geometry_id("obstacle_sphere")
    assert (min(a, b), max(a, b)) in model.collision_pairs


def test_capsule_conversion():
    model, params = load_panda(dtype=np.float64)
    caps = [g for g in model.geometries if g.gtype == "capsule"]
    assert len(caps) >= 7  # one per arm link at least
    assert np.all(np.asarray(params.geom_radius) > 0)


def test_robot_models_facade_validation():
    with pytest.raises(ValueError, match="URDF"):
        RobotModelParameters(robot_urdf="")
    with pytest.raises(ValueError, match="[Aa]rmature"):
        RobotModelParameters(
            robot_urdf=PANDA_URDF,
            moving_joint_names=["panda_joint1"],
            armature=np.zeros(3),
        )
    models = build_robot_models(
        RobotModelParameters(
            robot_urdf=PANDA_URDF,
            q0=np.zeros(7),
            moving_joint_names=[f"panda_joint{i}" for i in range(1, 8)],
            armature=np.full(7, 0.1),
            collision_as_capsule=True,
            dtype=np.float64,
        )
    )
    assert models.robot_model.nq == 7
    assert models.full_model.nq == 7


def test_neutral_configuration():
    model, params = load_panda(dtype=np.float64)
    qn = np.asarray(model.neutral(params))
    assert np.all(qn >= np.asarray(params.q_lower) - 1e-9)
    assert np.all(qn <= np.asarray(params.q_upper) + 1e-9)
    assert qn[3] == pytest.approx(0.5 * (-3.0718 + -0.0698))
