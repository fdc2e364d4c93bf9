"""Component-form batched cost packs must match the generic jacfwd path
for every supported cost kind and activation (values, gradients, GN
Hessians) — the pack is the fast path of the batch-native solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.ops.batched_costs import make_batched_cost_pack
from tests.test_robot_models import ENV_URDF

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda_env():
    return load_panda(
        env_urdf=ENV_URDF,
        collision_pairs=[("panda_link7_capsule", "obstacle_sphere")],
        dtype=np.float64,
    )


def _compare_pack(model, params, spec, B=3, seed=0, atol=1e-8):
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    T = spec.horizon
    # randomize runtime references so update=True paths are exercised
    rng = np.random.default_rng(seed)
    for k, v in list(refs.items()):
        if k.startswith(("ee_rot", "wMo_rot")):
            continue  # keep rotations orthonormal
        refs[k] = v + jnp.asarray(0.1 * rng.normal(size=v.shape))
    pack = make_batched_cost_pack(model, params, spec)
    assert pack is not None, "spec should hit the fast path"
    cost_derivs_b, term_pack, stage_cost_b, term_cost_b = pack

    q0 = np.asarray(PANDA_Q_READY)
    x = jnp.asarray(np.concatenate(
        [q0[None] + 0.2 * rng.normal(size=(B, 7)),
         0.3 * rng.normal(size=(B, 7))], axis=1))
    u = jnp.asarray(rng.normal(size=(B, 7)))

    for t in (0, T - 1):
        got = cost_derivs_b(x, u, t, refs)
        want = jax.vmap(cf.cost_derivs, in_axes=(0, 0, None, None))(
            x, u, t, refs)
        names = ("l", "lx", "lu", "lxx", "lxu", "luu")
        for g, w, n in zip(got, want, names):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=atol,
                err_msg=f"{n} at t={t}")
        np.testing.assert_allclose(
            np.asarray(stage_cost_b(x, u, t, refs)),
            np.asarray(jax.vmap(cf.stage_cost, in_axes=(0, 0, None, None))(
                x, u, t, refs)), atol=atol)

    lT, lxT, lxxT = term_pack(x, refs)
    wT = jax.vmap(cf.terminal_derivs, in_axes=(0, None))(x, refs)
    np.testing.assert_allclose(np.asarray(lT), np.asarray(wT.cost), atol=atol)
    np.testing.assert_allclose(np.asarray(lxT), np.asarray(wT.lx), atol=atol)
    np.testing.assert_allclose(np.asarray(lxxT), np.asarray(wT.lxx), atol=atol)


def test_pack_frame_kinds(panda_env):
    model, params = panda_env
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.3, update=True),
            CostItem(name="ctrl", kind="control", weight=0.05, update=True),
            CostItem(name="trans", kind="frame_translation", weight=2.0,
                     update=True, frame="panda_hand_tcp"),
            CostItem(name="rot", kind="frame_rotation", weight=1.5,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=9.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=4, dt=0.01,
    )
    _compare_pack(model, params, spec)


@pytest.mark.parametrize("ref_frame", ["world", "local", "local_world_aligned"])
def test_pack_frame_velocity(panda_env, ref_frame):
    model, params = panda_env
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="vel", kind="frame_velocity", weight=1.0,
                     update=True, frame="panda_hand_tcp",
                     reference_frame=ref_frame),
        ),
        terminal_costs=(
            CostItem(name="vel", kind="frame_velocity", weight=4.0,
                     update=True, frame="panda_hand_tcp",
                     reference_frame=ref_frame),
        ),
        horizon=3, dt=0.01,
    )
    _compare_pack(model, params, spec)


@pytest.mark.parametrize("activation", ["quad_exp", "exp"])
def test_pack_collision(panda_env, activation):
    model, params = panda_env
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="coll", kind="collision_distance", weight=5.0,
                     update=True, activation=activation, act_alpha=0.01,
                     pair_id=0),
            CostItem(name="ctrl", kind="control", weight=0.05, update=True),
        ),
        terminal_costs=(
            CostItem(name="coll", kind="collision_distance", weight=5.0,
                     update=False, activation=activation, act_alpha=0.01,
                     pair_id=0),
        ),
        horizon=3, dt=0.01,
    )
    _compare_pack(model, params, spec)


def test_pack_collision_moving_obstacle(panda_env):
    """geom_trans refs override (moving obstacle) must flow into the pack."""
    model, params = panda_env
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="coll", kind="collision_distance", weight=1.0,
                     update=True, activation="quad_exp", act_alpha=0.01,
                     pair_id=0),
        ),
        terminal_costs=(),
        horizon=2, dt=0.01,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    gid = model.geometry_id("obstacle_sphere")
    refs["geom_rot"] = params.geom_rot
    refs["geom_trans"] = jnp.asarray(params.geom_trans).at[gid].set(
        jnp.asarray([0.1, 0.1, 0.8]))
    pack = make_batched_cost_pack(model, params, spec)
    cost_derivs_b = pack[0]
    x = jnp.concatenate(
        [jnp.asarray(PANDA_Q_READY), jnp.zeros(7)])[None].repeat(2, 0)
    u = jnp.zeros((2, 7))
    got = cost_derivs_b(x, u, 0, refs)
    want = jax.vmap(cf.cost_derivs, in_axes=(0, 0, None, None))(x, u, 0, refs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-9)


def test_pack_visual_servoing(panda_env):
    model, params = panda_env
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="vs", kind="visual_servoing", weight=3.0,
                     update=True, frame="panda_hand_tcp",
                     object_frame="obj"),
        ),
        terminal_costs=(),
        horizon=3, dt=0.01,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    # non-trivial vision transform
    from agimus_controller_tpu.ops.spatial import exp3

    refs["wMo_rot:obj"] = exp3(jnp.asarray([0.2, -0.1, 0.3]))
    refs["wMo_trans:obj"] = jnp.asarray([0.4, 0.1, 0.2])
    pack = make_batched_cost_pack(model, params, spec)
    assert pack is not None
    cost_derivs_b = pack[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.concatenate(
        [np.asarray(PANDA_Q_READY)[None] + 0.1 * rng.normal(size=(2, 7)),
         np.zeros((2, 7))], axis=1))
    u = jnp.zeros((2, 7))
    got = cost_derivs_b(x, u, 1, refs)
    want = jax.vmap(cf.cost_derivs, in_axes=(0, 0, None, None))(x, u, 1, refs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-8)
