"""Force-feedback (soft contact) tier tests: augmented dynamics physics,
spec/OCP integration, force tracking, and the FF warm start (reference
components #10/#15, N7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.mpc.buffer import TrajectoryPoint
from agimus_controller_tpu.mpc.data import OCPResults
from agimus_controller_tpu.mpc.warm_start import (
    WarmStartShiftPreviousSolutionForceFeedback,
)
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.ops import dynamics
from agimus_controller_tpu.ops.soft_contact import (
    SoftContactConfig,
    soft_contact_dynamics,
    soft_contact_step,
)
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


SC3 = SoftContactConfig(frame="panda_hand_tcp", Kp=(200.0,) * 3, Kv=(20.0,) * 3,
                        ref="local_world_aligned")
SC1 = SoftContactConfig(frame="panda_hand_tcp", Kp=(200.0,) * 3, Kv=(20.0,) * 3,
                        enabled_directions=(False, False, True),
                        ref="local_world_aligned")


def test_nc_dimensions():
    assert SC3.nc == 3
    assert SC1.nc == 1
    assert SC1.mask_indices() == (2,)
    with pytest.raises(AssertionError):
        SoftContactConfig(frame="f", enabled_directions=(True, True, False)).nc


def test_zero_force_matches_free_dynamics(panda):
    """With f = 0 the augmented acceleration equals the free dynamics."""
    model, params = panda
    q = jnp.asarray(PANDA_Q_READY)
    v = jnp.asarray(np.random.default_rng(0).normal(size=7) * 0.1)
    u = jnp.asarray(np.random.default_rng(1).normal(size=7))
    x = jnp.concatenate([q, v, jnp.zeros(3)])
    a, f_dot = soft_contact_dynamics(model, params, SC3, x, u)
    a_free = dynamics.forward_dynamics(model, params, q, v, u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_free), atol=1e-12)
    assert np.all(np.isfinite(np.asarray(f_dot)))


def test_contact_force_accelerates_ee(panda):
    """A +z contact force on a static arm adds J^T f torque: the resulting
    acceleration difference must satisfy M * da = J^T f."""
    model, params = panda
    q = jnp.asarray(PANDA_Q_READY)
    v = jnp.zeros(7)
    u = dynamics.generalized_gravity(model, params, q)
    f = jnp.asarray([0.0, 0.0, 10.0])
    x = jnp.concatenate([q, v, f])
    a, _ = soft_contact_dynamics(model, params, SC3, x, u)
    from agimus_controller_tpu.ops import kinematics

    fid = model.frame_id("panda_hand_tcp")
    J = kinematics.frame_jacobian(model, params, q, fid, "local_world_aligned")[3:]
    M = dynamics.mass_matrix(model, params, q)
    np.testing.assert_allclose(np.asarray(M @ a), np.asarray(J.T @ f), atol=1e-9)


def test_inactive_contact_freezes_force(panda):
    model, params = panda
    x = jnp.concatenate([jnp.asarray(PANDA_Q_READY), 0.1 * jnp.ones(7),
                         jnp.asarray([1.0, 2.0, 3.0])])
    u = jnp.zeros(7)
    x_next = soft_contact_step(model, params, SC3, x, u, 0.01, active=0.0)
    np.testing.assert_allclose(np.asarray(x_next[14:]), [1.0, 2.0, 3.0], atol=1e-12)
    # and the force does not act on the joints
    a_off, _ = soft_contact_dynamics(model, params, SC3, x, u, active=0.0)
    a_free = dynamics.forward_dynamics(model, params, x[:7], x[7:14], u)
    np.testing.assert_allclose(np.asarray(a_off), np.asarray(a_free), atol=1e-12)


def test_soft_contact_1d(panda):
    model, params = panda
    x = jnp.concatenate([jnp.asarray(PANDA_Q_READY), jnp.zeros(7), jnp.asarray([5.0])])
    u = dynamics.generalized_gravity(model, params, jnp.asarray(PANDA_Q_READY))
    a, f_dot = soft_contact_dynamics(model, params, SC1, x, u)
    assert f_dot.shape == (1,)
    assert np.all(np.isfinite(np.asarray(a)))


def test_step_derivatives_finite_difference(panda):
    """jacfwd of the augmented step must match finite differences."""
    model, params = panda
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.concatenate(
        [PANDA_Q_READY + 0.1 * rng.normal(size=7), 0.2 * rng.normal(size=7),
         rng.normal(size=3)]))
    u = jnp.asarray(rng.normal(size=7))
    step = lambda xx, uu: soft_contact_step(model, params, SC3, xx, uu, 0.01)
    Fx = jax.jacfwd(step, 0)(x, u)
    eps = 1e-6
    for i in [0, 5, 8, 15]:
        dx = jnp.zeros(17).at[i].set(eps)
        fd = (step(x + dx, u) - step(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Fx[:, i]), np.asarray(fd), atol=1e-5)


def force_ocp(model, params, T=20, dt=0.02):
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="grav_reg", kind="control_grav", weight=5e-3),
            CostItem(name="force_tracking", kind="force_tracking", weight=1.0,
                     update=True),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="force_tracking", kind="force_tracking", weight=1.0,
                     update=True),
        ),
        horizon=T,
        dt=dt,
        soft_contact=SC3,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    return spec, cf, refs


def test_force_tracking_ocp(panda):
    """Solve a force-tracking OCP: command a 10 N downward contact force; the
    solver must drive the force state toward f_des."""
    model, params = panda
    T = 20
    spec, cf, refs = force_ocp(model, params, T=T)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7), jnp.zeros(3)])
    Tn = T + 1
    refs["xref"] = jnp.tile(x0[None], (Tn, 1))
    refs["w_x"] = jnp.tile(
        jnp.concatenate([jnp.full(7, 0.05), jnp.full(7, 0.5), jnp.zeros(3)])[None],
        (Tn, 1))
    f_des = jnp.asarray([0.0, 0.0, -10.0])
    refs["f_des"] = jnp.tile(f_des[None], (Tn, 1))
    refs["w_force"] = jnp.full((Tn, 3), 2.0)

    xs0 = jnp.tile(x0[None], (Tn, 1))
    us0 = jnp.tile(dynamics.generalized_gravity(model, params, q0)[None], (T, 1))
    sol = solve_fddp(cf, x0, refs, xs0, us0, SolverSettings(max_iters=60))
    f_end = np.asarray(sol.xs[-1, 14:])
    e0 = np.linalg.norm(np.zeros(3) - np.asarray(f_des))
    e1 = np.linalg.norm(f_end - np.asarray(f_des))
    assert e1 < 0.35 * e0, f"force error {e1:.2f} N vs initial {e0:.2f} N"
    assert float(sol.gap_norm) < 1e-8


def test_ff_warm_start(panda):
    model, params = panda
    T = 4
    ws = WarmStartShiftPreviousSolutionForceFeedback()
    ws.setup(model, params, np.full(T, 0.01), SC1)
    xs = np.random.default_rng(0).normal(size=(T + 1, 15))
    us = np.random.default_rng(1).normal(size=(T, 7))
    ws.update_previous_solution(OCPResults(
        states=xs.copy(), ricatti_gains=np.zeros((T, 7, 15)),
        feed_forward_terms=us.copy()))
    pt = TrajectoryPoint(
        robot_configuration=PANDA_Q_READY, robot_velocity=np.zeros(7),
        forces={"panda_hand_tcp": np.asarray([0, 0, 0, 1.0, 2.0, 3.0])})
    x0, x_init, u_init = ws.generate(pt, [None] * (T + 1))
    # x0 = [q, v, measured force masked to z]
    assert x0.shape == (15,)
    np.testing.assert_allclose(x0[14], 3.0)
    np.testing.assert_allclose(x_init[0], xs[1])  # shifted


def test_batch_solvers_accept_soft_contact(panda):
    """The batch-native solvers (fddp_batch / sqp_batch) must run the
    force-augmented state and reach the vmapped solve_fddp optimum
    (VERDICT round-1 gap: they used to raise NotImplementedError)."""
    from agimus_controller_tpu.solver.csqp import CSQPSettings
    from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
    from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp

    model, params = panda
    T = 10
    spec, cf, refs = force_ocp(model, params, T=T)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7), jnp.zeros(3)])
    Tn = T + 1
    refs["xref"] = jnp.tile(x0[None], (Tn, 1))
    refs["w_x"] = jnp.tile(
        jnp.concatenate([jnp.full(7, 0.05), jnp.full(7, 0.5), jnp.zeros(3)])[None],
        (Tn, 1))
    f_des = jnp.asarray([0.0, 0.0, -10.0])
    refs["f_des"] = jnp.tile(f_des[None], (Tn, 1))
    refs["w_force"] = jnp.full((Tn, 3), 2.0)

    xs0 = jnp.tile(x0[None], (Tn, 1))
    us0 = jnp.tile(dynamics.generalized_gravity(model, params, q0)[None], (T, 1))
    sol_ref = solve_fddp(cf, x0, refs, xs0, us0, SolverSettings(max_iters=60))

    B = 2
    x0s = jnp.tile(x0[None], (B, 1))
    xs0b = jnp.tile(xs0[None], (B, 1, 1))
    us0b = jnp.tile(us0[None], (B, 1, 1))

    bfddp = jax.jit(make_batch_fddp(
        model, params, spec, cf, SolverSettings(max_iters=60)))
    sb = bfddp(x0s, refs, xs0b, us0b)
    assert bool(jnp.all(jnp.isfinite(sb.us)))
    np.testing.assert_allclose(
        np.asarray(sb.us[0]), np.asarray(sol_ref.us), atol=1e-6)
    # replicated rows identical
    np.testing.assert_array_equal(np.asarray(sb.us[0]), np.asarray(sb.us[1]))

    bsqp = jax.jit(make_batch_sqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=60, termination_tolerance=1e-6)))
    ss = bsqp(x0s, refs, xs0b, us0b)
    assert bool(jnp.all(jnp.isfinite(ss.us)))
    # same optimum (different solver family: compare controls loosely and
    # the terminal contact force tightly)
    np.testing.assert_allclose(
        np.asarray(ss.xs[0, -1, 14:]), np.asarray(sol_ref.xs[-1, 14:]),
        atol=0.3)
    assert float(jnp.max(ss.gap_norm)) < 1e-5


def test_batch_sqp_contact_activation_from_refs(panda):
    """Per-node contact activation is a runtime refs array: zeroing it must
    freeze the force state along the horizon (reference mutates
    `dam.active_contact`; here it's data)."""
    from agimus_controller_tpu.solver.csqp import CSQPSettings
    from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp

    model, params = panda
    T = 6
    spec, cf, refs = force_ocp(model, params, T=T)
    q0 = jnp.asarray(PANDA_Q_READY)
    f0 = jnp.asarray([0.0, 0.0, 5.0])
    x0 = jnp.concatenate([q0, jnp.zeros(7), f0])
    Tn = T + 1
    refs["xref"] = jnp.tile(x0[None], (Tn, 1))
    refs["w_force"] = jnp.zeros((Tn, 3))
    refs["contact_active"] = jnp.zeros((Tn,), jnp.float64)

    xs0 = jnp.tile(x0[None], (Tn, 1))
    us0 = jnp.tile(dynamics.generalized_gravity(model, params, q0)[None], (T, 1))
    bsqp = jax.jit(make_batch_sqp(
        model, params, spec, cf, CSQPSettings(max_iters=10)))
    ss = bsqp(x0[None], refs, xs0[None], us0[None])
    # inactive contact: force state rides along unchanged
    np.testing.assert_allclose(
        np.asarray(ss.xs[0, :, 14:]),
        np.tile(np.asarray(f0)[None], (Tn, 1)), atol=1e-8)
