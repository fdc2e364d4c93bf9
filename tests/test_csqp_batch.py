"""Batch-native CSQP: must reproduce the single-scenario solver per row."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    ConstraintItem,
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.solver.csqp import CSQPSettings, solve_csqp
from agimus_controller_tpu.solver.csqp_batch import make_batch_csqp

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def constrained_goal_problem(model, params, T, u_lim):
    params_tight = params._replace(effort_limit=jnp.full(7, u_lim))
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05, update=True),
            CostItem(name="goal", kind="frame_placement", weight=50.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=200.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        constraints=(ConstraintItem(name="ctrl_box", kind="control_limit"),),
        horizon=T,
        dt=0.02,
    )
    cf = build_cost_functions(model, params_tight, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    from agimus_controller_tpu.ops import kinematics

    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, q0, fid)
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(R0[None], (T + 1, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        (p0 + jnp.asarray([0.3, 0.0, -0.2]))[None], (T + 1, 1))
    return spec, cf, refs, x0, params_tight


def test_batch_csqp_matches_single(panda):
    model, params = panda
    T = 10
    u_lim = 12.0
    spec, cf, refs, x0, params_tight = constrained_goal_problem(
        model, params, T, u_lim)

    B = 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * np.concatenate(
        [rng.normal(size=(B, 7)), np.zeros((B, 7))], axis=1))
    xs0 = jnp.tile(x0s[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))

    settings = CSQPSettings(
        max_iters=20, max_qp_iters=200, eps_abs=1e-10,
        termination_tolerance=1e-8, rho=1e-1)
    batch_solve = jax.jit(
        make_batch_csqp(model, params_tight, spec, cf, settings))
    sol_b = batch_solve(x0s, refs, xs0, us0)

    # constraints respected, dynamics feasible
    assert float(jnp.max(jnp.abs(sol_b.us))) <= u_lim + 1e-5
    assert np.all(np.asarray(sol_b.gap_norm) < 1e-5)

    for i in range(B):
        sol_i = solve_csqp(cf, x0s[i], refs, xs0[i], us0[i], settings)
        np.testing.assert_allclose(
            np.asarray(sol_b.us[i]), np.asarray(sol_i.us), atol=5e-5,
            err_msg=f"scenario {i}")
        np.testing.assert_allclose(
            np.asarray(sol_b.cost[i]), np.asarray(sol_i.cost), rtol=1e-5)


def test_batch_csqp_unconstrained_matches_fddp_batch(panda):
    """With no constraints and a strongly-regularized (effectively convex)
    tracking OCP, batch CSQP and batch FDDP must find the same optimum."""
    model, params = panda
    from agimus_controller_tpu.solver.fddp import SolverSettings
    from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp

    T = 8
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=2.0, update=True),
            CostItem(name="ctrl", kind="control", weight=0.1, update=True),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=20.0, update=True),
        ),
        horizon=T, dt=0.02,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1)) + 0.05

    B = 2
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))
    csqp = jax.jit(make_batch_csqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=40, termination_tolerance=1e-10)))
    fddp = jax.jit(make_batch_fddp(
        model, params, spec, cf,
        SolverSettings(max_iters=40, termination_tolerance=1e-10)))
    sol_c = csqp(x0s, refs, xs0, us0)
    sol_f = fddp(x0s, refs, xs0, us0)
    np.testing.assert_allclose(
        np.asarray(sol_c.us), np.asarray(sol_f.us), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sol_c.cost), np.asarray(sol_f.cost), rtol=1e-8)


def test_batch_csqp_per_scenario_qp_and_convergence(panda):
    """Different x0 difficulty => per-scenario SQP iteration counts; QP
    early-exit keeps qp_iters bounded by max."""
    model, params = panda
    T = 8
    spec, cf, refs, x0, params_tight = constrained_goal_problem(
        model, params, T, u_lim=20.0)
    x0_hard = x0 + 0.3 * jnp.concatenate([jnp.ones(7), jnp.zeros(7)])
    x0s = jnp.stack([x0, x0_hard])
    xs0 = jnp.tile(x0s[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((2, T, 7))
    settings = CSQPSettings(max_iters=30, max_qp_iters=100, eps_abs=1e-8,
                            termination_tolerance=1e-6)
    solve = jax.jit(make_batch_csqp(model, params_tight, spec, cf, settings))
    sol = solve(x0s, refs, xs0, us0)
    assert np.all(np.asarray(sol.qp_iters) <=
                  settings.max_iters * settings.max_qp_iters)
    assert np.all(np.asarray(sol.gap_norm) < 1e-4)
    assert float(jnp.max(jnp.abs(sol.us))) <= 20.0 + 1e-5
