"""CSQP constrained-solver validation.

1. No constraints: CSQP must reproduce the FDDP/analytic LQR solution.
2. Box-constrained LQR: independent ground truth from scipy SLSQP on the
   dense transcription of the same QP.
3. Panda with effort-limit constraints: solution saturates but respects
   bounds that the unconstrained solution violates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    ConstraintItem,
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.solver.csqp import CSQPSettings, solve_csqp
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from tests.test_solver_fddp import lqr_reference_solution, make_lqr

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


def make_constrained_lqr(u_max, nx=4, nu=2, T=10, seed=0):
    """LQR cf + control box constraints |u| <= u_max wired in manually."""
    cf, mats, _ = make_lqr(nx=nx, nu=nu, T=T, seed=seed)

    def constraints(x, u, t, refs):
        lb = jnp.full((nu,), -u_max)
        ub = jnp.full((nu,), u_max)
        return u, lb, ub

    def constraint_derivs(x, u, t, refs):
        g, lb, ub = constraints(x, u, t, refs)
        return g, lb, ub, jnp.zeros((nu, nx)), jnp.eye(nu)

    cf = cf._replace(
        constraints=constraints,
        constraint_derivs=constraint_derivs,
        n_constraints=nu,
        terminal_constraint_mask=(False,),
        terminal_constraint_row_mask=(False,) * nu,
    )
    return cf, mats, T


def slsqp_reference(mats, x0, T, u_max):
    """Dense-transcription ground truth via scipy SLSQP (independent code
    path: numpy rollout + box bounds on u)."""
    A, B, Q, R, Qf = mats
    nu = B.shape[1]

    def rollout(us_flat):
        us = us_flat.reshape(T, nu)
        x = np.asarray(x0)
        c = 0.0
        for t in range(T):
            c += 0.5 * (x @ Q @ x + us[t] @ R @ us[t])
            x = A @ x + B @ us[t]
        return c + 0.5 * x @ Qf @ x

    res = scipy.optimize.minimize(
        rollout, np.zeros(T * nu), method="SLSQP",
        bounds=[(-u_max, u_max)] * (T * nu),
        options={"maxiter": 500, "ftol": 1e-14},
    )
    assert res.success
    return res.x.reshape(T, nu)


def test_csqp_unconstrained_matches_lqr():
    cf, mats, T = make_lqr()
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=4))
    xs_ref, us_ref = lqr_reference_solution(mats, x0, T)
    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, 2))
    sol = solve_csqp(cf, x0, {}, xs0, us0,
                     CSQPSettings(max_iters=5, termination_tolerance=1e-8))
    np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=1e-7)
    assert float(sol.gap_norm) < 1e-9


def test_csqp_box_constrained_matches_slsqp():
    u_max = 0.6
    cf, mats, T = make_constrained_lqr(u_max)
    x0 = jnp.asarray(np.random.default_rng(2).normal(size=4) * 2.0)
    us_ref = slsqp_reference(mats, x0, T, u_max)
    assert np.max(np.abs(us_ref)) >= u_max - 1e-6, "test not binding; raise x0"

    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, 2))
    sol = solve_csqp(
        cf, x0, {}, xs0, us0,
        CSQPSettings(max_iters=20, max_qp_iters=500, eps_abs=1e-10,
                     termination_tolerance=1e-8, rho=1e-1),
    )
    # constraints respected
    assert float(jnp.max(jnp.abs(sol.us))) <= u_max + 1e-4
    # matches the independent SLSQP optimum
    np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=1e-4)
    assert float(sol.gap_norm) < 1e-8


def test_csqp_infeasible_warm_start():
    u_max = 0.6
    cf, mats, T = make_constrained_lqr(u_max)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.normal(size=4) * 2.0)
    us_ref = slsqp_reference(mats, x0, T, u_max)
    xs0 = jnp.asarray(rng.normal(size=(T + 1, 4)))
    us0 = jnp.asarray(rng.normal(size=(T, 2)))
    sol = solve_csqp(
        cf, x0, {}, xs0, us0,
        CSQPSettings(max_iters=30, max_qp_iters=500, eps_abs=1e-10,
                     termination_tolerance=1e-8, rho=1e-1),
    )
    assert float(sol.gap_norm) < 1e-7
    np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=2e-4)


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_csqp_panda_effort_limits(panda):
    """Aggressive goal + tight effort box: the constrained solution must
    saturate at the limits the unconstrained one exceeds."""
    model, params = panda
    T = 15
    u_lim = 12.0  # much tighter than the real 87 Nm on the big joints
    # shrink the model's effort limit so control_limit picks it up
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
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    from agimus_controller_tpu.ops import kinematics

    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, q0, fid)
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(R0[None], (T + 1, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        (p0 + jnp.asarray([0.3, 0.0, -0.2]))[None], (T + 1, 1))

    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, 7))
    # unconstrained FDDP exceeds the tight limit (aggressive target)
    from tests.test_solver_fddp import SolverSettings as FS
    sol_u = solve_fddp(cf, x0, refs, xs0, us0, SolverSettings(max_iters=50))
    assert float(jnp.max(jnp.abs(sol_u.us))) > u_lim

    sol_c = solve_csqp(
        cf, x0, refs, xs0, us0,
        # the honest KKT (r04) legitimately converges at the default 1e-3
        # with ~1e-3 gaps; this test wants a tight solve, so tighten the
        # termination tolerance to match its 1e-4 feasibility expectation
        CSQPSettings(max_iters=60, max_qp_iters=300, eps_abs=1e-8, rho=1e-1,
                     termination_tolerance=1e-5),
    )
    assert float(sol_c.gap_norm) < 1e-4
    assert float(jnp.max(jnp.abs(sol_c.us))) <= u_lim + 1e-5
    # still makes progress toward the goal
    assert float(sol_c.cost) < float(
        __import__("agimus_controller_tpu.solver.fddp", fromlist=["_total_cost"])._total_cost(
            cf, T, xs0, us0, refs)
    )
