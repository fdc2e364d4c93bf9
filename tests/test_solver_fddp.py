"""FDDP solver validation.

1. Exact-LQR test: on a linear-quadratic problem the solver must reproduce
   the analytic discrete-time Riccati solution to machine precision in one
   iteration (independent numpy recursion as ground truth).
2. Panda goal-reaching OCP (pattern of reference
   `tests/test_ocp_croco_goal_reaching.py:63-119`): terminal EE within 10 cm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import (
    CostFunctions,
    StageDerivs,
    TerminalDerivs,
    build_cost_functions,
)
from agimus_controller_tpu.ocp.spec import CostItem, ProblemSpec, default_references
from agimus_controller_tpu.ops import kinematics
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


def make_lqr(nx=4, nu=2, T=30, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(np.eye(nx) + 0.01 * rng.normal(size=(nx, nx)))
    B = jnp.asarray(0.1 * rng.normal(size=(nx, nu)))
    Q = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, nx)))
    R = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, nu)))
    Qf = jnp.asarray(np.diag(rng.uniform(1.0, 5.0, nx)))

    def step(x, u, t, refs=None):
        return A @ x + B @ u

    def stage_cost(x, u, t, refs):
        return 0.5 * (x @ Q @ x + u @ R @ u)

    def terminal_cost(x, refs):
        return 0.5 * x @ Qf @ x

    def stage_derivs(x, u, t, refs):
        return StageDerivs(
            stage_cost(x, u, t, refs), Q @ x, R @ u, Q,
            jnp.zeros((nx, nu)), R, step(x, u, t, refs), A, B,
        )

    def terminal_derivs(x, refs):
        return TerminalDerivs(terminal_cost(x, refs), Qf @ x, Qf)

    cf = CostFunctions(
        step=step, stage_cost=stage_cost, terminal_cost=terminal_cost,
        stage_derivs=stage_derivs, terminal_derivs=terminal_derivs,
        constraints=lambda *a: None, constraint_derivs=lambda *a: None,
        n_constraints=0, terminal_constraint_mask=(), terminal_constraint_row_mask=(),
    )
    return cf, (np.asarray(A), np.asarray(B), np.asarray(Q), np.asarray(R), np.asarray(Qf)), T


def lqr_reference_solution(mats, x0, T):
    """Independent numpy Riccati recursion + rollout."""
    A, B, Q, R, Qf = mats
    P = Qf.copy()
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    xs, us = [np.asarray(x0)], []
    for t in range(T):
        u = -Ks[t] @ xs[-1]
        us.append(u)
        xs.append(A @ xs[-1] + B @ u)
    return np.stack(xs), np.stack(us)


def test_fddp_matches_analytic_lqr():
    cf, mats, T = make_lqr()
    nx, nu = 4, 2
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=nx))
    xs_ref, us_ref = lqr_reference_solution(mats, x0, T)

    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu))
    sol = solve_fddp(cf, x0, {}, xs0, us0, SolverSettings(max_iters=3, termination_tolerance=1e-9))
    np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.xs), xs_ref, atol=1e-8)
    assert bool(sol.converged)
    assert float(sol.kkt) < 1e-9


def test_fddp_infeasible_warm_start_lqr():
    """Start from a wildly infeasible (random xs) warm start: gaps must close
    and the same optimum must be reached."""
    cf, mats, T = make_lqr()
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=4))
    xs_ref, us_ref = lqr_reference_solution(mats, x0, T)
    xs0 = jnp.asarray(rng.normal(size=(T + 1, 4)))
    us0 = jnp.asarray(rng.normal(size=(T, 2)))
    sol = solve_fddp(cf, x0, {}, xs0, us0, SolverSettings(max_iters=10, termination_tolerance=1e-9))
    assert float(sol.gap_norm) < 1e-9
    np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=1e-7)


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def goal_reaching_problem(model, params, T=50, dt=0.02):
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="control_reg", kind="control_grav", weight=1e-3, update=False),
            CostItem(name="goal_tracking", kind="frame_placement", weight=10.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="goal_tracking", kind="frame_placement", weight=100.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T,
        dt=dt,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    return spec, cf, refs


def test_panda_goal_reaching(panda):
    """Solve a goal-reaching OCP; terminal EE must land within 10 cm of the
    target (reference asserts the same, `test_ocp_croco_goal_reaching.py`)."""
    model, params = panda
    T = 50
    spec, cf, refs = goal_reaching_problem(model, params, T=T)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])

    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, q0, fid)
    target = p0 + jnp.asarray([0.15, 0.10, -0.10])

    Tn = T + 1
    refs["xref"] = jnp.tile(x0[None], (Tn, 1))
    refs["w_x"] = jnp.tile(
        jnp.concatenate([jnp.full(7, 0.1), jnp.full(7, 1.0)])[None], (Tn, 1))
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(R0[None], (Tn, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(target[None], (Tn, 1))

    xs0 = jnp.tile(x0[None], (Tn, 1))
    us0 = jnp.zeros((T, 7))
    sol = solve_fddp(cf, x0, refs, xs0, us0,
                     SolverSettings(max_iters=100, termination_tolerance=1e-6))

    qT = sol.xs[-1, :7]
    _, pT = kinematics.frame_placement(model, params, qT, fid)
    err = float(jnp.linalg.norm(pT - target))
    assert err < 0.1, f"terminal EE error {err:.3f} m"
    assert float(sol.gap_norm) < 1e-8
    # dynamics feasibility: states must satisfy the integrator exactly
    x_roll = x0
    for t in range(T):
        x_roll = cf.step(x_roll, sol.us[t], t, refs)
    np.testing.assert_allclose(np.asarray(x_roll), np.asarray(sol.xs[-1]), atol=1e-8)


def test_panda_goal_reaching_cost_decreases(panda):
    model, params = panda
    spec, cf, refs = goal_reaching_problem(model, params, T=20)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (21, 1))
    xs0 = jnp.tile(x0[None], (21, 1))
    us0 = jnp.zeros((20, 7))
    from agimus_controller_tpu.solver.fddp import _total_cost

    c0 = _total_cost(cf, 20, xs0, us0, refs)
    sol = solve_fddp(cf, x0, refs, xs0, us0, SolverSettings(max_iters=20))
    assert float(sol.cost) < float(c0)
    assert int(sol.iters) <= 20
