"""Batch-native FDDP: must reproduce the single-scenario solver per row."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
from tests.test_solver_fddp import goal_reaching_problem

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_batch_fddp_matches_single(panda):
    model, params = panda
    T = 10
    spec, cf, refs = goal_reaching_problem(model, params, T=T, dt=0.02)
    from agimus_controller_tpu.ops import kinematics

    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, q0, fid)
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(R0[None], (T + 1, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        (p0 + jnp.asarray([0.1, 0.05, -0.05]))[None], (T + 1, 1))

    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * np.concatenate(
        [rng.normal(size=(B, 7)), np.zeros((B, 7))], axis=1))
    xs0 = jnp.tile(x0s[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))

    settings = SolverSettings(max_iters=12, termination_tolerance=1e-8)
    batch_solve = jax.jit(make_batch_fddp(model, params, spec, cf, settings))
    sol_b = batch_solve(x0s, refs, xs0, us0)

    for i in range(B):
        sol_i = solve_fddp(cf, x0s[i], refs, xs0[i], us0[i], settings)
        np.testing.assert_allclose(
            np.asarray(sol_b.us[i]), np.asarray(sol_i.us), atol=2e-6,
            err_msg=f"scenario {i}")
        np.testing.assert_allclose(
            np.asarray(sol_b.cost[i]), np.asarray(sol_i.cost), rtol=1e-6)
    assert np.all(np.asarray(sol_b.gap_norm) < 1e-8)
    assert np.all(np.asarray(sol_b.converged))


def test_batch_fddp_per_scenario_convergence(panda):
    """Scenarios start at different distances: the easy one converges in
    fewer iterations than the hard one (per-scenario masking)."""
    model, params = panda
    T = 8
    spec, cf, refs = goal_reaching_problem(model, params, T=T, dt=0.02)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))

    x0s = jnp.stack([x0, x0 + 0.4 * jnp.ones(14) * jnp.concatenate(
        [jnp.ones(7), jnp.zeros(7)])])
    xs0 = jnp.tile(x0s[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((2, T, 7))
    solve = jax.jit(make_batch_fddp(
        model, params, spec, cf, SolverSettings(max_iters=30,
                                                termination_tolerance=1e-6)))
    sol = solve(x0s, refs, xs0, us0)
    assert int(sol.iters[0]) <= int(sol.iters[1])
    assert np.all(np.asarray(sol.kkt) < 1e-2)


def test_batch_fddp_multi_resolution(panda):
    """Non-uniform horizon (DTFactorsNSeq semantics): batch solver must match
    the single-scenario solver on the same spec."""
    model, params = panda
    from agimus_controller_tpu.ocp.costs import build_cost_functions
    from agimus_controller_tpu.ocp.spec import CostItem, ProblemSpec, default_references

    T = 6
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=10.0, update=True),
        ),
        horizon=T, dt=0.01, dt_factor_n_seq=((1, 3), (2, 2), (4, 1)),
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    x0 = jnp.concatenate([jnp.asarray(PANDA_Q_READY), jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1)) + 0.05
    settings = SolverSettings(max_iters=8)
    solve_b = jax.jit(make_batch_fddp(model, params, spec, cf, settings))
    B = 2
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))
    sol_b = solve_b(x0s, refs, xs0, us0)
    sol_s = solve_fddp(cf, x0, refs, xs0[0], us0[0], settings)
    np.testing.assert_allclose(np.asarray(sol_b.us[0]), np.asarray(sol_s.us),
                               atol=2e-6)
