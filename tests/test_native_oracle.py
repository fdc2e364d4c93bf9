"""Cross-language full-solve oracle: JAX FDDP vs the independent C++ iLQR.

BASELINE.md accuracy north star: u[0..T] error < 1e-4 vs an independent
FDDP on the same goal-reaching horizon (the reference validated against
Crocoddyl, `tests/test_ocp_croco_base.py:175-204`; Crocoddyl is not
installable here, so `native/fddp_oracle.cpp` — a from-scratch C++ solver
sharing only the model constants — plays that part).  Both solvers converge
the strictly convex OCP hard; their optima must agree regardless of path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.native.bindings import NativeFDDP
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import CostItem, ProblemSpec, default_references
from agimus_controller_tpu.ops import kinematics
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp


pytestmark = pytest.mark.slow  # full C++ oracle solve + JAX compile (VERDICT r03 #8: default tier budget)


def test_jax_solve_matches_cpp_oracle():
    T, dt = 20, 0.02
    w_state, w_ctrl, w_goal = 0.1, 1e-3, 50.0
    dtype = jnp.float64
    model, params = load_panda()
    nj = model.nj
    nx = 2 * nj

    q0 = np.asarray(PANDA_Q_READY, np.float64)
    x0 = np.concatenate([q0, np.zeros(nj)])
    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(
        model, params, jnp.asarray(q0, dtype), fid)
    R0 = np.asarray(R0, np.float64)
    goal_p = np.asarray(p0, np.float64) + np.array([0.08, 0.05, -0.05])

    # --- JAX side -----------------------------------------------------
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=w_state,
                     static_ref=tuple(x0), act_weights=(1.0,) * nx),
            CostItem(name="ctrl", kind="control", weight=w_ctrl,
                     act_weights=(1.0,) * nj),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=w_goal,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T, dt=dt,
    )
    cf = build_cost_functions(model, params, spec, dtype=dtype)
    refs = default_references(spec, model, dtype=dtype)
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(
        jnp.asarray(R0, dtype)[None], (T + 1, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        jnp.asarray(goal_p, dtype)[None], (T + 1, 1))
    refs["w_ee:panda_hand_tcp"] = jnp.ones((T + 1, 6), dtype)
    x0j = jnp.asarray(x0, dtype)
    xs0 = jnp.tile(x0j[None], (T + 1, 1))
    us0 = jnp.zeros((T, nj), dtype)
    st = SolverSettings(max_iters=200, termination_tolerance=1e-9,
                        n_alphas=10)
    sol = solve_fddp(cf, x0j, refs, xs0, us0, st)
    assert float(sol.kkt) < 1e-7, f"JAX solve did not converge: {sol.kkt}"

    # --- C++ oracle ---------------------------------------------------
    fr = model.frames[fid]
    oracle = NativeFDDP(model, params)
    rc, xs_c, us_c, kkt_c, iters_c = oracle.solve(
        T=T, dt=dt, w_state=w_state, w_ctrl=w_ctrl, w_goal=w_goal,
        xref=x0, frame_joint=fr.parent_joint,
        frame_rot=np.asarray(params.frame_rot)[fid],
        frame_trans=np.asarray(params.frame_trans)[fid],
        goal_rot=R0, goal_trans=goal_p, x0=x0,
        max_iters=200, tol=1e-9)
    assert rc == 0, f"C++ oracle did not converge: kkt={kkt_c}"

    u_err = np.max(np.abs(np.asarray(sol.us, np.float64) - us_c))
    x_err = np.max(np.abs(np.asarray(sol.xs, np.float64) - xs_c))
    assert u_err < 1e-4, f"u-trajectory disagreement vs oracle: {u_err}"
    assert x_err < 1e-5, f"x-trajectory disagreement vs oracle: {x_err}"
