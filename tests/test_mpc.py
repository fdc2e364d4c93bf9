"""MPC orchestration tests.

Follows the reference's mock-backend pattern (`tests/test_mpc_unicycle.py`):
a trivially-cheap unicycle OCP exercises the receding-horizon loop end to end
(buffer/time coherence over many iterations, closed-loop consistency
`res.states[1] == integrate(x, us[0])`) without any robot model; warm-start
math is validated independently (`tests/test_warm_start_reference.py`,
`test_warm_start_shift_previous_reference.py` patterns).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.mpc.buffer import (
    DTFactorsNSeq,
    TrajectoryBuffer,
    TrajectoryPoint,
    TrajectoryPointWeights,
    WeightedTrajectoryPoint,
    interpolate_weights,
)
from agimus_controller_tpu.mpc.data import OCPDebugData, OCPResults
from agimus_controller_tpu.mpc.mpc import MPC
from agimus_controller_tpu.mpc.ocp_base import OCPBase
from agimus_controller_tpu.mpc.warm_start import (
    WarmStartBase,
    WarmStartReference,
    WarmStartShiftPreviousSolution,
)
from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import CostFunctions, StageDerivs, TerminalDerivs
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from agimus_controller_tpu.ops import dynamics


# ---------------------------------------------------------------------------
# cheap unicycle backend (reference `test_mpc_unicycle.py:18-117` pattern)
# ---------------------------------------------------------------------------

DT = 0.1


def make_unicycle_cf(T, xrefs_holder):
    """Unicycle tracking OCP; references read from a mutable holder so the
    OCP facade can swap them per tick."""
    import jax

    def step(x, u, t, refs=None):
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        return x + DT * jnp.asarray([u[0] * c, u[0] * s, u[1]])

    def stage_cost(x, u, t, refs):
        e = x - refs["xref"][t]
        return DT * (5.0 * jnp.sum(e * e) + 0.1 * jnp.sum(u * u))

    def terminal_cost(x, refs):
        e = x - refs["xref"][T]
        return 5.0 * jnp.sum(e * e)

    def stage_derivs(x, u, t, refs):
        l = stage_cost(x, u, t, refs)
        lx = jax.grad(stage_cost, 0)(x, u, t, refs)
        lu = jax.grad(stage_cost, 1)(x, u, t, refs)
        lxx = jax.hessian(stage_cost, 0)(x, u, t, refs)
        luu = jax.hessian(stage_cost, 1)(x, u, t, refs)
        lxu = jnp.zeros((3, 2))
        Fx = jax.jacfwd(step, 0)(x, u, t)
        Fu = jax.jacfwd(step, 1)(x, u, t)
        return StageDerivs(l, lx, lu, lxx, lxu, luu, step(x, u, t, refs), Fx, Fu)

    def terminal_derivs(x, refs):
        import jax as _j
        return TerminalDerivs(
            terminal_cost(x, refs),
            _j.grad(terminal_cost)(x, refs),
            _j.hessian(terminal_cost)(x, refs),
        )

    return CostFunctions(
        step=step, stage_cost=stage_cost, terminal_cost=terminal_cost,
        stage_derivs=stage_derivs, terminal_derivs=terminal_derivs,
        constraints=lambda *a: None, constraint_derivs=lambda *a: None,
        n_constraints=0, terminal_constraint_mask=(), terminal_constraint_row_mask=(),
    )


class UnicycleOCP(OCPBase):
    def __init__(self, T):
        import jax

        self._T = T
        self._cf = make_unicycle_cf(T, None)
        self._refs = {"xref": jnp.zeros((T + 1, 3))}
        self._results = None
        self._debug = OCPDebugData()
        self._solve = jax.jit(
            lambda x0, refs, xs, us: solve_fddp(
                self._cf, x0, refs, xs, us, SolverSettings(max_iters=20)
            )
        )
        self.horizon_seen = []

    @property
    def n_controls(self):
        return self._T

    @property
    def dt(self):
        return DT

    def set_reference_weighted_trajectory(self, pts):
        self.horizon_seen.append([wp.point.id for wp in pts])
        xref = np.stack([
            np.concatenate([wp.point.robot_configuration, wp.point.robot_velocity])
            for wp in pts
        ])
        self._refs = {"xref": jnp.asarray(xref)}

    def solve(self, x0, x_ws, u_ws, use_iteration_limits_and_timeout=True):
        sol = self._solve(jnp.asarray(x0), self._refs, jnp.asarray(np.stack(x_ws)),
                          jnp.asarray(np.stack(u_ws)))
        self._results = OCPResults(
            states=np.asarray(sol.xs), ricatti_gains=np.asarray(sol.K),
            feed_forward_terms=np.asarray(sol.us))
        self._debug.kkt_norm = float(sol.kkt)
        self._debug.problem_solved = bool(sol.converged)
        return self._results

    def integrate(self, state, control):
        return np.asarray(self._cf.step(jnp.asarray(state), jnp.asarray(control), 0, self._refs))

    @property
    def ocp_results(self):
        return self._results

    @property
    def debug_data(self):
        return self._debug


class UnicycleWarmStart(WarmStartBase):
    def setup(self, *args):
        pass

    def generate(self, initial_state, reference_trajectory):
        x0 = initial_state.robot_state
        x_init = [np.asarray(x0)] + [p.robot_state for p in reference_trajectory[1:]]
        u_init = [np.zeros(2) for _ in range(len(reference_trajectory) - 1)]
        return np.asarray(x0), x_init, u_init


def unicycle_point(i, t_ns):
    # circle reference
    th = 0.02 * i
    pt = TrajectoryPoint(
        id=i, time_ns=t_ns,
        robot_configuration=np.asarray([np.cos(th) - 1.0, np.sin(th)]),
        robot_velocity=np.asarray([th + np.pi / 2]),
    )
    w = TrajectoryPointWeights(
        w_robot_configuration=np.ones(2), w_robot_velocity=np.ones(1))
    return WeightedTrajectoryPoint(point=pt, weights=w)


def test_mpc_unicycle_receding_horizon():
    T = 10
    buffer = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[T]))
    ocp = UnicycleOCP(T)
    ws = UnicycleWarmStart()
    mpc = MPC()
    mpc.setup(ocp, ws, buffer)

    n_iters = 100
    for i in range(T + 1):
        mpc.append_trajectory_point(unicycle_point(i, int(i * DT * 1e9)))
    next_id = T + 1

    x = np.asarray([0.0, 0.0, np.pi / 2])
    state = TrajectoryPoint(
        id=0, time_ns=0, robot_configuration=x[:2], robot_velocity=x[2:])
    for it in range(n_iters):
        res = mpc.run(state, int(it * DT * 1e9))
        assert res is not None
        # horizon head must track the iteration (reference `:194-211`)
        assert ocp.horizon_seen[-1][0] == it
        # closed-loop consistency: next predicted state == integrate(x, u0)
        np.testing.assert_allclose(
            res.states[1], ocp.integrate(state.robot_state, res.feed_forward_terms[0]),
            atol=1e-10)
        # apply first control
        xn = ocp.integrate(state.robot_state, res.feed_forward_terms[0])
        state = TrajectoryPoint(
            id=it + 1, time_ns=int((it + 1) * DT * 1e9),
            robot_configuration=xn[:2], robot_velocity=xn[2:])
        mpc.append_trajectory_point(unicycle_point(next_id, int(next_id * DT * 1e9)))
        next_id += 1

    # tracking: the closed loop must stay near the reference circle
    ref = unicycle_point(n_iters, 0).point
    err = np.linalg.norm(state.robot_configuration - ref.robot_configuration)
    assert err < 0.2, f"tracking error {err}"
    # timers populated
    dbg = mpc.mpc_debug_data
    assert dbg.duration_iteration_ns > 0
    assert dbg.duration_ocp_solve_ns > 0
    assert dbg.reference_id == n_iters - 1


def test_mpc_underfilled_buffer_returns_none():
    T = 10
    buffer = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[T]))
    mpc = MPC()
    mpc.setup(UnicycleOCP(T), UnicycleWarmStart(), buffer)
    state = TrajectoryPoint(
        id=0, time_ns=0, robot_configuration=np.zeros(2), robot_velocity=np.zeros(1))
    assert mpc.run(state, 0) is None


# ---------------------------------------------------------------------------
# buffer semantics (reference `tests/test_buffer.py` pattern)
# ---------------------------------------------------------------------------

def test_horizon_indexes_uniform():
    buf = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[4]))
    assert buf.horizon_indexes == [0, 1, 2, 3, 4]


def test_horizon_indexes_multi_resolution():
    buf = TrajectoryBuffer(DTFactorsNSeq(factors=[1, 2], n_steps=[2, 2]))
    assert buf.horizon_indexes == [0, 1, 2, 4, 6]
    buf = TrajectoryBuffer(DTFactorsNSeq(factors=[1, 2, 4], n_steps=[2, 2, 1]))
    assert buf.horizon_indexes == [0, 1, 2, 4, 6, 10]


def test_buffer_horizon_extraction_and_clear_past():
    buf = TrajectoryBuffer(DTFactorsNSeq(factors=[1, 2], n_steps=[2, 1]))
    for i in range(6):
        buf.append(unicycle_point(i, i))
    assert [wp.point.id for wp in buf.horizon] == [0, 1, 2, 4]
    buf.clear_past()
    assert len(buf) == 5
    assert [wp.point.id for wp in buf.horizon] == [1, 2, 3, 5]
    with pytest.raises(AssertionError):
        TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[10])).horizon


def test_interpolate_weights():
    w1 = TrajectoryPointWeights(
        w_robot_configuration=np.zeros(2), w_robot_velocity=np.ones(2),
        w_end_effector_poses={"ee": np.ones(6)}, w_collision_avoidance=0.0)
    w2 = TrajectoryPointWeights(
        w_robot_configuration=np.ones(2) * 2, w_robot_velocity=np.ones(2),
        w_end_effector_poses={"ee": np.ones(6) * 3, "other": np.ones(6) * 4},
        w_collision_avoidance=1.0)
    w = interpolate_weights(w1, w2, 0.5)
    np.testing.assert_allclose(w.w_robot_configuration, [1.0, 1.0])
    np.testing.assert_allclose(w.w_end_effector_poses["ee"], np.full(6, 2.0))
    np.testing.assert_allclose(w.w_end_effector_poses["other"], np.full(6, 2.0))
    assert w.w_collision_avoidance == 0.5


# ---------------------------------------------------------------------------
# warm starts on the Panda model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_warm_start_reference(panda):
    model, params = panda
    ws = WarmStartReference()
    ws.setup(model, params)
    rng = np.random.default_rng(0)
    pts = [
        TrajectoryPoint(
            id=i, time_ns=i,
            robot_configuration=PANDA_Q_READY + 0.05 * rng.normal(size=7),
            robot_velocity=0.1 * rng.normal(size=7),
            robot_acceleration=0.1 * rng.normal(size=7),
        )
        for i in range(5)
    ]
    x0pt = TrajectoryPoint(
        robot_configuration=PANDA_Q_READY, robot_velocity=np.zeros(7))
    x0, x_init, u_init = ws.generate(x0pt, pts)
    np.testing.assert_allclose(x0, x0pt.robot_state)
    assert len(x_init) == 5 and len(u_init) == 4
    np.testing.assert_allclose(x_init[0], x0pt.robot_state)
    np.testing.assert_allclose(x_init[2], pts[2].robot_state)
    # u_init must equal RNEA recomputed independently per point
    expect = dynamics.rnea(
        model, params,
        jnp.asarray(pts[1].robot_configuration),
        jnp.asarray(pts[1].robot_velocity),
        jnp.asarray(pts[1].robot_acceleration))
    np.testing.assert_allclose(u_init[1], np.asarray(expect), atol=1e-9)


def test_warm_start_shift_uniform(panda):
    model, params = panda
    T = 4
    ws = WarmStartShiftPreviousSolution()
    ws.setup(model, params, np.full(T, 0.01))
    xs = np.arange((T + 1) * 14, dtype=float).reshape(T + 1, 14)
    us = np.arange(T * 7, dtype=float).reshape(T, 7)
    ws.update_previous_solution(OCPResults(
        states=xs.copy(), ricatti_gains=np.zeros((T, 7, 14)),
        feed_forward_terms=us.copy()))
    x0pt = TrajectoryPoint(
        robot_configuration=np.zeros(7), robot_velocity=np.zeros(7))
    _, x_init, u_init = ws.generate(x0pt, [None] * (T + 1))
    # uniform dt: pure shift, last two controls equal (reference `:95-99`)
    np.testing.assert_allclose(x_init[:T], xs[1:])
    np.testing.assert_allclose(x_init[T], xs[T])
    np.testing.assert_allclose(u_init[: T - 1], us[1:])
    np.testing.assert_allclose(u_init[T - 1], us[T - 1])


def test_warm_start_shift_non_uniform(panda):
    """Non-uniform horizon (factors [1,2]): coarse nodes re-integrate instead
    of copying (reference `test_warm_start_shift_previous_reference.py:49-121`)."""
    model, params = panda
    from agimus_controller_tpu.ops import integrator

    dt = 0.01
    timesteps = np.asarray([dt, dt, 2 * dt, 2 * dt])
    T = len(timesteps)
    ws = WarmStartShiftPreviousSolution()
    ws.setup(model, params, timesteps)
    rng = np.random.default_rng(1)
    xs = np.concatenate(
        [PANDA_Q_READY + 0.1 * rng.normal(size=(T + 1, 7)),
         0.1 * rng.normal(size=(T + 1, 7))], axis=1)
    us = 0.5 * rng.normal(size=(T, 7))
    ws.update_previous_solution(OCPResults(
        states=xs.copy(), ricatti_gains=np.zeros((T, 7, 14)),
        feed_forward_terms=us.copy()))
    x0pt = TrajectoryPoint(robot_configuration=np.zeros(7), robot_velocity=np.zeros(7))
    _, x_init, u_init = ws.generate(x0pt, [None] * (T + 1))
    # fine nodes shift
    np.testing.assert_allclose(x_init[0], xs[1])
    np.testing.assert_allclose(x_init[1], xs[2])
    # coarse nodes re-integrate with base dt and keep their control
    expect2 = integrator.euler_step(
        model, params, jnp.asarray(xs[2]), jnp.asarray(us[2]), dt)
    np.testing.assert_allclose(x_init[2], np.asarray(expect2), atol=1e-12)
    np.testing.assert_allclose(u_init[2], us[2])
