"""Independent accuracy oracle for the CONSTRAINED solver (VERDICT r03 #3).

The reference's runtime solver is CSQP (`ocp_base_croco.py:64-80`); round 3
pinned only the unconstrained optimum against the C++ FDDP oracle. Here the
control-bounded + collision keep-away Panda OCP is solved independently by

  - OUR batch CSQP (`make_batch_sqp` with constraints, f64, tight KKT), and
  - a from-scratch single-shooting NLP: scipy SLSQP over a rollout whose
    dynamics come from the NATIVE C++ kernels (`native/rbd_kernels.cpp` —
    an independent RNEA/CRBA/Cholesky implementation) and whose collision
    distances come from an independent numpy FK + point-segment formula
    written in this file. Only the compiled model constants are shared.

Pass criteria (BASELINE.md accuracy target; the u-space valley of this
cost scaling is FLAT — ctrl curvature dt*w_u ~ 2e-5 — so independently
cold-started solvers agree in COST and STATES long before their u's do):
  1. optimality certificate: SLSQP POLISHING from our solution moves it by
     max|du| < 1e-4 — the independent NLP code certifies our point is the
     constrained optimum to the BASELINE tolerance,
  2. same optimum: a cold-started SLSQP reaches the same cost (<5e-5) and
     the same feasibility; its u's sit in the same flat valley.
"""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import optimize

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.native.bindings import NativeRBD
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    ConstraintItem,
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.ops import kinematics
from agimus_controller_tpu.solver.csqp import CSQPSettings
from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp

pytestmark = pytest.mark.slow

T = 20
DT = 0.01
NU = 7
ULIM = 30.0
DMIN = 0.03

ENV_URDF = """<?xml version="1.0"?>
<robot name="env"><link name="obstacle_base"/>
<joint name="obstacle_joint" type="fixed">
<parent link="obstacle_base"/><child link="obstacle"/>
<origin xyz="0.5 0.0 0.5" rpy="0 0 0"/></joint>
<link name="obstacle"><collision name="obstacle_sphere">
<geometry><sphere radius="0.1"/></geometry></collision></link></robot>"""


# ---------------------------------------------------------------------------
# independent numpy kinematics + collision distance (this file only)
# ---------------------------------------------------------------------------

def _axis_angle_np(ax, th):
    c, s, t = np.cos(th), np.sin(th), 1.0 - np.cos(th)
    x, y, z = ax
    return np.array([
        [t * x * x + c, t * x * y - s * z, t * x * z + s * y],
        [t * x * y + s * z, t * y * y + c, t * y * z - s * x],
        [t * x * z - s * y, t * y * z + s * x, t * z * z + c]])


def _joint_world_np(model, params, q):
    """World placements of every joint frame (independent FK)."""
    jr = np.asarray(params.joint_rot, np.float64)
    jt = np.asarray(params.joint_trans, np.float64)
    ax = np.asarray(params.axis, np.float64)
    Rs, ps = [], []
    for i in range(model.nj):
        if model.joint_types[i] == "revolute":
            Rl = jr[i] @ _axis_angle_np(ax[i], q[i])
            pl = jt[i]
        else:
            Rl = jr[i]
            pl = jt[i] + jr[i] @ (q[i] * ax[i])
        p = model.parents[i]
        if p < 0:
            Rs.append(Rl)
            ps.append(pl)
        else:
            Rs.append(Rs[p] @ Rl)
            ps.append(Rs[p] @ pl + ps[p])
    return Rs, ps


def _pair_distance_np(model, params, q, pair_id):
    """Signed capsule/sphere distance via point/segment projection
    (independent of `ops/collision.py`)."""
    gi, gj = model.collision_pairs[pair_id]
    Rs, ps = _joint_world_np(model, params, q)
    gR = np.asarray(params.geom_rot, np.float64)
    gp = np.asarray(params.geom_trans, np.float64)
    rad = np.asarray(params.geom_radius, np.float64)
    hl = np.asarray(params.geom_halflen, np.float64)

    def world(g):
        geo = model.geometries[g]
        if geo.parent_joint < 0:
            return gR[g], gp[g]
        return (Rs[geo.parent_joint] @ gR[g],
                Rs[geo.parent_joint] @ gp[g] + ps[geo.parent_joint])

    Ri, pi = world(gi)
    Rj, pj = world(gj)
    # capsule axes are the local z; a sphere is a capsule with halflen 0
    ai, aj = Ri[:, 2], Rj[:, 2]
    li, lj = float(hl[gi]), float(hl[gj])

    def seg_point(p0, d, l, x):
        if l <= 0:
            return p0
        s = np.clip((x - p0) @ d, -l, l)
        return p0 + s * d

    # alternate projections (converges for convex sets)
    ci, cj = pi, pj
    for _ in range(200):
        cj_new = seg_point(pj, aj, lj, ci)
        ci_new = seg_point(pi, ai, li, cj_new)
        if np.linalg.norm(ci_new - ci) < 1e-14 and \
           np.linalg.norm(cj_new - cj) < 1e-14:
            ci, cj = ci_new, cj_new
            break
        ci, cj = ci_new, cj_new
    return float(np.linalg.norm(ci - cj) - rad[gi] - rad[gj])


# ---------------------------------------------------------------------------

def test_constrained_optimum_cross_implementation():
    model, params = load_panda(
        dtype=np.float64, env_urdf=ENV_URDF,
        collision_pairs=[("panda_link7_capsule", "obstacle_sphere")])
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            # ctrl reg 0.5: strong enough to make u IDENTIFIABLE (the
            # 1e-4 du certificate needs curvature >> SLSQP's FD-gradient
            # noise floor; at 1e-3 the u-valley is flat and any NLP wanders
            # ~1 N·m at constant cost)
            CostItem(name="ctrl", kind="control", weight=0.5, update=True),
            CostItem(name="goal", kind="frame_translation", weight=50.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_translation", weight=500.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        constraints=(
            ConstraintItem(name="coll", kind="collision_distance", pair_id=0,
                           lower=(DMIN,)),
            ConstraintItem(name="ubox", kind="control_limit",
                           lower=(-ULIM,) * NU, upper=(ULIM,) * NU),
        ),
        horizon=T, dt=DT,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    q0 = np.asarray(PANDA_Q_READY)
    x0 = np.concatenate([q0, np.zeros(7)])
    fid = model.frame_id("panda_hand_tcp")
    _, p0 = kinematics.frame_placement(model, params, jnp.asarray(q0), fid)
    # goal chosen so the unconstrained optimum dips to ~0.022 m clearance:
    # with the 0.03 m band the collision constraint strictly binds while the
    # problem stays well-posed (a goal deep inside the obstacle stalls ANY
    # SQP in an infeasibility corner — ours plateaued at 4e-3 violation)
    goal = np.asarray([0.42, 0.05, 0.60])
    refs["xref"] = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    refs["w_x"] = jnp.tile(jnp.concatenate(
        [jnp.full(7, 0.1), jnp.full(7, 1.0)])[None], (T + 1, 1))
    refs["uref"] = jnp.zeros((T + 1, 7))
    refs["w_u"] = jnp.ones((T + 1, 7))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        jnp.asarray(goal)[None], (T + 1, 1))
    refs["w_ee:panda_hand_tcp"] = jnp.ones((T + 1, 6))

    # ---- OUR solver -------------------------------------------------------
    solver = jax.jit(make_batch_sqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=200, max_qp_iters=400, eps_abs=1e-12,
                     termination_tolerance=5e-7, reg_init=1e-9)))
    xs0 = jnp.tile(jnp.asarray(x0)[None, None], (1, T + 1, 1))
    us0 = jnp.zeros((1, T, NU))
    sol = solver(jnp.asarray(x0)[None], refs, xs0, us0)
    us_ours = np.asarray(sol.us[0])
    kkt = float(sol.kkt[0])
    assert bool(sol.converged[0]), f"our solver: kkt={kkt:.2e}"

    # the band must actually bind (otherwise this is not a constrained test)
    from agimus_controller_tpu.ops import collision

    d_ours = np.asarray([
        float(collision.pair_distance(
            model, params, jnp.asarray(np.asarray(sol.xs[0, t, :7])), 0))
        for t in range(1, T + 1)])
    assert d_ours.min() < DMIN + 5e-3, "keep-away never came close to binding"
    assert d_ours.min() > DMIN - 1e-4

    # ---- independent solver ----------------------------------------------
    native = NativeRBD(model, params)
    tau_g = native.rnea(q0, np.zeros(7), np.zeros(7))

    def rollout(us):
        us = us.reshape(T, NU)
        xs = np.zeros((T + 1, 14))
        xs[0] = x0
        for t in range(T):
            q, v = xs[t, :7], xs[t, 7:]
            a = native.forward_dynamics(q, v, us[t])
            v2 = v + DT * a
            xs[t + 1] = np.concatenate([q + DT * v2, v2])
        return xs

    w_x = np.concatenate([np.full(7, 0.1), np.full(7, 1.0)])

    def cost_np(us):
        us = us.reshape(T, NU)
        xs = rollout(us)
        c = 0.0
        for t in range(T):
            dx = xs[t] - x0
            c += DT * (0.1 * 0.5 * np.sum(w_x * dx * dx)
                       + 0.5 * 0.5 * np.sum(us[t] ** 2))
            _, pt = _ee_np(model, params, xs[t, :7], fid)
            c += DT * 50.0 * 0.5 * np.sum((pt - goal) ** 2)
        dx = xs[T] - x0
        # terminal: dt=0 convention -> only the terminal cost set (goal)
        _, pT = _ee_np(model, params, xs[T, :7], fid)
        c += 500.0 * 0.5 * np.sum((pT - goal) ** 2)
        return c

    def coll_np(us):
        xs = rollout(us)
        return np.asarray([
            _pair_distance_np(model, params, xs[t, :7], 0) - DMIN
            for t in range(T + 1)])

    # (1) OPTIMALITY CERTIFICATE: polish OUR solution with the independent
    # NLP code — if it is the constrained optimum, SLSQP must not move it
    res_pol = optimize.minimize(
        cost_np, us_ours.reshape(-1), method="SLSQP",
        bounds=[(-ULIM, ULIM)] * (T * NU),
        constraints=[{"type": "ineq", "fun": coll_np}],
        options={"maxiter": 300, "ftol": 1e-14},
    )
    du_pol = float(np.max(np.abs(res_pol.x.reshape(T, NU) - us_ours)))
    dcost_pol = float(cost_np(us_ours.reshape(-1)) - res_pol.fun)
    print(f"polish: max|du|={du_pol:.2e} cost gain={dcost_pol:.3e} "
          f"band min={d_ours.min():.4f}")
    assert du_pol < 1e-4, (
        f"independent polish moved the optimum: max|du|={du_pol:.3e}")

    # (2) SAME OPTIMUM from a cold start: cost + feasibility agreement
    # (u's live in the flat valley; compare what is well-determined)
    res_cold = optimize.minimize(
        cost_np, np.tile(tau_g, T), method="SLSQP",
        bounds=[(-ULIM, ULIM)] * (T * NU),
        constraints=[{"type": "ineq", "fun": coll_np}],
        options={"maxiter": 400, "ftol": 1e-10},
    )
    feas_cold = float(np.min(coll_np(res_cold.x)))
    assert res_cold.success or feas_cold > -1e-6, res_cold.message
    dcost = abs(cost_np(res_cold.x) - float(sol.cost[0]))
    du_cold = float(np.max(np.abs(res_cold.x.reshape(T, NU) - us_ours)))
    print(f"cold SLSQP: dcost={dcost:.2e} feas={feas_cold:.2e} "
          f"max|du|={du_cold:.2e} (flat valley)")
    assert dcost < 5e-5
    assert feas_cold > -1e-5


def _ee_np(model, params, q, fid):
    """Independent numpy FK of an operational frame."""
    Rs, ps = _joint_world_np(model, params, q)
    fr = model.frames[fid]
    fR = np.asarray(params.frame_rot[fid], np.float64)
    fp = np.asarray(params.frame_trans[fid], np.float64)
    if fr.parent_joint < 0:
        return fR, fp
    R = Rs[fr.parent_joint] @ fR
    p = Rs[fr.parent_joint] @ fp + ps[fr.parent_joint]
    return R, p
