"""Manifold (quaternion free-flyer) state through the BATCH solvers.

Round-3 VERDICT #2: the reference gets SE(3)-manifold state everywhere via
`StateMultibody` (`ocp_base_croco.py:36-41`); here the Lie-group hooks
(`state_diff`/`state_integrate`/`ntan`) must work in `fddp_batch`,
`sqp_batch` and `csqp_batch` — not just the single-scenario `solve_fddp`.

Covers: batch solvers agree with the single-scenario manifold FDDP;
a constrained (collision keep-away + control limits) free-flyer solve in
`sqp_batch` AT base pitch +pi/2 (the euler-singular orientation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import (
    PANDA_DEFAULT_ARMATURE,
    PANDA_Q_READY,
    PANDA_URDF,
)
from agimus_controller_tpu.models.urdf import build_model_from_urdf
from agimus_controller_tpu.ocp.ff_costs import build_ff_cost_functions
from agimus_controller_tpu.ocp.spec import ConstraintItem, CostItem, ProblemSpec
from agimus_controller_tpu.ops import lie, residuals
from agimus_controller_tpu.solver.csqp import CSQPSettings
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp

pytestmark = pytest.mark.slow  # free-flyer jacfwd solves: heavy CPU compiles

DTYPE = jnp.float64
T = 10
FRAME = "panda_hand_tcp"


def _quat_pitch(theta):
    return jnp.asarray(
        [0.0, np.sin(theta / 2), 0.0, np.cos(theta / 2)], DTYPE)


def _model(collision=False):
    kw = {}
    if collision:
        kw.update(
            env_urdf="""<?xml version="1.0"?>
<robot name="env"><link name="obstacle_base"/>
<joint name="obstacle_joint" type="fixed">
<parent link="obstacle_base"/><child link="obstacle"/>
<origin xyz="0.5 0.0 0.5" rpy="0 0 0"/></joint>
<link name="obstacle"><collision name="obstacle_sphere">
<geometry><sphere radius="0.1"/></geometry></collision></link></robot>""",
            robot_attachment_frame="panda_link0",
            collision_pairs=[("panda_link7_capsule", "obstacle_sphere")],
        )
    return build_model_from_urdf(
        PANDA_URDF, armature=PANDA_DEFAULT_ARMATURE,
        collision_as_capsule=True, gravity=(0.0, 0.0, 0.0),
        dtype=np.float64, free_flyer=True, **kw)


def _refs_and_start(model, params, quat, goal_shift):
    nv = model.nj
    x0 = lie.join_state(
        jnp.zeros(3), quat, jnp.asarray(PANDA_Q_READY, DTYPE), jnp.zeros(nv))
    fid = model.frame_id(FRAME)
    R0, p0 = lie.ff_frame_placement(model, params, x0, fid)
    goal_p = p0 + jnp.asarray(goal_shift, DTYPE)
    refs = {
        "xref": jnp.tile(x0[None], (T + 1, 1)),
        "w_x": jnp.tile(jnp.concatenate(
            [jnp.full(nv, 0.1), jnp.full(nv, 1.0)])[None].astype(DTYPE),
            (T + 1, 1)),
        "w_u": jnp.ones((T + 1, nv), DTYPE),
        "uref": jnp.zeros((T + 1, nv), DTYPE),
        f"ee_rot:{FRAME}": jnp.tile(R0[None], (T + 1, 1, 1)),
        f"ee_trans:{FRAME}": jnp.tile(goal_p[None], (T + 1, 1)),
        f"w_ee:{FRAME}": jnp.ones((T + 1, 6), DTYPE),
    }
    if "w_coll" in _needed_keys(model):
        refs["w_coll"] = jnp.ones((T + 1,), DTYPE)
    return x0, refs, goal_p, fid


def _needed_keys(model):
    return ()


def _spec(constrained=False):
    cons = ()
    if constrained:
        cons = (
            ConstraintItem(name="coll", kind="collision_distance",
                           pair_id=0, lower=(0.02,)),
            ConstraintItem(name="ulim", kind="control_limit"),
        )
    return ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05,
                     update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=100.0,
                     update=True, frame=FRAME),
        ),
        constraints=cons,
        horizon=T, dt=0.02,
    )


def test_batch_solvers_match_single_manifold_fddp():
    model, params = _model()
    spec = _spec()
    cf = build_ff_cost_functions(model, params, spec, dtype=DTYPE)
    nu = model.nj - lie.N_FF
    x0, refs, goal_p, fid = _refs_and_start(
        model, params, jnp.asarray([0., 0., 0., 1.], DTYPE),
        [0.03, 0.02, -0.02])
    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu), DTYPE)

    sol_f = solve_fddp(cf, x0, refs, xs0, us0,
                       SolverSettings(max_iters=60,
                                      termination_tolerance=1e-9))
    assert bool(sol_f.converged)

    B = 2
    x0b = jnp.stack([x0, x0])
    xsb = jnp.tile(xs0[None], (B, 1, 1))
    usb = jnp.tile(us0[None], (B, 1, 1))

    sqp = jax.jit(make_batch_sqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=60, termination_tolerance=1e-9,
                     reg_init=1e-8)))
    sol_s = sqp(x0b, refs, xsb, usb)
    assert bool(jnp.all(sol_s.converged))
    # identical scenarios must produce identical lanes
    np.testing.assert_allclose(
        np.asarray(sol_s.us[0]), np.asarray(sol_s.us[1]), atol=0)
    # agreement with the single-scenario solver at the (well-conditioned)
    # optimum: ctrl reg 1e-2 makes u identifiable
    assert float(jnp.max(jnp.abs(sol_s.us[0] - sol_f.us))) < 1e-4
    assert sol_s.K.shape == (B, T, nu, cf.ntan)

    fdp = jax.jit(make_batch_fddp(
        model, params, spec, cf,
        SolverSettings(max_iters=60, termination_tolerance=1e-9),
        riccati="dense"))
    sol_b = fdp(x0b, refs, xsb, usb)
    assert bool(jnp.all(sol_b.converged))
    assert float(jnp.max(jnp.abs(sol_b.us[0] - sol_f.us))) < 1e-4

    # physics: the EE moved most of the way to the goal (underactuated arm,
    # zero gravity, stiff ctrl reg + short T=10 horizon leave ~mm residual)
    _, pe = lie.ff_frame_placement(model, params, sol_s.xs[0, -1], fid)
    err0 = float(np.linalg.norm([0.03, 0.02, -0.02]))
    err = float(jnp.linalg.norm(pe - goal_p))
    assert err < 0.7 * err0, f"EE error {err} vs initial {err0}"


def test_csqp_batch_manifold_unconstrained_path():
    """make_batch_csqp in manifold mode (nc=0 exercises its sweep path)."""
    from agimus_controller_tpu.solver.csqp_batch import make_batch_csqp

    model, params = _model()
    spec = _spec()
    cf = build_ff_cost_functions(model, params, spec, dtype=DTYPE)
    nu = model.nj - lie.N_FF
    x0, refs, goal_p, fid = _refs_and_start(
        model, params, _quat_pitch(0.3), [0.02, 0.01, -0.02])
    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu), DTYPE)
    solver = jax.jit(make_batch_csqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=40, termination_tolerance=1e-8)))
    sol = solver(x0[None], refs, xs0[None], us0[None])
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    _, pe = lie.ff_frame_placement(model, params, sol.xs[0, -1], fid)
    err0 = float(np.linalg.norm([0.02, 0.01, -0.02]))
    assert float(jnp.linalg.norm(pe - goal_p)) < 0.7 * err0


def test_sqp_batch_manifold_collision_at_singular_pitch():
    """Constrained free-flyer solve in sqp_batch AT base pitch +pi/2: the
    goal pulls the EE into the keep-away band; the band must hold."""
    model, params = _model(collision=True)
    spec = _spec(constrained=True)
    cf = build_ff_cost_functions(model, params, spec, dtype=DTYPE)
    assert cf.n_constraints == 1 + (model.nj - lie.N_FF)
    nu = model.nj - lie.N_FF
    quat = _quat_pitch(np.pi / 2)
    x0, refs, goal_p, fid = _refs_and_start(model, params, quat,
                                            [0.0, 0.0, 0.0])
    refs["w_coll"] = jnp.ones((T + 1,), DTYPE)
    # aim the EE straight at the obstacle center (mounted on panda_link0):
    # obstacle sits at +x/+z of the base; push the goal into its band
    pr_obst = jnp.asarray(params.geom_trans[-1], DTYPE)

    def pair_dist(x):
        p, q4, qj, v = lie.split_state(model, x)
        pr = lie.recenter_params(model, params, p, q4)
        xc = jnp.concatenate([lie.chart_q(model, qj), v])
        return residuals.collision_distance_residual(model, pr, xc, 0)[0]

    d0 = float(pair_dist(x0))
    assert d0 > 0.02  # start outside the band
    # goal: the current EE position moved toward the obstacle by more than
    # the initial clearance (unconstrained optimum would violate the band)
    R0, p0 = lie.ff_frame_placement(model, params, x0, fid)
    refs[f"ee_trans:{FRAME}"] = jnp.tile(
        (p0 + jnp.asarray([0.30, 0.0, 0.30], DTYPE))[None], (T + 1, 1))

    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu), DTYPE)
    solver = jax.jit(make_batch_sqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=40, max_qp_iters=50, reg_init=1e-8,
                     termination_tolerance=1e-6)))
    sol = solver(x0[None], refs, xs0[None], us0[None])
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    # control limits respected
    lim = np.asarray(params.effort_limit)[-nu:]
    assert np.all(np.abs(np.asarray(sol.us[0])) <= lim * (1 + 1e-6))
    # keep-away band holds on all controllable nodes
    dists = np.asarray(jax.vmap(pair_dist)(sol.xs[0, 1:]))
    assert dists.min() > 0.02 - 2e-3, f"band violated: {dists.min():.4f}"
    # and the EE actually moved toward the goal (the constraint binds)
    _, pe = lie.ff_frame_placement(model, params, sol.xs[0, -1], fid)
    assert float(jnp.linalg.norm(pe - p0)) > 0.02


# ----------------------------------------------------------------------
# free-flyer completeness (VERDICT r04 #6): soft contact + visual
# servoing composed with the manifold state, as the reference composes
# any cost/dynamics with StateMultibody incl. a free-flyer base
# (`ocp_croco_generic_force_feedback.py:218-297`)
# ----------------------------------------------------------------------
def _soft_cfg():
    from agimus_controller_tpu.ops.soft_contact import SoftContactConfig

    return SoftContactConfig(
        frame=FRAME, Kp=(60.0, 60.0, 60.0), Kv=(6.0, 6.0, 6.0),
        ref="local")


def test_ff_soft_dynamics_matches_chart_at_identity_base():
    """At base pose = identity, the FF augmented dynamics must equal the
    fixed-base soft-contact dynamics evaluated on the chart state (the
    recentering is the identity there) — pins the FF composition to the
    already-validated vector-state implementation."""
    from agimus_controller_tpu.ops.soft_contact import (
        ff_soft_contact_dynamics,
        soft_contact_dynamics,
    )

    model, params = _model()
    sc = _soft_cfg()
    nv = model.nj
    rng = np.random.default_rng(3)
    qj = jnp.asarray(PANDA_Q_READY, DTYPE)
    v = jnp.asarray(rng.normal(0, 0.3, nv))
    f = jnp.asarray(rng.normal(0, 2.0, 3))
    u = jnp.asarray(rng.normal(0, 1.0, nv))
    x_ff = jnp.concatenate([lie.join_state(
        jnp.zeros(3), jnp.asarray([0., 0., 0., 1.], DTYPE), qj, v), f])
    x_chart = jnp.concatenate([lie.chart_q(model, qj), v, f])
    a_ff, fd_ff = ff_soft_contact_dynamics(model, params, sc, x_ff, u)
    a_cb, fd_cb = soft_contact_dynamics(model, params, sc, x_chart, u)
    np.testing.assert_allclose(np.asarray(a_ff), np.asarray(a_cb),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fd_ff), np.asarray(fd_cb),
                               rtol=1e-10, atol=1e-10)


def test_sqp_batch_manifold_soft_contact_at_singular_pitch():
    """FF force-feedback solve at base pitch +pi/2: force-augmented state
    through make_batch_sqp in manifold mode (the r04 `manifold + soft
    contact not supported yet` assert, now removed)."""
    model, params = _model()
    sc = _soft_cfg()
    nf = sc.nc
    nv = model.nj
    nu = nv - lie.N_FF
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05,
                     update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
            CostItem(name="force", kind="force_tracking", weight=1.0,
                     update=True),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05,
                     update=True),
        ),
        constraints=(
            ConstraintItem(name="fbox", kind="force_box",
                           lower=(-40.0,) * 3, upper=(40.0,) * 3),
        ),
        horizon=T, dt=0.02, soft_contact=sc,
    )
    cf = build_ff_cost_functions(model, params, spec, dtype=DTYPE)
    assert cf.ntan == 2 * nv + nf
    quat = _quat_pitch(np.pi / 2)
    f0 = jnp.asarray([2.0, -1.0, 1.5], DTYPE)
    x0 = jnp.concatenate([lie.join_state(
        jnp.zeros(3), quat, jnp.asarray(PANDA_Q_READY, DTYPE),
        jnp.zeros(nv)), f0])
    refs = {
        "xref": jnp.tile(x0[None], (T + 1, 1)),
        "w_x": jnp.tile(jnp.concatenate(
            [jnp.full(nv, 0.1), jnp.full(nv, 1.0),
             jnp.zeros(nf)])[None].astype(DTYPE), (T + 1, 1)),
        "w_u": jnp.ones((T + 1, nu), DTYPE),
        "uref": jnp.zeros((T + 1, nu), DTYPE),
        "contact_active": jnp.ones((T + 1,), DTYPE),
        "f_des": jnp.tile(jnp.asarray([0.0, 0.0, 3.0], DTYPE)[None],
                          (T + 1, 1)),
        "w_force": jnp.ones((T + 1, nf), DTYPE),
    }
    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu), DTYPE)
    solver = jax.jit(make_batch_sqp(
        model, params, spec, cf,
        CSQPSettings(max_iters=30, max_qp_iters=40, reg_init=1e-8,
                     termination_tolerance=1e-8)))
    sol = solver(x0[None], refs, xs0[None], us0[None])
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    assert bool(jnp.all(jnp.isfinite(sol.xs)))
    # multiple-shooting gaps closed: rollout of sol.us from x0 reproduces
    # sol.xs through the augmented manifold step
    x = x0
    for t in range(T):
        x = cf.step(x, sol.us[0, t], t, refs)
        err = float(jnp.max(jnp.abs(cf.state_diff(x, sol.xs[0, t + 1]))))
        assert err < 1e-6, f"gap at node {t}: {err}"
    # quaternion stays on the unit sphere through the solve
    quats = np.asarray(sol.xs[0][:, 3:7])
    np.testing.assert_allclose(np.linalg.norm(quats, axis=1), 1.0,
                               atol=1e-9)
    # force box respected
    f_traj = np.asarray(sol.xs[0][:, -nf:])
    assert np.all(np.abs(f_traj) <= 40.0 + 1e-6)
    # the force cost pulled the terminal force toward f_des relative to
    # the uncontrolled start
    err0 = float(jnp.linalg.norm(f0 - refs["f_des"][0]))
    errT = float(jnp.linalg.norm(sol.xs[0, -1, -nf:] - refs["f_des"][-1]))
    assert errT < err0, f"force error grew: {errT} vs {err0}"


def test_ff_visual_servoing_equals_precomposed_placement():
    """The FF visual-servoing cost must equal a frame-placement cost whose
    reference was pre-composed wMf = wMo * oMf (the reference composes the
    same product in `ResidualModelVisualServoing`)."""
    from agimus_controller_tpu.ops import spatial

    model, params = _model()
    nv = model.nj
    nu = nv - lie.N_FF
    spec_vs = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05,
                     update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
            CostItem(name="servo", kind="visual_servoing", weight=20.0,
                     update=True, frame=FRAME, object_frame="cam_obj"),
        ),
        terminal_costs=(
            CostItem(name="servo", kind="visual_servoing", weight=100.0,
                     update=True, frame=FRAME, object_frame="cam_obj"),
        ),
        horizon=T, dt=0.02,
    )
    spec_fp = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.05,
                     update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
            CostItem(name="servo", kind="frame_placement", weight=20.0,
                     update=True, frame=FRAME),
        ),
        terminal_costs=(
            CostItem(name="servo", kind="frame_placement", weight=100.0,
                     update=True, frame=FRAME),
        ),
        horizon=T, dt=0.02,
    )
    cf_vs = build_ff_cost_functions(model, params, spec_vs, dtype=DTYPE)
    cf_fp = build_ff_cost_functions(model, params, spec_fp, dtype=DTYPE)
    x0, refs, goal_p, fid = _refs_and_start(
        model, params, _quat_pitch(0.2), [0.02, 0.01, -0.02])
    # vision transform: rotate 0.1 rad about z, shift 2 cm
    wR = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.1])))
    wt = np.asarray([0.02, -0.01, 0.0])
    refs_vs = dict(refs)
    refs_vs["wMo_rot:cam_obj"] = jnp.tile(
        jnp.asarray(wR, DTYPE)[None], (T + 1, 1, 1))
    refs_vs["wMo_trans:cam_obj"] = jnp.tile(
        jnp.asarray(wt, DTYPE)[None], (T + 1, 1))
    # pre-composed placement refs for the equivalent problem
    R_ref = np.asarray(refs[f"ee_rot:{FRAME}"][0])
    p_ref = np.asarray(refs[f"ee_trans:{FRAME}"][0])
    Rc, pc = spatial.se3_mul(
        (jnp.asarray(wR, DTYPE), jnp.asarray(wt, DTYPE)),
        (jnp.asarray(R_ref, DTYPE), jnp.asarray(p_ref, DTYPE)))
    refs_fp = dict(refs)
    refs_fp[f"ee_rot:{FRAME}"] = jnp.tile(Rc[None], (T + 1, 1, 1))
    refs_fp[f"ee_trans:{FRAME}"] = jnp.tile(pc[None], (T + 1, 1))

    # pointwise cost equivalence at a random state
    rng = np.random.default_rng(11)
    dx = jnp.asarray(rng.normal(0, 0.05, cf_vs.ntan))
    xr = cf_vs.state_integrate(x0, dx)
    ur = jnp.asarray(rng.normal(0, 0.5, nu))
    for t in (0, T // 2):
        a = float(cf_vs.stage_cost(xr, ur, t, refs_vs))
        b = float(cf_fp.stage_cost(xr, ur, t, refs_fp))
        np.testing.assert_allclose(a, b, rtol=1e-12)
    np.testing.assert_allclose(
        float(cf_vs.terminal_cost(xr, refs_vs)),
        float(cf_fp.terminal_cost(xr, refs_fp)), rtol=1e-12)

    # and the solved trajectories coincide
    xs0 = jnp.tile(x0[None], (T + 1, 1))
    us0 = jnp.zeros((T, nu), DTYPE)
    st = CSQPSettings(max_iters=30, termination_tolerance=1e-9,
                      reg_init=1e-8)
    sol_vs = jax.jit(make_batch_sqp(model, params, spec_vs, cf_vs, st))(
        x0[None], refs_vs, xs0[None], us0[None])
    sol_fp = jax.jit(make_batch_sqp(model, params, spec_fp, cf_fp, st))(
        x0[None], refs_fp, xs0[None], us0[None])
    np.testing.assert_allclose(np.asarray(sol_vs.us), np.asarray(sol_fp.us),
                               atol=1e-10)
