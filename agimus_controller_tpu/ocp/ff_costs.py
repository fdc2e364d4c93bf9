"""Cost functions on the quaternion free-flyer state (tangent-space GN).

Builds a `CostFunctions` whose derivative blocks live in the TANGENT space
of the SE(3) x R^n state (`ops/lie.py`): the reference gets the same
structure from `crocoddyl.StateMultibody` over a pinocchio free-flyer model
(`factory/robot_model.py:17`, `ocp_base_croco.py:36-41`) — residuals and
dynamics are differentiated through `integrate`, so the solver's Riccati
pass, gaps and feedback gains all operate on ntan = nv + nv coordinates
while configurations stay on the manifold (unit quaternion, no euler
singularity).

Supported cost kinds: "state" (tangent-space regularization), "control",
"control_grav", "frame_placement", "frame_translation", "frame_rotation",
"frame_velocity", "collision_distance", "visual_servoing" (composed
wMo * oMf target, `ocp_croco_generic.py:436-495`), "force_tracking" (on
the soft-contact augmented state).  Constraints: "control_limit",
"collision_distance", "force_box" (box semantics of `ocp/costs.py`).
Soft contact (`spec.soft_contact`): the state is force-augmented
[p;quat;qj;v;f] with ntan = 2*nv + nc, the reference's
DAMSoftContactAugmented over a free-flyer StateMultibody
(`ocp_croco_generic_force_feedback.py:218-297`).  Refs keys:
`xref [T+1, nq+nv]`, `w_x [T+1, ntan]`, `w_u [T+1, nu]`, `w_coll [T+1]`,
`ee_rot:/ee_trans:/w_ee:/ee_vel:/w_ee_vel:<frame>` as in `ocp/costs.py`.

Actuation (`actuation=`): "floating_base" (default) matches the reference's
`ActuationModelFloatingBase` — nu = nv - 6, the base is unactuated and the
control maps to [0_6; u] (ADVICE r03: full actuation solved for physically
unavailable base wrenches); "full" actuates all nv DoFs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from ..ops import dynamics as dyn
from ..ops import kinematics, lie, residuals, spatial
from .costs import CostFunctions, StageDerivs, TerminalDerivs
from .spec import ProblemSpec, make_timesteps

FF_COST_KINDS = (
    "state", "control", "control_grav", "frame_placement",
    "frame_translation", "frame_rotation", "frame_velocity",
    "collision_distance", "visual_servoing", "force_tracking",
)
FF_CONSTRAINT_KINDS = ("control_limit", "collision_distance", "force_box")


def build_ff_cost_functions(
    model: RobotModel, params: ModelParams, spec: ProblemSpec,
    dtype=jnp.float32, actuation: str = "floating_base",
) -> CostFunctions:
    for item in spec.all_costs():
        if item.kind not in FF_COST_KINDS:
            raise NotImplementedError(
                f"free-flyer cost kind {item.kind!r} not supported yet")
    for c in spec.constraints:
        if c.kind not in FF_CONSTRAINT_KINDS:
            raise NotImplementedError(
                f"free-flyer constraint kind {c.kind!r} not supported yet")
    if actuation not in ("floating_base", "full"):
        raise ValueError(actuation)
    timesteps = make_timesteps(spec, dtype)
    nv = model.nj
    under = actuation == "floating_base"
    nu = nv - lie.N_FF if under else nv
    # soft contact: the state is force-augmented x = [p;quat;qj;v;f]
    # (reference: DAMSoftContactAugmented composed with a free-flyer
    # StateMultibody, `ocp_croco_generic_force_feedback.py:218-297`)
    sc = spec.soft_contact
    nf = sc.nc if sc is not None else 0
    nxr = (model.nj - lie.N_FF) + 7 + nv  # rigid (quaternion) ambient dim
    ntan_r = 2 * nv
    ntan = ntan_r + nf
    sdiff_r = lie.state_difference(model)
    sint_r = lie.state_integrate(model)
    if sc is None:
        sdiff, sint = sdiff_r, sint_r
    else:
        def sdiff(x1, x0):
            return jnp.concatenate(
                [sdiff_r(x1[:nxr], x0[:nxr]), x1[nxr:] - x0[nxr:]])

        def sint(x, dx):
            return jnp.concatenate(
                [sint_r(x[:nxr], dx[:ntan_r]), x[nxr:] + dx[ntan_r:]])

    def tau_full(u):
        """Actuation map: the floating base takes no direct wrench
        (reference `ActuationModelFloatingBase`: nu = nv - 6)."""
        if under:
            return jnp.concatenate([jnp.zeros((lie.N_FF,), u.dtype), u])
        return u

    def step(x, u, t, refs):
        if sc is not None:
            from ..ops.soft_contact import ff_soft_contact_step

            active = refs["contact_active"][t]
            return ff_soft_contact_step(
                model, params, sc, x, tau_full(u), timesteps[t], active)
        return lie.ff_step(model, params, x, tau_full(u), timesteps[t])

    def _chart(xp):
        """(recentered params, chart q, v) at a perturbed global state
        (force tail, when augmented, is ignored here)."""
        p, quat, qj, v = lie.split_state(model, xp[:nxr])
        pr = lie.recenter_params(model, params, p, quat)
        return pr, lie.chart_q(model, qj), v

    def _grav_tau(xp):
        pr, qc, _ = _chart(xp)
        z = jnp.zeros((nv,), xp.dtype)
        return dyn.rnea(model, pr, qc, z, z)

    def _residuals(items, x, u, t, refs):
        """list of (weight fn value, residual fn of tangent dx, act
        weights [nr], is_u flag)."""
        out = []
        for item in items:
            if not item.active:
                continue
            if item.kind == "state":
                xref = refs["xref"][t]
                w = refs["w_x"][t] if item.update else jnp.ones((ntan,), dtype)

                def r_state(dx, x=x, xref=xref):
                    return sdiff(sint(x, dx), xref)

                out.append((item.weight, r_state, w, False))
            elif item.kind == "control":
                uref = refs["uref"][t][-nu:] if item.update else jnp.zeros(
                    (nu,), dtype)
                w = (refs["w_u"][t][-nu:] if item.update
                     else jnp.ones((nu,), dtype))

                def r_ctrl(du, u=u, uref=uref):
                    return (u + du) - uref

                out.append((item.weight, r_ctrl, w, True))
            elif item.kind == "control_grav":
                # r(x, u) = u - actuated part of the gravity torque
                # (reference `ResidualModelControlGrav`) — depends on BOTH
                # x and u, so it carries lx/lxu blocks too
                w = (refs["w_u"][t][-nu:] if item.update
                     else jnp.ones((nu,), dtype))

                def r_cg(dx, du, x=x, u=u):
                    return (u + du) - _grav_tau(sint(x, dx))[-nu:]

                out.append((item.weight, r_cg, w, "both"))
            elif item.kind == "collision_distance":
                pair = item.pair_id
                wgt = item.weight
                if item.update:
                    wgt = wgt * refs["w_coll"][t]

                def r_coll(dx, x=x, pair=pair):
                    pr, qc, v = _chart(sint(x, dx))
                    xc = jnp.concatenate([qc, v])
                    return residuals.collision_distance_residual(
                        model, pr, xc, pair)

                out.append((wgt, r_coll, jnp.ones((1,), dtype), False))
            elif item.kind == "force_tracking":
                # r = f - f_des on the augmented tail (reference
                # `dam.f_des/f_weight`,
                # `ocp_croco_generic_force_feedback.py:141-150`)
                fdes = refs["f_des"][t]
                w = (refs["w_force"][t] if item.update
                     else jnp.ones((nf,), dtype))

                def r_ft(dx, x=x, fdes=fdes):
                    return sint(x, dx)[nxr:] - fdes

                out.append((item.weight, r_ft, w, False))
            elif item.kind == "frame_velocity":
                fid = model.frame_id(item.frame)
                vref = refs[f"ee_vel:{item.frame}"][t]
                w = (refs[f"w_ee_vel:{item.frame}"][t] if item.update
                     else jnp.ones((6,), dtype))
                rframe = item.reference_frame

                def r_fv(dx, x=x, fid=fid, vref=vref, rframe=rframe):
                    pr, qc, v = _chart(sint(x, dx))
                    xc = jnp.concatenate([qc, v])
                    return residuals.frame_velocity_residual(
                        model, pr, xc, fid, vref, rframe)

                out.append((item.weight, r_fv, w, False))
            else:  # frame placement / translation / rotation / servoing
                fid = model.frame_id(item.frame)
                refR = refs[f"ee_rot:{item.frame}"][t]
                refp = refs[f"ee_trans:{item.frame}"][t]
                kind = item.kind
                if kind == "visual_servoing":
                    # composed target wMf = wMo_vision * oMf_ref
                    # (`ResidualModelVisualServoing`,
                    # `ocp_croco_generic.py:436-495`); then identical to a
                    # frame-placement residual on the manifold state
                    wR = refs[f"wMo_rot:{item.object_frame}"]
                    wt = refs[f"wMo_trans:{item.object_frame}"]
                    # the vision transform may be streamed per node
                    # ([T+1,3,3]) or held constant ([3,3], the OCPJax
                    # `set_transform` convention)
                    if wR.ndim == 3:
                        wR, wt = wR[t], wt[t]
                    refR, refp = spatial.se3_mul((wR, wt), (refR, refp))
                    kind = "frame_placement"
                nr = {"frame_placement": 6, "frame_translation": 3,
                      "frame_rotation": 3}[kind]
                if item.update:
                    w6 = refs[f"w_ee:{item.frame}"][t]
                    w = {"frame_placement": w6, "frame_rotation": w6[:3],
                         "frame_translation": w6[3:]}[kind]
                else:
                    w = jnp.ones((nr,), dtype)

                def r_fp(dx, x=x, fid=fid, refR=refR, refp=refp, kind=kind):
                    R, p = lie.ff_frame_placement(
                        model, params, sint(x, dx), fid)
                    if kind == "frame_translation":
                        return p - refp
                    dR = refR.T @ R
                    if kind == "frame_rotation":
                        return spatial.log3(dR)
                    dp = refR.T @ (p - refp)
                    return spatial.log6(dR, dp)

                out.append((item.weight, r_fp, w, False))
        return out

    def _cost_value(items, x, u, t, refs):
        total = jnp.zeros((), dtype)
        zx = jnp.zeros((ntan,), dtype)
        zu = jnp.zeros((nu,), dtype)
        for wgt, rfn, w, is_u in _residuals(items, x, u, t, refs):
            if is_u == "both":
                r = rfn(zx, zu)
            else:
                r = rfn(zu if is_u else zx)
            total = total + wgt * 0.5 * jnp.sum(w * r * r)
        return total

    def stage_cost(x, u, t, refs):
        return timesteps[t] * _cost_value(spec.running_costs, x, u, t, refs)

    def terminal_cost(x, refs):
        return _cost_value(
            spec.terminal_costs, x, jnp.zeros((nu,), dtype),
            spec.horizon, refs)

    def _gn_blocks(items, x, u, t, refs):
        """Gauss-Newton (l, lx, lu, lxx, lxu, luu) in tangent coords."""
        l = jnp.zeros((), dtype)
        lx = jnp.zeros((ntan,), dtype)
        lu = jnp.zeros((nu,), dtype)
        lxx = jnp.zeros((ntan, ntan), dtype)
        lxu = jnp.zeros((ntan, nu), dtype)
        luu = jnp.zeros((nu, nu), dtype)
        zx = jnp.zeros((ntan,), dtype)
        zu = jnp.zeros((nu,), dtype)
        for wgt, rfn, w, is_u in _residuals(items, x, u, t, refs):
            if is_u == "both":
                r = rfn(zx, zu)
                Jx = jax.jacfwd(rfn, argnums=0)(zx, zu)
                Ju = jax.jacfwd(rfn, argnums=1)(zx, zu)
                l = l + wgt * 0.5 * jnp.sum(w * r * r)
                lx = lx + Jx.T @ (w * r) * wgt
                lu = lu + Ju.T @ (w * r) * wgt
                lxx = lxx + (Jx.T * (w * wgt)) @ Jx
                lxu = lxu + (Jx.T * (w * wgt)) @ Ju
                luu = luu + (Ju.T * (w * wgt)) @ Ju
                continue
            z = zu if is_u else zx
            r = rfn(z)
            J = jax.jacfwd(rfn)(z)
            g = J.T @ (w * r) * wgt
            H = (J.T * (w * wgt)) @ J
            l = l + wgt * 0.5 * jnp.sum(w * r * r)
            if is_u:
                lu = lu + g
                luu = luu + H
            else:
                lx = lx + g
                lxx = lxx + H
        return l, lx, lu, lxx, lxu, luu

    def stage_derivs(x, u, t, refs):
        dt = timesteps[t]
        l, lx, lu, lxx, lxu, luu = _gn_blocks(
            spec.running_costs, x, u, t, refs)
        xnext = step(x, u, t, refs)

        def dstep(dxu):
            dx, du = dxu[:ntan], dxu[ntan:]
            return sdiff(step(sint(x, dx), u + du, t, refs), xnext)

        Fxu = jax.jacfwd(dstep)(jnp.zeros((ntan + nu,), dtype))
        return StageDerivs(
            cost=dt * l, lx=dt * lx, lu=dt * lu, lxx=dt * lxx,
            lxu=dt * lxu, luu=dt * luu, xnext=xnext,
            Fx=Fxu[:, :ntan], Fu=Fxu[:, ntan:])

    def terminal_derivs(x, refs):
        l, lx, _, lxx, _, _ = _gn_blocks(
            spec.terminal_costs, x, jnp.zeros((nu,), dtype),
            spec.horizon, refs)
        return TerminalDerivs(cost=l, lx=lx, lxx=lxx)

    # ------------------------------------------------------------------
    # constraints (tangent-space Jacobians)
    # ------------------------------------------------------------------
    c_items = spec.constraints

    def _con_dim(c):
        if c.kind == "control_limit":
            return nu
        if c.kind == "force_box":
            return nf
        return 1

    n_con = sum(_con_dim(c) for c in c_items)
    term_mask = tuple(c.terminal for c in c_items)
    term_row_mask = tuple(
        flag for c in c_items for flag in [c.terminal] * _con_dim(c))

    def _con_bounds(c):
        if c.kind == "control_limit":
            lim = jnp.asarray(params.effort_limit, dtype)[-nu:]
            return -lim, lim
        if c.kind == "force_box":
            # IAMSoftContactAugmented force bounds
            # (`ocp_croco_generic_force_feedback.py:191-215`)
            lo = (jnp.asarray(c.lower, dtype) if c.lower
                  else jnp.asarray(sc.force_lb, dtype) if sc.force_lb
                  else jnp.full((nf,), -jnp.inf, dtype))
            hi = (jnp.asarray(c.upper, dtype) if c.upper
                  else jnp.asarray(sc.force_ub, dtype) if sc.force_ub
                  else jnp.full((nf,), jnp.inf, dtype))
            return (jnp.broadcast_to(lo, (nf,)),
                    jnp.broadcast_to(hi, (nf,)))
        lo = (jnp.asarray(c.lower, dtype) if c.lower
              else jnp.full((1,), -jnp.inf, dtype))
        hi = (jnp.asarray(c.upper, dtype) if c.upper
              else jnp.full((1,), jnp.inf, dtype))
        return jnp.broadcast_to(lo, (1,)), jnp.broadcast_to(hi, (1,))

    def _con_residual(c, x, u, dx, du):
        if c.kind == "control_limit":
            return u + du
        if c.kind == "force_box":
            return sint(x, dx)[nxr:]
        pr, qc, v = _chart(sint(x, dx))
        xc = jnp.concatenate([qc, v])
        return residuals.collision_distance_residual(model, pr, xc, c.pair_id)

    def constraints(x, u, t, refs):
        if not c_items:
            return None
        zx = jnp.zeros((ntan,), dtype)
        zu = jnp.zeros((nu,), dtype)
        gs, lbs, ubs = [], [], []
        for c in c_items:
            gs.append(jnp.atleast_1d(_con_residual(c, x, u, zx, zu)))
            lo, hi = _con_bounds(c)
            lbs.append(lo)
            ubs.append(hi)
        return jnp.concatenate(gs), jnp.concatenate(lbs), jnp.concatenate(ubs)

    def constraint_derivs(x, u, t, refs):
        if not c_items:
            return None
        g, lb, ub = constraints(x, u, t, refs)
        zx = jnp.zeros((ntan,), dtype)
        zu = jnp.zeros((nu,), dtype)

        def g_of_dx(dx):
            return jnp.concatenate([
                jnp.atleast_1d(_con_residual(c, x, u, dx, zu))
                for c in c_items])

        def g_of_du(du):
            return jnp.concatenate([
                jnp.atleast_1d(_con_residual(c, x, u, zx, du))
                for c in c_items])

        Gx = jax.jacfwd(g_of_dx)(zx)
        Gu = jax.jacfwd(g_of_du)(zu)
        return g, lb, ub, Gx, Gu

    return CostFunctions(
        step=step,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_derivs=stage_derivs,
        terminal_derivs=terminal_derivs,
        constraints=constraints if c_items else None,
        constraint_derivs=constraint_derivs if c_items else None,
        n_constraints=n_con,
        terminal_constraint_mask=term_mask,
        terminal_constraint_row_mask=term_row_mask,
        state_diff=sdiff,
        state_integrate=sint,
        ntan=ntan,
    )
