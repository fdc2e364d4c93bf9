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
"frame_placement".  Refs keys: `xref [T+1, nq+nv]`, `w_x [T+1, ntan]`,
`w_u [T+1, nu]`, `ee_rot:/ee_trans:/w_ee:<frame>` as in `ocp/costs.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from ..ops import lie, spatial
from .costs import CostFunctions, StageDerivs, TerminalDerivs
from .spec import ProblemSpec, make_timesteps


def build_ff_cost_functions(
    model: RobotModel, params: ModelParams, spec: ProblemSpec,
    dtype=jnp.float32,
) -> CostFunctions:
    for item in spec.all_costs():
        if item.kind not in ("state", "control", "frame_placement"):
            raise NotImplementedError(
                f"free-flyer cost kind {item.kind!r} not supported yet")
    timesteps = make_timesteps(spec, dtype)
    nv = model.nj
    ntan = 2 * nv
    nu = nv
    sdiff = lie.state_difference(model)
    sint = lie.state_integrate(model)

    def step(x, u, t, refs):
        return lie.ff_step(model, params, x, u, timesteps[t])

    def _residuals(items, x, u, t, refs):
        """list of (weight, residual fn of tangent dx, act weights [nr])."""
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
                uref = refs["uref"][t] if item.update else jnp.zeros(
                    (nu,), dtype)
                w = refs["w_u"][t] if item.update else jnp.ones((nu,), dtype)

                def r_ctrl(du, u=u, uref=uref):
                    return (u + du) - uref

                out.append((item.weight, r_ctrl, w, True))
            else:  # frame_placement
                fid = model.frame_id(item.frame)
                refR = refs[f"ee_rot:{item.frame}"][t]
                refp = refs[f"ee_trans:{item.frame}"][t]
                w = (refs[f"w_ee:{item.frame}"][t] if item.update
                     else jnp.ones((6,), dtype))

                def r_fp(dx, x=x, fid=fid, refR=refR, refp=refp):
                    R, p = lie.ff_frame_placement(
                        model, params, sint(x, dx), fid)
                    dR = refR.T @ R
                    dp = refR.T @ (p - refp)
                    return spatial.log6(dR, dp)

                out.append((item.weight, r_fp, w, False))
        return out

    def _cost_value(items, x, u, t, refs):
        total = jnp.zeros((), dtype)
        zx = jnp.zeros((ntan,), dtype)
        zu = jnp.zeros((nu,), dtype)
        for wgt, rfn, w, is_u in _residuals(items, x, u, t, refs):
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

    return CostFunctions(
        step=step,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_derivs=stage_derivs,
        terminal_derivs=terminal_derivs,
        constraints=None,
        constraint_derivs=None,
        n_constraints=0,
        terminal_constraint_mask=(),
        terminal_constraint_row_mask=(),
        state_diff=sdiff,
        state_integrate=sint,
        ntan=ntan,
    )
