"""Component-form batched Gauss-Newton cost packs.

Companion to `batched_dynamics.py`: the generic cost path evaluates residual
Jacobians with per-sample `jacfwd` over tiny-op FK graphs (the same layout
problem as the dynamics). Here the standard cost set of the reference's OCPs
(state / control / control-grav / frame-placement) is assembled directly on
`[B]`-component arrays; frame-placement Jacobians come from
`jax.linearize` over a component-form FK + log6 (tangents stay `[B]`-shaped,
so the whole pack fuses into full-lane elementwise kernels).

Falls back to the generic vmapped path for cost kinds not covered
(`fddp_batch.make_batch_fddp` decides per spec).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import ModelParams, RobotModel
from ..ocp.spec import CostItem, ProblemSpec
from .batched_dynamics import (
    _StackedModel,
    _StaticModel,
    _add,
    _cross,
    _dot,
    _joint_transforms,
    _matmul,
    _mattvec,
    _matvec,
    _scale,
    _sub,
)

SUPPORTED_KINDS = ("state", "control", "control_grav", "frame_placement")


def _fk_world(sm: _StaticModel, q: List):
    """World placements of every joint in component form (unrolled chain)."""
    Xs = _joint_transforms(sm, q)
    oR, op = [], []
    for i in range(sm.nj):
        R, p = Xs[i]
        par = sm.parents[i]
        if par < 0:
            oR.append(R)
            op.append(p)
        else:
            oR.append(_matmul(oR[par], R))
            op.append(_add(_matvec(oR[par], p), op[par]))
    return oR, op


def _frame_placement_c(model: RobotModel, params: ModelParams,
                       sm: _StaticModel, q: List, frame_id: int):
    """(R, p) of an operational frame, component form."""
    fr = model.frames[frame_id]
    # numpy-convert the WHOLE leaf before indexing: jax stages getitem on
    # concrete arrays inside traced code, which would yield a tracer here
    fR = tuple(float(v) for v in np.asarray(params.frame_rot)[frame_id].reshape(-1))
    fp = tuple(float(v) for v in np.asarray(params.frame_trans)[frame_id])
    oR, op = _fk_world(sm, q)
    j = fr.parent_joint
    R = _matmul(oR[j], fR)
    p = _add(_matvec(oR[j], fp), op[j])
    return R, p


def _quat_c(R):
    """Branchless rotation-matrix -> quaternion [x,y,z,w], component form
    (same candidate-select construction as `spatial.matrix_to_quat`)."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = R
    tr = m00 + m11 + m22
    cands = [
        ((1.0 + m00 - m11 - m22), (m01 + m10), (m02 + m20), (m21 - m12)),
        ((m01 + m10), (1.0 - m00 + m11 - m22), (m12 + m21), (m02 - m20)),
        ((m02 + m20), (m12 + m21), (1.0 - m00 - m11 + m22), (m10 - m01)),
        ((m21 - m12), (m02 - m20), (m10 - m01), (1.0 + tr)),
    ]
    scores = [m00, m11, m22, tr]
    best = scores[0]
    out = list(cands[0])
    for s, c in zip(scores[1:], cands[1:]):
        take = s > best
        best = jnp.where(take, s, best)
        out = [jnp.where(take, cc, oo) for cc, oo in zip(c, out)]
    n = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2 + out[3] ** 2)
    return tuple(o / n for o in out)


def _log3_c(R):
    """SO(3) log, component form (quaternion/atan2 route of `spatial.log3`)."""
    qx, qy, qz, qw = _quat_c(R)
    sign = jnp.where(qw < 0.0, -1.0, 1.0)
    qx, qy, qz = qx * sign, qy * sign, qz * sign
    c = jnp.abs(qw)
    s2 = qx * qx + qy * qy + qz * qz
    small = s2 < 1e-12
    s = jnp.sqrt(jnp.where(small, jnp.ones_like(s2), s2))
    theta = 2.0 * jnp.arctan2(s, c)
    scale = jnp.where(small, 2.0 / c, theta / s)
    return (scale * qx, scale * qy, scale * qz)


def _log6_c(R, p):
    """SE(3) log -> ([w; v] 6-tuple), mirrors `spatial.log6`."""
    w = _log3_c(R)
    t2 = _dot(w, w)
    small = t2 < 1e-8
    t2s = jnp.where(small, jnp.ones_like(t2), t2)
    th = jnp.sqrt(t2s)
    half = th * 0.5
    sin_half = jnp.where(small, jnp.ones_like(th), jnp.sin(half))
    coef = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half) / t2s)
    # V^-1 p = p - 0.5 w x p + coef * w x (w x p)
    wxp = _cross(w, p)
    wwxp = _cross(w, wxp)
    v = tuple(p[i] - 0.5 * wxp[i] + coef * wwxp[i] for i in range(3))
    return w + v  # 6-tuple


def make_batched_cost_pack(
    model: RobotModel, params: ModelParams, spec: ProblemSpec, dtype=jnp.float32
):
    """Build `pack(x [B,nx], u [B,nu], t, refs) -> (l, lx, lu, lxx, lxu, luu)`
    (all `[B, ...]`, dt-scaled) and `term_pack(x, refs)`.

    Returns None when the spec uses cost kinds outside SUPPORTED_KINDS or a
    soft-contact state (caller falls back to the generic path)."""
    if spec.soft_contact is not None:
        return None
    for item in spec.all_costs():
        if item.kind not in SUPPORTED_KINDS:
            return None
        if item.activation != "weighted_quad":
            return None
    sm = _StaticModel(model, params)
    nj = sm.nj
    nx = 2 * nj
    timesteps = jnp.asarray(spec.timesteps(), dtype)

    def item_terms(item: CostItem, x, u, t, refs, B, with_u):
        """-> (l [B], lx, lu, lxx, lxu, luu) contributions."""
        dt_ = 1.0  # caller scales
        if item.kind == "state":
            xref = refs["xref"][t] if item.update else jnp.zeros((nx,), x.dtype)
            w = refs["w_x"][t] if item.update else jnp.ones((nx,), x.dtype)
            r = x - xref[None]
            l = 0.5 * jnp.sum(w[None] * r * r, axis=1)
            lx = w[None] * r
            lxx = jnp.broadcast_to(jnp.diag(w), (B, nx, nx))
            return l, lx, None, lxx, None, None
        if item.kind == "control":
            uref = refs["uref"][t] if item.update else jnp.zeros((nj,), x.dtype)
            w = refs["w_u"][t] if item.update else jnp.ones((nj,), x.dtype)
            r = u - uref[None]
            l = 0.5 * jnp.sum(w[None] * r * r, axis=1)
            lu = w[None] * r
            luu = jnp.broadcast_to(jnp.diag(w), (B, nj, nj))
            return l, None, lu, None, None, luu
        if item.kind == "control_grav":
            w = refs["w_u"][t] if item.update else jnp.ones((nj,), x.dtype)
            from .batched_dynamics import _rnea_scan

            st = _StackedModel(model, params, x.dtype)

            def grav_flat(xx):
                qm = xx[:, :nj].T
                zero = jnp.zeros_like(qm)
                taus, _ = _rnea_scan(st, qm, zero, zero)
                return jnp.stack(taus, axis=1)  # [B, nj]

            gq, lin = jax.linearize(grav_flat, x)
            basis = jnp.eye(nx, dtype=x.dtype)
            Jg = jax.vmap(lambda e: lin(jnp.broadcast_to(e, (B, nx))))(basis)
            Jg = jnp.moveaxis(Jg, 0, 2)  # [B, nj, nx] = dg/dx
            r = u - gq
            wr = w[None] * r
            l = 0.5 * jnp.sum(w[None] * r * r, axis=1)
            # J_u = I, J_x = -Jg
            lu = wr
            lx = -jnp.einsum("bri,br->bi", Jg, wr)
            luu = jnp.broadcast_to(jnp.diag(w), (B, nj, nj))
            lxx = jnp.einsum("bri,br,brj->bij", Jg, w[None] * jnp.ones_like(r), Jg)
            lxu = -jnp.einsum("bri,br->bir", Jg, w[None] * jnp.ones_like(r))
            return l, lx, lu, lxx, lxu, luu
        if item.kind == "frame_placement":
            fid = model.frame_id(item.frame)
            ref_R = refs[f"ee_rot:{item.frame}"][t]  # [3,3]
            ref_p = refs[f"ee_trans:{item.frame}"][t]
            w = refs[f"w_ee:{item.frame}"][t] if item.update else jnp.ones((6,), x.dtype)

            def r_flat(xx):
                q = [xx[:, i] for i in range(nj)]
                R, p = _frame_placement_c(model, params, sm, q, fid)
                # dR = refR^T R ; dp = refR^T (p - refp)
                rr = tuple(ref_R[r, c] for r in range(3) for c in range(3))
                rRT = (rr[0], rr[3], rr[6], rr[1], rr[4], rr[7], rr[2], rr[5], rr[8])
                dR = _matmul(rRT, R)
                pm = (p[0] - ref_p[0], p[1] - ref_p[1], p[2] - ref_p[2])
                dp = _matvec(rRT, pm)
                return jnp.stack(_log6_c(dR, dp), axis=1)  # [B, 6]

            r, lin = jax.linearize(r_flat, x)
            basis = jnp.eye(nx, dtype=x.dtype)
            J = jax.vmap(lambda e: lin(jnp.broadcast_to(e, (B, nx))))(basis)
            J = jnp.moveaxis(J, 0, 2)  # [B, 6, nx]
            wr = w[None] * r
            l = 0.5 * jnp.sum(w[None] * r * r, axis=1)
            lx = jnp.einsum("bri,br->bi", J, wr)
            lxx = jnp.einsum("bri,r,brj->bij", J, w, J)
            return l, lx, None, lxx, None, None
        raise ValueError(item.kind)

    def assemble(items, x, u, t, refs, with_u: bool):
        B = x.shape[0]
        dtype_ = x.dtype
        l = jnp.zeros((B,), dtype_)
        lx = jnp.zeros((B, nx), dtype_)
        lu = jnp.zeros((B, nj), dtype_)
        lxx = jnp.zeros((B, nx, nx), dtype_)
        lxu = jnp.zeros((B, nx, nj), dtype_)
        luu = jnp.zeros((B, nj, nj), dtype_)
        for item in items:
            if not item.active:
                continue
            wgt = item.weight
            li, lxi, lui, lxxi, lxui, luui = item_terms(
                item, x, u, t, refs, B, with_u)
            l = l + wgt * li
            if lxi is not None:
                lx = lx + wgt * lxi
            if lui is not None:
                lu = lu + wgt * lui
            if lxxi is not None:
                lxx = lxx + wgt * lxxi
            if lxui is not None:
                lxu = lxu + wgt * lxui
            if luui is not None:
                luu = luu + wgt * luui
        if not with_u:
            return l, lx, lxx
        return l, lx, lu, lxx, lxu, luu

    def pack(x, u, t, refs):
        dt_ = timesteps[t]
        l, lx, lu, lxx, lxu, luu = assemble(spec.running_costs, x, u, t, refs, True)
        return dt_ * l, dt_ * lx, dt_ * lu, dt_ * lxx, dt_ * lxu, dt_ * luu

    def term_pack(x, refs):
        u0 = jnp.zeros((x.shape[0], nj), x.dtype)
        l, lx, lxx = assemble(spec.terminal_costs, x, u0, spec.horizon, refs, False)
        return l, lx, lxx

    def value(x, u, t, refs):
        l, *_ = assemble(spec.running_costs, x, u, t, refs, True)
        return timesteps[t] * l

    def term_value(x, refs):
        u0 = jnp.zeros((x.shape[0], nj), x.dtype)
        l, _, _ = assemble(spec.terminal_costs, x, u0, spec.horizon, refs, False)
        return l

    return pack, term_pack, value, term_value
