"""Fused Pallas stage kernels: dynamics + cost Gauss-Newton packs per node.

The SQP iteration's node-parallel work — semi-implicit Euler step, RNEA
Jacobians, and every running-cost residual/gradient/GN-Hessian — happens in
ONE pallas dispatch per stage. Measured motivation (v5e, T=100, B=8): the
XLA cost pack alone costs ~1 ms per solver iteration in-program (thousands
of small ops); the same component-form trace inside a pallas kernel runs at
~1-2 ns/op.

Layouts match `pallas_dynamics`: every scalar of the computation is an
(8, 128) tile over a block of 1024 nodes; references are pre-gathered per
node (XLA-side `jnp.take` at the node times) and fed as component rows.

Supported cost kinds mirror `batched_costs.SUPPORTED_KINDS`; factories
return None for unsupported specs (callers fall back to the XLA pack).

Reference parity: Crocoddyl `CostModelSum.calc/calcDiff` over the DSL cost
items (`ocp_croco_generic.py:560-592`), fused with the DAM step (N3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.model import ModelParams, RobotModel
from ..ocp.spec import CostItem, ProblemSpec
from .batched_costs import (
    SUPPORTED_KINDS,
    _capsule_distance_c,
    _fk_world,
    _frame_pose_c,
    _frame_velocity_c,
    _log3_c,
    _log6_c,
)
from .batched_dynamics import _StaticModel, _matmul, _matvec, _rnea_c, _sub
from .pallas_dynamics import BLOCK_NODES, LANES, SUBLANES, _round_up, dynamics_terms


# ---------------------------------------------------------------------------
# per-node reference layout
# ---------------------------------------------------------------------------

def _ref_layout(spec: ProblemSpec, model: RobotModel,
                items: Tuple[CostItem, ...]) -> List[Tuple[str, int, bool]]:
    """Ordered (refs_key, n_components, per_node) inputs the kernel needs."""
    nx = 2 * model.nj
    out: List[Tuple[str, int, bool]] = []
    seen = set()

    def add(key, ncomp, per_node=True):
        if key not in seen:
            seen.add(key)
            out.append((key, ncomp, per_node))

    for item in items:
        if not item.active:
            continue
        if item.update:
            if item.kind == "state":
                add("xref", nx)
                add("w_x", nx)
            elif item.kind == "control":
                add("uref", model.nv)
                add("w_u", model.nv)
            elif item.kind == "control_grav":
                add("w_u", model.nv)
            elif item.kind in ("frame_placement", "frame_translation",
                               "frame_rotation", "visual_servoing"):
                add(f"ee_rot:{item.frame}", 9)
                add(f"ee_trans:{item.frame}", 3)
                add(f"w_ee:{item.frame}", 6)
            elif item.kind == "frame_velocity":
                add(f"ee_vel:{item.frame}", 6)
                add(f"w_ee_vel:{item.frame}", 6)
            elif item.kind == "collision_distance":
                add("w_coll", 1)
        elif item.kind in ("frame_placement", "frame_translation",
                           "frame_rotation", "visual_servoing"):
            add(f"ee_rot:{item.frame}", 9)
            add(f"ee_trans:{item.frame}", 3)
        elif item.kind == "frame_velocity":
            add(f"ee_vel:{item.frame}", 6)
        if item.kind == "visual_servoing":
            add(f"wMo_rot:{item.object_frame}", 9, per_node=False)
            add(f"wMo_trans:{item.object_frame}", 3, per_node=False)
        if item.kind == "collision_distance":
            # runtime placement overrides for world-fixed (obstacle) geoms
            gi, gj = model.collision_pairs[item.pair_id]
            for g in (gi, gj):
                if model.geometries[g].parent_joint < 0:
                    add(f"__geom_rot:{g}", 9, per_node=False)
                    add(f"__geom_trans:{g}", 3, per_node=False)
    return out


def gather_node_refs(layout, refs: Dict, t_idx, N_pad: int, dtype):
    """XLA-side: gather refs at per-node times and pack component rows.

    t_idx [N] int32 node times. Returns one array [total_comp, N_pad]."""
    N = t_idx.shape[0]
    rows = []
    for key, ncomp, per_node in layout:
        if key.startswith("__geom_rot:"):
            g = int(key.split(":")[1])
            src = refs.get("geom_rot")
            val = (src[g] if src is not None else None)
        elif key.startswith("__geom_trans:"):
            g = int(key.split(":")[1])
            src = refs.get("geom_trans")
            val = (src[g] if src is not None else None)
        else:
            val = refs.get(key)
        if val is None:
            arr = jnp.zeros((N, ncomp), dtype)
        else:
            val = jnp.asarray(val, dtype)
            if per_node and val.ndim >= 1 and not key.startswith("__"):
                arr = jnp.take(val, t_idx, axis=0).reshape(N, ncomp)
            else:
                arr = jnp.broadcast_to(val.reshape(-1), (N, ncomp))
        rows.append(arr.T)
    if not rows:
        return jnp.zeros((1, N_pad), dtype)
    flat = jnp.concatenate(rows, axis=0)  # [total, N]
    if N_pad != N:
        flat = jnp.concatenate(
            [flat, jnp.zeros((flat.shape[0], N_pad - N), dtype)], axis=1)
    return flat




def _with_geom_defaults(layout, refs, params, dtype):
    """World-fixed geom override inputs fall back to the params placements
    when the caller streams no `geom_rot`/`geom_trans` refs."""
    if not any(k.startswith("__geom") for k, _, _ in layout):
        return refs
    refs = dict(refs)
    refs.setdefault("geom_rot", jnp.asarray(params.geom_rot, dtype))
    refs.setdefault("geom_trans", jnp.asarray(params.geom_trans, dtype))
    return refs


def _slice_layout(layout):
    """key -> (offset, ncomp) into the packed ref rows."""
    out = {}
    off = 0
    for key, ncomp, _ in layout:
        out[key] = (off, ncomp)
        off += ncomp
    return out, max(off, 1)


# ---------------------------------------------------------------------------
# component-form cost items
# ---------------------------------------------------------------------------

def _weights_c(item: CostItem, rget, nr: int, like):
    """Runtime activation weights as components (tiles or trace constants)."""
    if item.update:
        if item.kind == "state":
            return rget("w_x")
        if item.kind in ("control", "control_grav"):
            return rget("w_u")
        if item.kind in ("frame_placement", "visual_servoing"):
            return rget(f"w_ee:{item.frame}")
        if item.kind == "frame_rotation":
            return rget(f"w_ee:{item.frame}")[:3]
        if item.kind == "frame_translation":
            return rget(f"w_ee:{item.frame}")[3:]
        if item.kind == "frame_velocity":
            return rget(f"w_ee_vel:{item.frame}")
    if item.act_weights is not None:
        wv = np.asarray(item.act_weights, np.float64).reshape(-1)
        if wv.shape[0] == nr:
            return [float(w) for w in wv]
        return [float(wv[0])] * nr
    return [1.0] * nr


def _activation_c(item: CostItem, r, w, nr):
    """(l, a_dr list, a_drr list) in components; r/w lists of length nr."""
    if item.activation == "weighted_quad":
        l = 0.0
        for i in range(nr):
            l = l + 0.5 * w[i] * r[i] * r[i]
        return l, [w[i] * r[i] for i in range(nr)], list(w)
    alpha = float(item.act_alpha)
    rr = 0.0
    for i in range(nr):
        rr = rr + r[i] * r[i]
    if item.activation == "exp":
        d = jnp.sqrt(rr + 1e-12)
        a = jnp.exp(-d / alpha)
        scale = -a / (alpha * d)
        return a, [scale * r[i] for i in range(nr)], [
            a / (alpha * alpha)] * nr
    # quad_exp
    a = jnp.exp(-rr / alpha)
    return (a, [(-2.0 / alpha) * a * r[i] for i in range(nr)],
            [(4.0 / (alpha * alpha)) * a * r[i] * r[i] for i in range(nr)])


def _pose_target_c(item: CostItem, rget):
    """Target (R components 9-tuple, p 3-tuple) for frame/VS items."""
    eR = rget(f"ee_rot:{item.frame}")
    ep = rget(f"ee_trans:{item.frame}")
    if item.kind == "visual_servoing":
        wR = rget(f"wMo_rot:{item.object_frame}")
        wp = rget(f"wMo_trans:{item.object_frame}")
        R = _matmul(tuple(wR), tuple(eR))
        p = tuple(a + b for a, b in
                  zip(_matvec(tuple(wR), tuple(ep)), tuple(wp)))
        return R, p
    return tuple(eR), tuple(ep)


def _geom_pose_c(model, params, oR, op, g: int, rget):
    """World placement of geometry g; world-fixed geoms may be overridden by
    runtime refs (`update_geometry_placement`, `ocp_base_croco.py:110-132`)."""
    geo = model.geometries[g]
    gR_const = tuple(float(v) for v in np.asarray(
        params.geom_rot)[g].reshape(-1))
    gp_const = tuple(float(v) for v in np.asarray(params.geom_trans)[g])
    if geo.parent_joint < 0:
        rot = rget(f"__geom_rot:{g}", default=None)
        trans = rget(f"__geom_trans:{g}", default=None)
        if rot is not None:
            return tuple(rot), tuple(trans)
        return gR_const, gp_const
    R = _matmul(oR[geo.parent_joint], gR_const)
    p = tuple(a + b for a, b in
              zip(_matvec(oR[geo.parent_joint], gp_const), op[geo.parent_joint]))
    return R, p


def _residual_c(item: CostItem, model, params, sm, q, v, rget):
    """Residual components for x-only kinds; returns list of nr tiles."""
    fid = model.frame_id(item.frame) if item.frame else None
    oR, op = _fk_world(sm, q)
    if item.kind in ("frame_placement", "visual_servoing"):
        R, p = _frame_pose_c(model, params, oR, op, fid)
        refR, refp = _pose_target_c(item, rget)
        rRT = (refR[0], refR[3], refR[6], refR[1], refR[4], refR[7],
               refR[2], refR[5], refR[8])
        dR = _matmul(rRT, R)
        dp = _matvec(rRT, _sub(p, refp))
        return list(_log6_c(dR, dp))
    if item.kind == "frame_translation":
        _, p = _frame_pose_c(model, params, oR, op, fid)
        _, refp = _pose_target_c(item, rget)
        return list(_sub(p, refp))
    if item.kind == "frame_rotation":
        R, _ = _frame_pose_c(model, params, oR, op, fid)
        refR, _ = _pose_target_c(item, rget)
        rRT = (refR[0], refR[3], refR[6], refR[1], refR[4], refR[7],
               refR[2], refR[5], refR[8])
        return list(_log3_c(_matmul(rRT, R)))
    if item.kind == "frame_velocity":
        Rf, pf = _frame_pose_c(model, params, oR, op, fid)
        nu6 = _frame_velocity_c(model, sm, oR, op, v, fid,
                                item.reference_frame, Rf, pf)
        ref_nu = rget(f"ee_vel:{item.frame}")
        return [nu6[i] - ref_nu[i] for i in range(6)]
    if item.kind == "collision_distance":
        gi, gj = model.collision_pairs[item.pair_id]
        R1, p1 = _geom_pose_c(model, params, oR, op, gi, rget)
        R2, p2 = _geom_pose_c(model, params, oR, op, gj, rget)
        ri = float(np.asarray(params.geom_radius)[gi])
        li = float(np.asarray(params.geom_halflen)[gi])
        rj = float(np.asarray(params.geom_radius)[gj])
        lj = float(np.asarray(params.geom_halflen)[gj])
        return [_capsule_distance_c(R1, p1, ri, li, R2, p2, rj, lj)]
    raise ValueError(item.kind)


def _accumulate(acc: Dict, key: str, idx: int, val):
    cur = acc[key][idx]
    acc[key][idx] = val if cur is None else cur + val


def _item_terms_c(item: CostItem, model, params, sm, q, v, u, rget,
                  want_derivs: bool, wgt, acc: Dict):
    """Add one weighted cost item's value (and GN derivatives) into acc."""
    nj = sm.nj
    nx = 2 * nj
    zero = jnp.zeros_like(q[0])

    if item.kind == "state":
        xref = rget("xref") if item.update else (
            [float(s) for s in (item.static_ref or (0.0,) * nx)])
        w = _weights_c(item, rget, nx, q[0])
        xs = q + v
        l = 0.0
        for i in range(nx):
            r = xs[i] - xref[i]
            l = l + 0.5 * w[i] * r * r
            if want_derivs:
                _accumulate(acc, "lx", i, wgt * w[i] * r)
                _accumulate(acc, "lxx", i * nx + i, wgt * w[i] + zero)
        acc["l"] = acc["l"] + wgt * l
        return
    if item.kind == "control":
        uref = rget("uref") if item.update else (
            [float(s) for s in (item.static_ref or (0.0,) * nj)])
        w = _weights_c(item, rget, nj, q[0])
        l = 0.0
        for i in range(nj):
            r = u[i] - uref[i]
            l = l + 0.5 * w[i] * r * r
            if want_derivs:
                _accumulate(acc, "lu", i, wgt * w[i] * r)
                _accumulate(acc, "luu", i * nj + i, wgt * w[i] + zero)
        acc["l"] = acc["l"] + wgt * l
        return
    if item.kind == "control_grav":
        w = _weights_c(item, rget, nj, q[0])

        def grav(qstack):
            ql = [qstack[i] for i in range(nj)]
            zl = [jnp.zeros_like(ql[0])] * nj
            return jnp.stack(_rnea_c(sm, ql, zl, zl))

        qstack = jnp.stack(q)
        if want_derivs:
            gq, lin = jax.linearize(grav, qstack)
            Jg = []  # Jg[k][i] = d g_i / d q_k
            for k in range(nj):
                e = jnp.stack([jnp.full_like(q[0], 1.0 if j == k else 0.0)
                               for j in range(nj)])
                Jg.append(lin(e))
        else:
            gq = grav(qstack)
        l = 0.0
        wr = []
        for i in range(nj):
            r = u[i] - gq[i]
            wr.append(w[i] * r)
            l = l + 0.5 * w[i] * r * r
        acc["l"] = acc["l"] + wgt * l
        if want_derivs:
            # J_u = I, J_x = [-Jg, 0]
            for i in range(nj):
                _accumulate(acc, "lu", i, wgt * wr[i])
                _accumulate(acc, "luu", i * nj + i, wgt * w[i] + zero)
            for k in range(nj):
                s = 0.0
                for i in range(nj):
                    s = s + Jg[k][i] * wr[i]
                _accumulate(acc, "lx", k, -wgt * s)
                # lxu[k, i] = -Jg[k][i] * w_i
                for i in range(nj):
                    _accumulate(acc, "lxu", k * nj + i,
                                -wgt * Jg[k][i] * w[i])
                for k2 in range(k + 1):
                    h = 0.0
                    for i in range(nj):
                        h = h + Jg[k][i] * w[i] * Jg[k2][i]
                    _accumulate(acc, "lxx", k * nx + k2, wgt * h)
                    if k2 != k:
                        _accumulate(acc, "lxx", k2 * nx + k, wgt * h)
        return

    # x-only residual kinds
    nr = item.residual_dim(model)
    q_only = item.kind != "frame_velocity"

    if want_derivs:
        if q_only:
            def r_of(qstack):
                ql = [qstack[i] for i in range(nj)]
                return jnp.stack(_residual_c(
                    item, model, params, sm, ql, v, rget))
            r_st, lin = jax.linearize(r_of, jnp.stack(q))
            ndiff = nj
        else:
            def r_of(qvstack):
                ql = [qvstack[i] for i in range(nj)]
                vl = [qvstack[nj + i] for i in range(nj)]
                return jnp.stack(_residual_c(
                    item, model, params, sm, ql, vl, rget))
            r_st, lin = jax.linearize(r_of, jnp.stack(q + v))
            ndiff = nx
        Jcols = []
        for k in range(ndiff):
            e = jnp.stack([jnp.full_like(q[0], 1.0 if j == k else 0.0)
                           for j in range(ndiff)])
            Jcols.append(lin(e))  # [nr, 8, 128]
        r = [r_st[i] for i in range(nr)]
    else:
        r = _residual_c(item, model, params, sm, q, v, rget)
        Jcols, ndiff = None, 0

    w = _weights_c(item, rget, nr, q[0])
    l, a_dr, a_drr = _activation_c(item, r, w, nr)
    acc["l"] = acc["l"] + wgt * l
    if not want_derivs:
        return
    for k in range(ndiff):
        s = 0.0
        for i in range(nr):
            s = s + Jcols[k][i] * a_dr[i]
        _accumulate(acc, "lx", k, wgt * s)
        for k2 in range(k + 1):
            h = 0.0
            for i in range(nr):
                h = h + Jcols[k][i] * a_drr[i] * Jcols[k2][i]
            _accumulate(acc, "lxx", k * nx + k2, wgt * h)
            if k2 != k:
                _accumulate(acc, "lxx", k2 * nx + k, wgt * h)


# ---------------------------------------------------------------------------
# kernel factories
# ---------------------------------------------------------------------------

def _supported(spec: ProblemSpec) -> bool:
    if spec.soft_contact is not None:
        return False
    for item in spec.all_costs():
        if item.kind not in SUPPORTED_KINDS:
            return False
        if item.activation != "weighted_quad" and item.kind not in (
                "collision_distance",):
            return False
    return True


def make_pallas_stage(model: RobotModel, params: ModelParams,
                      spec: ProblemSpec, derivs: bool,
                      interpret: bool = False):
    """Fused per-node stage kernel over the RUNNING model.

    derivs=True:  f(x [N,nx], u [N,nu], dt [N], w_coll_t, refs)
                  -> (xnext, Fx, Fu, l, lx, lu, lxx, lxu, luu)
    derivs=False: f(...) -> (xnext, l)

    `refs` is the full refs dict; node times are passed via ``t_idx``.
    Returns None if the spec has unsupported cost kinds.
    """
    if not _supported(spec):
        return None
    sm = _StaticModel(model, params)
    nj = sm.nj
    nx = 2 * nj
    items = tuple(i for i in spec.running_costs if i.active)
    layout = _ref_layout(spec, model, items)
    offsets, total_comp = _slice_layout(layout)

    def kernel(x_ref, u_ref, dt_ref, refs_ref, *out_refs):
        q = [x_ref[i] for i in range(nj)]
        v = [x_ref[nj + i] for i in range(nj)]
        u = [u_ref[i] for i in range(nj)]
        dt = dt_ref[0]

        def rget(key, default="raise"):
            if key not in offsets:
                if default == "raise":
                    raise KeyError(key)
                return default
            off, ncomp = offsets[key]
            return [refs_ref[off + i] for i in range(ncomp)]

        xnext, fx, fu = dynamics_terms(sm, q, v, u, dt, derivs)

        zero = jnp.zeros_like(q[0])
        acc = {"l": 0.0}
        if derivs:
            acc.update(
                lx=[None] * nx, lu=[None] * nj,
                lxx=[None] * (nx * nx), lxu=[None] * (nx * nj),
                luu=[None] * (nj * nj))
        for item in items:
            wgt = float(item.weight)
            if item.kind == "collision_distance" and item.update:
                wc = rget("w_coll")
                wgt = wgt * wc[0]
            _item_terms_c(item, model, params, sm, q, v, u, rget,
                          derivs, wgt, acc)

        # dt-scale the running cost (terminal has dt=0 semantics,
        # `ocp_croco_generic.py:808-812`)
        for i in range(nx):
            out_refs[0][i] = xnext[i]
        if not derivs:
            out_refs[1][0] = acc["l"] * dt
            return
        _, fx_ref, fu_ref, l_ref, lx_ref, lu_ref, lxx_ref, lxu_ref, \
            luu_ref = out_refs
        for i, val in enumerate(fx):
            fx_ref[i] = val
        for i, val in enumerate(fu):
            fu_ref[i] = val
        l_ref[0] = acc["l"] * dt
        for i in range(nx):
            lx_ref[i] = (acc["lx"][i] if acc["lx"][i] is not None
                         else zero) * dt
        for i in range(nj):
            lu_ref[i] = (acc["lu"][i] if acc["lu"][i] is not None
                         else zero) * dt
        for i in range(nx * nx):
            lxx_ref[i] = (acc["lxx"][i] if acc["lxx"][i] is not None
                          else zero) * dt
        for i in range(nx * nj):
            lxu_ref[i] = (acc["lxu"][i] if acc["lxu"][i] is not None
                          else zero) * dt
        for i in range(nj * nj):
            luu_ref[i] = (acc["luu"][i] if acc["luu"][i] is not None
                          else zero) * dt

    def run(x, u, dt, t_idx, refs):
        """x [N,nx], u [N,nu], dt [N], t_idx [N] int32, refs dict."""
        N = x.shape[0]
        dtype = x.dtype
        N_pad = _round_up(max(N, 1), BLOCK_NODES)
        R = N_pad // LANES

        def to_cl(arr, n_comp):
            at = arr.T
            if N_pad != N:
                at = jnp.concatenate(
                    [at, jnp.zeros((n_comp, N_pad - N), dtype)], axis=1)
            return at.reshape(n_comp, R, LANES)

        x_cl = to_cl(x, nx)
        u_cl = to_cl(u, nj)
        dt_cl = to_cl(jnp.broadcast_to(jnp.asarray(dt, dtype), (N,))[:, None], 1)
        refs_cl = gather_node_refs(
            layout, _with_geom_defaults(layout, refs, params, dtype),
            t_idx, N_pad, dtype)
        refs_cl = refs_cl.reshape(refs_cl.shape[0], R, LANES)

        blk = lambda c: pl.BlockSpec(
            (c, SUBLANES, LANES),
            # literal 0 must stay i32: under jax x64 a Python-int
            # index-map return becomes i64 and Mosaic fails to
            # legalize 'func.return' (i64, i32, i64)
            lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM)
        sds = lambda c: jax.ShapeDtypeStruct((c, R, LANES), dtype)
        if derivs:
            out_shape = (sds(nx), sds(nx * nx), sds(nx * nj), sds(1),
                         sds(nx), sds(nj), sds(nx * nx), sds(nx * nj),
                         sds(nj * nj))
            out_specs = (blk(nx), blk(nx * nx), blk(nx * nj), blk(1),
                         blk(nx), blk(nj), blk(nx * nx), blk(nx * nj),
                         blk(nj * nj))
        else:
            out_shape = (sds(nx), sds(1))
            out_specs = (blk(nx), blk(1))
        # trace the kernel with x64 OFF: all kernel data is f32, but under
        # jax x64 some trace-time literals widen to 64-bit vectors and
        # Mosaic hard-aborts ("Check failed: bitwidth_ <= 32",
        # VectorLayoutInferer) — seen when the csqp bench enables x64 for
        # the f64 sweep accumulation
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                kernel,
                grid=(R // SUBLANES,),
                out_shape=out_shape,
                in_specs=[blk(nx), blk(nj), blk(1), blk(refs_cl.shape[0])],
                out_specs=out_specs,
                interpret=interpret,
            )(x_cl, u_cl, dt_cl, refs_cl)

        def back(arr_cl, shape):
            flat = arr_cl.reshape(arr_cl.shape[0], N_pad)[:, :N]
            if len(shape) == 1:
                return flat[0]
            if len(shape) == 2:
                return flat.T
            return jnp.moveaxis(
                flat.reshape(shape[1], shape[2], N), 2, 0)

        if derivs:
            xn, fx, fu, l, lx, lu, lxx, lxu, luu = outs
            return (back(xn, (N, nx)), back(fx, (N, nx, nx)),
                    back(fu, (N, nx, nj)), back(l, (N,)),
                    back(lx, (N, nx)), back(lu, (N, nj)),
                    back(lxx, (N, nx, nx)), back(lxu, (N, nx, nj)),
                    back(luu, (N, nj, nj)))
        xn, l = outs
        return back(xn, (N, nx)), back(l, (N,))

    return run


def make_pallas_terminal(model: RobotModel, params: ModelParams,
                         spec: ProblemSpec, derivs: bool,
                         interpret: bool = False):
    """Terminal-model kernel: f(x [N,nx], refs) -> (l, lx, lxx) / (l,).
    Terminal nodes use t = horizon for reference gathering and no dt scale."""
    if not _supported(spec):
        return None
    sm = _StaticModel(model, params)
    nj = sm.nj
    nx = 2 * nj
    items = tuple(i for i in spec.terminal_costs if i.active)
    layout = _ref_layout(spec, model, items)
    offsets, total_comp = _slice_layout(layout)
    T = spec.horizon

    def kernel(x_ref, refs_ref, *out_refs):
        q = [x_ref[i] for i in range(nj)]
        v = [x_ref[nj + i] for i in range(nj)]
        u = [jnp.zeros_like(q[0])] * nj

        def rget(key, default="raise"):
            if key not in offsets:
                if default == "raise":
                    raise KeyError(key)
                return default
            off, ncomp = offsets[key]
            return [refs_ref[off + i] for i in range(ncomp)]

        zero = jnp.zeros_like(q[0])
        acc = {"l": 0.0}
        if derivs:
            acc.update(lx=[None] * nx, lu=[None] * nj,
                       lxx=[None] * (nx * nx), lxu=[None] * (nx * nj),
                       luu=[None] * (nj * nj))
        for item in items:
            wgt = float(item.weight)
            if item.kind == "collision_distance" and item.update:
                wgt = wgt * rget("w_coll")[0]
            _item_terms_c(item, model, params, sm, q, v, u, rget,
                          derivs, wgt, acc)
        out_refs[0][0] = acc["l"] + zero
        if derivs:
            for i in range(nx):
                out_refs[1][i] = (acc["lx"][i] if acc["lx"][i] is not None
                                  else zero)
            for i in range(nx * nx):
                out_refs[2][i] = (acc["lxx"][i] if acc["lxx"][i] is not None
                                  else zero)

    def run(x, refs):
        N = x.shape[0]
        dtype = x.dtype
        N_pad = _round_up(max(N, 1), BLOCK_NODES)
        R = N_pad // LANES
        at = x.T
        if N_pad != N:
            at = jnp.concatenate(
                [at, jnp.zeros((nx, N_pad - N), dtype)], axis=1)
        x_cl = at.reshape(nx, R, LANES)
        t_idx = jnp.full((N,), T, jnp.int32)
        refs_cl = gather_node_refs(
            layout, _with_geom_defaults(layout, refs, params, dtype),
            t_idx, N_pad, dtype)
        refs_cl = refs_cl.reshape(refs_cl.shape[0], R, LANES)

        blk = lambda c: pl.BlockSpec(
            (c, SUBLANES, LANES),
            # literal 0 must stay i32: under jax x64 a Python-int
            # index-map return becomes i64 and Mosaic fails to
            # legalize 'func.return' (i64, i32, i64)
            lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM)
        sds = lambda c: jax.ShapeDtypeStruct((c, R, LANES), dtype)
        if derivs:
            out_shape = (sds(1), sds(nx), sds(nx * nx))
            out_specs = (blk(1), blk(nx), blk(nx * nx))
        else:
            out_shape = (sds(1),)
            out_specs = (blk(1),)
        # x64 OFF during kernel trace — see the stage kernel's note
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                kernel,
                grid=(R // SUBLANES,),
                out_shape=out_shape,
                in_specs=[blk(nx), blk(refs_cl.shape[0])],
                out_specs=out_specs,
                interpret=interpret,
            )(x_cl, refs_cl)
        l = outs[0].reshape(N_pad)[:N]
        if not derivs:
            return (l,)
        lx = outs[1].reshape(nx, N_pad)[:, :N].T
        lxx = jnp.moveaxis(outs[2].reshape(nx, nx, N_pad)[:, :, :N], 2, 0)
        return l, lx, lxx

    return run
