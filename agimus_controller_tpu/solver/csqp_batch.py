"""Batch-native constrained SQP (mim_solvers `SolverCSQP` semantics).

Companion to `fddp_batch.py`: the single-scenario `solve_csqp` replicates a
tiny-op program per vmap lane; here the batch dimension is carried through
every stage explicitly so the whole constrained solve is ONE fused program:

- dynamics + analytic derivatives from the component-form kernels
  (`ops/batched_dynamics.py`), one dispatch for all B*T nodes,
- the rho-augmented Riccati factorization is a `lax.scan` over T of
  `[B, n, n]` batched Cholesky/matmuls (MXU block shapes),
- the ADMM-over-Riccati QP loop is a `lax.while_loop` with PER-SCENARIO
  OSQP residual convergence masks and a GLOBAL all-done early exit — when
  every scenario's QP meets eps_abs/eps_rel the loop stops, which the
  fixed-length vmapped path cannot do,
- the filter line search and SQP convergence are per scenario (`[B]`
  masks), exactly as in `fddp_batch`.

Per-scenario semantics match `solve_csqp` (= the reference's
`mim_solvers.SolverCSQP`, `ocp_base_croco.py:64-80`): OSQP-style scaled
ADMM over a once-per-SQP-iteration Riccati factorization, filter line
search on (cost, gap+violation), eps_abs/eps_rel termination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import ModelParams, RobotModel
from ..ocp.costs import CostFunctions
from ..ocp.spec import ProblemSpec
from ..ops.batched_costs import make_batched_cost_pack
from ..ops.batched_dynamics import make_batched_step, make_batched_step_with_derivs
from .csqp import CSQPSettings, CSQPSolution, _violation
from .tuning import scan_unroll


def make_batch_csqp(
    model: RobotModel,
    params: ModelParams,
    spec: ProblemSpec,
    cf: CostFunctions,
    settings: CSQPSettings = CSQPSettings(),
):
    """Build `solve(x0s [B,nx], refs, xs [B,T+1,nx], us [B,T,nu]) ->
    CSQPSolution` with a leading [B] on every leaf."""
    T = spec.horizon
    ts_np = spec.timesteps()
    soft = spec.soft_contact is not None
    # Lie-group (manifold) state support mirrors fddp_batch/sqp_batch
    # (VERDICT r03 #2): tangent-dim blocks, sdiff/sint for gaps/updates
    manifold = cf.ntan is not None
    if manifold:
        # manifold + soft contact composes: the ff cost pack's step/diff/
        # integrate carry the force-augmented state (ocp/ff_costs.py)
        step_b = step_d = None
    elif soft:
        from ..ops.batched_dynamics import (
            make_batched_soft_step,
            make_batched_soft_step_with_derivs,
        )

        step_b = make_batched_soft_step(model, params, spec.soft_contact)
        step_d = make_batched_soft_step_with_derivs(
            model, params, spec.soft_contact)
    else:
        step_b = make_batched_step(model, params)
        step_d = make_batched_step_with_derivs(model, params)

    def dyn_step(x, u, dts, t_idx, refs):
        """Rigid (x,u,dt) or force-augmented step with per-node contact
        activation from refs (runtime array, not object mutation)."""
        if soft:
            act = jnp.broadcast_to(
                refs["contact_active"][t_idx], x.shape[:1]).astype(x.dtype)
            d = jnp.broadcast_to(jnp.asarray(dts, x.dtype), x.shape[:1])
            return step_b(x, u, d, act)
        return step_b(x, u, dts)

    def dyn_derivs(x, u, dts, t_idx, refs):
        if soft:
            act = jnp.broadcast_to(
                refs["contact_active"][t_idx], x.shape[:1]).astype(x.dtype)
            d = jnp.broadcast_to(jnp.asarray(dts, x.dtype), x.shape[:1])
            return step_d(x, u, d, act)
        return step_d(x, u, dts)
    nc = cf.n_constraints
    n_alphas = settings.n_alphas
    alphas_np = [0.5**i for i in range(n_alphas)]

    if manifold:
        sdiff = cf.state_diff
        sdiff_b = jax.vmap(sdiff)
        sdiff_tb = jax.vmap(sdiff_b)
        sint_tb = jax.vmap(jax.vmap(cf.state_integrate))
    else:
        # plain broadcasting (vmap wrappers cost ~14% XLA:CPU compile time)
        sdiff = sdiff_b = sdiff_tb = (lambda x1, x0_: x1 - x0_)
        sint_tb = (lambda x, dx: x + dx)

    packed = None if manifold else make_batched_cost_pack(model, params, spec)
    if manifold:
        cost_derivs_b = None

        def term_derivs_b(x, refs):
            d = jax.vmap(cf.terminal_derivs, in_axes=(0, None))(x, refs)
            return d.cost, d.lx, d.lxx

        stage_cost_b = jax.vmap(cf.stage_cost, in_axes=(0, 0, None, None))
        term_cost_b = jax.vmap(cf.terminal_cost, in_axes=(0, None))
    elif packed is not None:
        cost_derivs_b, term_pack, stage_cost_b, term_cost_b = packed

        def term_derivs_b(x, refs):
            return term_pack(x, refs)
    else:
        def cost_derivs_b(x, u, t, refs):
            return jax.vmap(cf.cost_derivs, in_axes=(0, 0, None, None))(
                x, u, t, refs)

        def term_derivs_b(x, refs):
            d = jax.vmap(cf.terminal_derivs, in_axes=(0, None))(x, refs)
            return d.l, d.lx, d.lxx

        stage_cost_b = jax.vmap(cf.stage_cost, in_axes=(0, 0, None, None))
        term_cost_b = jax.vmap(cf.terminal_cost, in_axes=(0, None))

    con_derivs_b = (
        jax.vmap(cf.constraint_derivs, in_axes=(0, 0, None, None))
        if cf.constraint_derivs is not None else None)
    con_vals_b = (
        jax.vmap(cf.constraints, in_axes=(0, 0, None, None))
        if cf.constraints is not None else None)

    def total_cost(xs, us, refs):
        def body(acc, inp):
            x, u, t = inp
            return acc + stage_cost_b(x, u, t, refs), None

        acc0 = jnp.zeros(xs.shape[1], xs.dtype)
        acc, _ = jax.lax.scan(body, acc0, (xs[:-1], us, jnp.arange(T)))
        return acc + term_cost_b(xs[-1], refs)

    def derivs_of(xs, us, refs):
        B = xs.shape[1]
        nx = xs.shape[2]
        nu = us.shape[2]
        x_flat = xs[:-1].reshape(T * B, nx)
        u_flat = us.reshape(T * B, nu)
        dts_flat = jnp.repeat(jnp.asarray(ts_np, xs.dtype), B)
        if manifold:
            nt = cf.ntan
            t_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), B)
            d = jax.vmap(
                lambda x, u, t: cf.stage_derivs(x, u, t, refs)
            )(x_flat, u_flat, t_flat)
            dyn = (d.xnext.reshape(T, B, nx),
                   d.Fx.reshape(T, B, nt, nt), d.Fu.reshape(T, B, nt, nu))
            costs = (d.cost.reshape(T, B), d.lx.reshape(T, B, nt),
                     d.lu.reshape(T, B, nu), d.lxx.reshape(T, B, nt, nt),
                     d.lxu.reshape(T, B, nt, nu),
                     d.luu.reshape(T, B, nu, nu))
            return dyn, costs, term_derivs_b(xs[-1], refs)
        xnext, Fx, Fu = step_d(x_flat, u_flat, dts_flat)
        dyn = (
            xnext.reshape(T, B, nx),
            Fx.reshape(T, B, nx, nx),
            Fu.reshape(T, B, nx, nu),
        )
        costs = jax.vmap(
            lambda x, u, t: cost_derivs_b(x, u, t, refs)
        )(xs[:-1], us, jnp.arange(T))
        term = term_derivs_b(xs[-1], refs)
        return dyn, costs, term

    def constraint_all(xs, us, refs):
        """[T+1]-node constraint data, leading [T+1, B]. Terminal node keeps
        terminal-flagged rows only (same convention as `solve_csqp`)."""
        B = xs.shape[1]
        nu = us.shape[2]
        dtype = xs.dtype
        g, lb, ub, Gx, Gu = jax.vmap(
            lambda x, u, t: con_derivs_b(x, u, t, refs)
        )(xs[:-1], us, jnp.arange(T))
        u0 = jnp.zeros((B, nu), dtype)
        gT, lbT, ubT, GxT, _ = con_derivs_b(xs[-1], u0, T, refs)
        rmask = jnp.asarray(cf.terminal_constraint_row_mask)
        inf = jnp.asarray(jnp.inf, dtype)
        lbT = jnp.where(rmask[None], lbT, -inf)
        ubT = jnp.where(rmask[None], ubT, inf)
        g = jnp.concatenate([g, gT[None]])
        lb = jnp.concatenate([lb, lbT[None]])
        ub = jnp.concatenate([ub, ubT[None]])
        Gx = jnp.concatenate([Gx, GxT[None]])
        Gu = jnp.concatenate([Gu, jnp.zeros((1, B, nc, nu), dtype)])
        return g, lb, ub, Gx, Gu

    def constraint_vals(xs, us, refs):
        B = xs.shape[1]
        nu = us.shape[2]
        g, lb, ub = jax.vmap(
            lambda x, u, t: con_vals_b(x, u, t, refs)
        )(xs[:-1], us, jnp.arange(T))
        u0 = jnp.zeros((B, nu), xs.dtype)
        gT, lbT, ubT = con_vals_b(xs[-1], u0, T, refs)
        rmask = jnp.asarray(cf.terminal_constraint_row_mask)
        inf = jnp.asarray(jnp.inf, xs.dtype)
        lbT = jnp.where(rmask[None], lbT, -inf)
        ubT = jnp.where(rmask[None], ubT, inf)
        return (
            jnp.concatenate([g, gT[None]]),
            jnp.concatenate([lb, lbT[None]]),
            jnp.concatenate([ub, ubT[None]]),
        )

    def solve(x0s, refs, xs_in, us_in) -> CSQPSolution:
        xs = jnp.swapaxes(xs_in, 0, 1)  # time-major [T+1, B, nx]
        us = jnp.swapaxes(us_in, 0, 1)
        B = xs.shape[1]
        nx = xs.shape[2]
        nt = cf.ntan if manifold else nx
        nu = us.shape[2]
        dtype = xs.dtype
        rho = jnp.asarray(settings.rho, dtype)
        alphas = jnp.asarray(alphas_np, dtype)
        eye_u = jnp.eye(nu, dtype=dtype)
        reg = jnp.asarray(settings.reg_min, dtype)

        def gaps_of(xnext, xs):
            return jnp.concatenate(
                [sdiff_b(x0s, xs[0])[None], sdiff_tb(xnext, xs[1:])], axis=0)

        def factorize(dyn, costs, term, Gx, Gu):
            """rho-augmented Riccati factorization, once per SQP iteration."""
            _, Fx_all, Fu_all = dyn
            l, lx, lu, lxx, lxu, luu = costs

            def body(Vxx, inp):
                if nc > 0:
                    lxx_t, lxu_t, luu_t, Fx, Fu, gx, gu = inp
                    lxx_t = lxx_t + rho * jnp.einsum("bci,bcj->bij", gx, gx)
                    luu_t = luu_t + rho * jnp.einsum("bci,bcj->bij", gu, gu)
                    lxu_t = lxu_t + rho * jnp.einsum("bci,bcj->bij", gx, gu)
                else:
                    lxx_t, lxu_t, luu_t, Fx, Fu = inp
                VF = jnp.einsum("bij,bjk->bik", Vxx, Fx)
                Qxx = lxx_t + jnp.einsum("bji,bjk->bik", Fx, VF)
                VFu = jnp.einsum("bij,bjk->bik", Vxx, Fu)
                Quu = luu_t + jnp.einsum("bji,bjk->bik", Fu, VFu) + reg * eye_u
                Qux = jnp.swapaxes(lxu_t, -1, -2) + jnp.einsum(
                    "bji,bjk->bik", Fu, VF)
                L = jnp.linalg.cholesky(Quu)
                y = jax.lax.linalg.triangular_solve(
                    L, Qux, left_side=True, lower=True)
                K = jax.lax.linalg.triangular_solve(
                    L, y, left_side=True, lower=True, transpose_a=True)
                Vxx_new = Qxx - jnp.einsum("bji,bjk->bik", Qux, K)
                Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2))
                return Vxx_new, (L, K, Vxx)

            if nc > 0:
                VxxT = term[2] + rho * jnp.einsum(
                    "bci,bcj->bij", Gx[-1], Gx[-1])
                inputs = (lxx, lxu, luu, Fx_all, Fu_all, Gx[:-1], Gu[:-1])
            else:
                VxxT = term[2]
                inputs = (lxx, lxu, luu, Fx_all, Fu_all)
            _, (Ls, Ks, Vxx_next) = jax.lax.scan(
                body, VxxT, inputs, reverse=True, unroll=scan_unroll(T))
            bad = ~(
                jnp.all(jnp.isfinite(Ls.reshape(T, B, -1)), axis=(0, 2))
                & jnp.all(jnp.isfinite(Ks.reshape(T, B, -1)), axis=(0, 2)))
            return Ls, Ks, Vxx_next, bad

        def qp_sweep(dyn, costs, term, fs, Ls, Ks, Vxx_next, Gx, Gu, z, y):
            """Linear backward/forward sweep for given slack/dual terms."""
            _, Fx_all, Fu_all = dyn
            l, lx, lu, lxx, lxu, luu = costs
            if nc > 0:
                rx = lx + rho * jnp.einsum(
                    "tbci,tbc->tbi", Gx[:-1], y[:-1] - z[:-1])
                ru = lu + rho * jnp.einsum(
                    "tbci,tbc->tbi", Gu[:-1], y[:-1] - z[:-1])
                rxT = term[1] + rho * jnp.einsum(
                    "bci,bc->bi", Gx[-1], y[-1] - z[-1])
            else:
                rx, ru, rxT = lx, lu, term[1]

            def backward(Vx, inp):
                lx_t, lu_t, Fx, Fu, f_next, L, K, Vxx_n = inp
                Vx_plus = Vx + jnp.einsum("bij,bj->bi", Vxx_n, f_next)
                Qx = lx_t + jnp.einsum("bji,bj->bi", Fx, Vx_plus)
                Qu = lu_t + jnp.einsum("bji,bj->bi", Fu, Vx_plus)
                yv = jax.lax.linalg.triangular_solve(
                    L, Qu[..., None], left_side=True, lower=True)
                kk = jax.lax.linalg.triangular_solve(
                    L, yv, left_side=True, lower=True, transpose_a=True)[..., 0]
                Vx_new = Qx - jnp.einsum("bij,bi->bj", K, Qu)
                return Vx_new, (kk, Qu)

            _, (ks, Qus) = jax.lax.scan(
                backward, rxT,
                (rx, ru, Fx_all, Fu_all, fs[1:], Ls, Ks, Vxx_next),
                reverse=True, unroll=scan_unroll(T))

            def forward(dx, inp):
                kk, K, Fx, Fu, f_next = inp
                du = -kk - jnp.einsum("bij,bj->bi", K, dx)
                dx_next = (
                    jnp.einsum("bij,bj->bi", Fx, dx)
                    + jnp.einsum("bij,bj->bi", Fu, du) + f_next)
                return dx_next, (dx, du)

            dxT, (dxs, dus) = jax.lax.scan(
                forward, fs[0], (ks, Ks, Fx_all, Fu_all, fs[1:]),
                unroll=scan_unroll(T))
            dxs = jnp.concatenate([dxs, dxT[None]], axis=0)  # [T+1, B, nx]
            return dxs, dus, ks, Qus

        # ------------------------------------------------------------------
        # one SQP iteration
        # ------------------------------------------------------------------
        def sqp_iteration(carry, _):
            (xs, us, cost, kkt, converged, iters, qp_total,
             Ks_prev, ks_prev, y_carry) = carry
            dyn, costs, term = derivs_of(xs, us, refs)
            fs = gaps_of(dyn[0], xs)
            gap_sum = jnp.sum(jnp.abs(fs), axis=(0, 2))  # [B]
            if nc > 0:
                g, lb, ub, Gx, Gu = constraint_all(xs, us, refs)
                viol = jnp.sum(_violation(g, lb, ub), axis=(0, 2))  # [B]
            else:
                g = lb = ub = Gx = Gu = None
                viol = jnp.zeros((B,), dtype)

            Ls, Ks, Vxx_next, factor_bad = factorize(dyn, costs, term, Gx, Gu)

            if nc > 0:
                lo = lb - g
                hi = ub - g

                def cvals(dxs, dus):
                    cu = jnp.einsum("tbci,tbi->tbc", Gu[:-1], dus)
                    cx = jnp.einsum("tbci,tbi->tbc", Gx, dxs)
                    return cx + jnp.concatenate(
                        [cu, jnp.zeros((1, B, nc), dtype)], axis=0)

                def admm_cond(state):
                    _, _, _, _, _, done, n = state
                    return (~jnp.all(done)) & (n < settings.max_qp_iters)

                def admm_body(state):
                    z, y, dxs, dus, ks, done, n = state
                    dxs2, dus2, ks2, _ = qp_sweep(
                        dyn, costs, term, fs, Ls, Ks, Vxx_next, Gx, Gu, z, y)
                    c = cvals(dxs2, dus2)
                    z2 = jnp.clip(c + y, lo, hi)
                    y2 = y + c - z2
                    rp = jnp.max(jnp.abs(c - z2), axis=(0, 2))  # [B]
                    dz = z2 - z
                    rd = rho * jnp.maximum(
                        jnp.max(jnp.abs(jnp.einsum(
                            "tbci,tbc->tbi", Gx, dz)), axis=(0, 2)),
                        jnp.max(jnp.abs(jnp.einsum(
                            "tbci,tbc->tbi", Gu, dz)), axis=(0, 2)))
                    tol = settings.eps_abs + settings.eps_rel * jnp.maximum(
                        jnp.max(jnp.abs(z2), axis=(0, 2)), 1.0)
                    live = ~done
                    m3 = live[None, :, None]
                    z_out = jnp.where(m3, z2, z)
                    y_out = jnp.where(m3, y2, y)
                    dxs_out = jnp.where(m3, dxs2, dxs)
                    dus_out = jnp.where(m3, dus2, dus)
                    ks_out = jnp.where(m3, ks2, ks)
                    done2 = done | ((rp < tol) & (rd < tol))
                    return (z_out, y_out, dxs_out, dus_out, ks_out,
                            done2, n + 1)

                z0 = jnp.clip(jnp.zeros((T + 1, B, nc), dtype), lo, hi)
                # WARM-STARTED duals carried across SQP iterations (r04)
                y0 = y_carry
                init = (
                    z0, y0,
                    jnp.zeros((T + 1, B, nt), dtype),
                    jnp.zeros((T, B, nu), dtype),
                    jnp.zeros((T, B, nu), dtype),
                    converged,  # already-converged scenarios skip the QP
                    jnp.asarray(0, jnp.int32))
                z, y, dxs, dus, ks, qp_done, qp_n = jax.lax.while_loop(
                    admm_cond, admm_body, init)
                # TRUE stationarity with the ADMM duals mu = rho*y:
                # qp_sweep(z=0, y) builds l* + G^T mu; its Qu output is the
                # reduced Lagrangian gradient (mim_solvers KKT criterion,
                # VERDICT r03 #3 — replaces the max|du| step-size proxy)
                _, _, _, Qus_kkt = qp_sweep(
                    dyn, costs, term, fs, Ls, Ks, Vxx_next, Gx, Gu,
                    jnp.zeros_like(z), y)
            else:
                dxs, dus, ks, Qus_kkt = qp_sweep(
                    dyn, costs, term, fs, Ls, Ks, Vxx_next,
                    None, None, None, None)
                qp_n = jnp.asarray(1, jnp.int32)

            step_bad = factor_bad | ~(
                jnp.all(jnp.isfinite(dxs.reshape(T + 1, B, -1)), axis=(0, 2))
                & jnp.all(jnp.isfinite(dus.reshape(T, B, -1)), axis=(0, 2)))
            dxs = jnp.where(step_bad[None, :, None], 0.0, dxs)
            dus = jnp.where(step_bad[None, :, None], 0.0, dus)

            # ---- filter line search, all alphas folded into the batch ----
            A = n_alphas
            if manifold:
                xs_a = jax.vmap(
                    lambda a: sint_tb(xs, a * dxs), out_axes=2)(alphas)
            else:
                xs_a = (xs[:, :, None]
                        + alphas[None, None, :, None] * dxs[:, :, None])
            us_a = us[:, :, None] + alphas[None, None, :, None] * dus[:, :, None]
            # shapes [T(+1), B, A, nx]; flatten (B, A) for evaluation
            xs_f = xs_a.reshape(T + 1, B * A, nx)
            us_f = us_a.reshape(T, B * A, nu)
            cost_a = total_cost(xs_f, us_f, refs).reshape(B, A)
            x_flat = xs_f[:-1].reshape(T * B * A, nx)
            u_flat = us_f.reshape(T * B * A, nu)
            dts_flat = jnp.repeat(jnp.asarray(ts_np, dtype), B * A)
            if manifold:
                t_flat3 = jnp.repeat(jnp.arange(T, dtype=jnp.int32), B * A)
                xnext_f = jax.vmap(
                    lambda x, u, t: cf.step(x, u, t, refs)
                )(x_flat, u_flat, t_flat3).reshape(T, B * A, nx)
            else:
                xnext_f = step_b(
                    x_flat, u_flat, dts_flat).reshape(T, B * A, nx)
            x0_rep = jnp.repeat(x0s, A, axis=0)
            _sd = jax.vmap(sdiff) if manifold else sdiff
            gaps_f = jnp.concatenate(
                [_sd(x0_rep, xs_f[0])[None],
                 sdiff_tb(xnext_f, xs_f[1:])], axis=0)
            gap_a = jnp.sum(jnp.abs(gaps_f), axis=(0, 2)).reshape(B, A)
            if nc > 0:
                g_f, lb_f, ub_f = constraint_vals(xs_f, us_f, refs)
                viol_a = jnp.sum(
                    _violation(g_f, lb_f, ub_f), axis=(0, 2)).reshape(B, A)
            else:
                viol_a = jnp.zeros((B, A), dtype)
            infeas_a = gap_a + viol_a
            infeas0 = gap_sum + viol  # [B]
            finite = (
                jnp.all(jnp.isfinite(xs_f.reshape(T + 1, B, A, nx)),
                        axis=(0, 3))
                & jnp.isfinite(cost_a))
            accept = finite & (
                (cost_a < cost[:, None])
                | (infeas_a < infeas0[:, None] * (1.0 - 1e-8)))
            any_accept = jnp.any(accept, axis=1) & ~step_bad  # [B]
            best = jnp.argmax(accept, axis=1)  # [B]

            bidx = jnp.arange(B)
            xs_best = xs_a[:, bidx, best]  # [T+1, B, nx]
            us_best = us_a[:, bidx, best]
            cost_best = cost_a[bidx, best]

            # honest KKT: feasibility + Lagrangian stationarity (per scenario),
            # measured at the CURRENT iterate — scenarios that meet the
            # tolerance return this verified iterate (no further step)
            kkt_raw = jnp.maximum(
                jnp.maximum(
                    jnp.max(jnp.abs(fs), axis=(0, 2)),
                    jnp.max(_violation(g, lb, ub), axis=(0, 2))
                    if nc > 0 else jnp.zeros((B,), dtype)),
                jnp.max(jnp.abs(Qus_kkt), axis=(0, 2)))
            kkt_new = jnp.where(step_bad | ~jnp.isfinite(kkt_raw),
                                jnp.full((B,), jnp.inf, dtype), kkt_raw)
            newly_conv = kkt_new < settings.termination_tolerance

            ok = any_accept & ~converged & ~newly_conv
            xs_out = jnp.where(ok[None, :, None], xs_best, xs)
            us_out = jnp.where(ok[None, :, None], us_best, us)
            cost_out = jnp.where(ok, cost_best, cost)

            live = ~converged
            kkt_out = jnp.where(live, kkt_new, kkt)
            Ks_out = jnp.where(live[None, :, None, None], Ks, Ks_prev)
            ks_out = jnp.where(live[None, :, None], ks, ks_prev)
            iters_out = iters + live.astype(iters.dtype)
            qp_out = qp_total + jnp.where(live, qp_n, 0)
            conv_out = converged | newly_conv
            if nc > 0:
                y_next = jnp.where(live[None, :, None], y, y_carry)
            else:
                y_next = y_carry
            return (xs_out, us_out, cost_out, kkt_out, conv_out,
                    iters_out, qp_out, Ks_out, ks_out, y_next), None

        cost0 = total_cost(xs, us, refs)
        init = (
            xs, us, cost0,
            jnp.full((B,), jnp.inf, dtype),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((T, B, nu, nt), dtype),
            jnp.zeros((T, B, nu), dtype),
            jnp.zeros((T + 1, B, max(nc, 1)), dtype),  # ADMM dual carry
        )
        (xs, us, cost, kkt, converged, iters, qp_total, Ks, ks,
         _y), _ = (
            jax.lax.scan(sqp_iteration, init, None,
                         length=settings.max_iters))

        # final feasibility report
        dyn, costs, term_f = derivs_of(xs, us, refs)
        fs = gaps_of(dyn[0], xs)
        gap_norm = jnp.max(jnp.abs(fs), axis=(0, 2))
        if nc > 0:
            g, lb, ub = constraint_vals(xs, us, refs)
            cnorm = jnp.max(_violation(g, lb, ub), axis=(0, 2))
        else:
            cnorm = jnp.zeros((B,), dtype)
        return CSQPSolution(
            xs=jnp.swapaxes(xs, 0, 1),
            us=jnp.swapaxes(us, 0, 1),
            K=jnp.swapaxes(Ks, 0, 1),
            k=jnp.swapaxes(ks, 0, 1),
            cost=cost,
            kkt=kkt,
            gap_norm=gap_norm,
            constraint_norm=cnorm,
            iters=iters,
            qp_iters=qp_total,
            converged=converged,
        )

    return solve
