"""Constrained SQP solver (mim_solvers `SolverCSQP` semantics) in JAX.

The reference's runtime solver (`ocp_base_croco.py:64-80`, SURVEY.md §2b N4):
sequential quadratic programming where each iteration linearizes dynamics,
costs and inequality constraints and solves the stagewise QP

    min  sum_t  1/2 d' H_t d + h_t' d
    s.t. dx_{t+1} = Fx dx_t + Fu du_t + gap_{t+1},   dx_0 = gap_0,
         lb_t <= g_t + Gx_t dx_t + Gu_t du_t <= ub_t

with OSQP-style scaled ADMM over a Riccati factorization:

- the rho-augmented quadratic part (H_t + rho G_t'G_t) is factorized ONCE
  per SQP iteration (Cholesky of Quu + feedback gains K_t + value Hessians),
  so each of the up-to-`max_qp_iters` ADMM iterations is only a LINEAR
  backward/forward sweep plus slack clip + dual update — mim_solvers' trick,
- masked convergence on the OSQP primal/dual residuals (eps_abs/eps_rel,
  `ocp_param_base.py:53-61`),
- filter line search on (cost, dynamics gap + constraint violation) — the
  `use_filter_line_search` behavior of the reference,
- fixed shapes and `lax.scan` everywhere: jit once, `vmap` over scenarios,
  shard over meshes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ocp.costs import CostFunctions
from .fddp import SolverSettings, _total_cost


@dataclasses.dataclass(frozen=True)
class CSQPSettings(SolverSettings):
    max_qp_iters: int = 200
    eps_abs: float = 1e-6
    eps_rel: float = 0.0
    rho: float = 1e-1
    # OSQP-style per-scenario rho adaptation between SQP iterations
    # (mim_solvers adapts rho the same way); batch solver only
    adaptive_rho: bool = True
    # f64 accumulation in the Riccati factorization / QP vector sweeps /
    # KKT evaluation and line-search cost sums when the trajectory dtype
    # is f32. Engages only when jax x64 is enabled (otherwise f64
    # canonicalizes to f32 and this is inert); batch sqp solver only.
    # Default OFF: measured on the chained T=100 collision bench (r05),
    # promoting the sweeps alone does NOT move the ~1e-3 stall (the floor
    # is the f32 STAGE data — f64-everything converges in p50 2
    # iterations, f64 sweeps over f32 stages change nothing) and costs
    # ~2.5x throughput under x64 on the chip. Kept as an honest knob for
    # f64-capable deployments.
    sweep_f64: bool = False
    # Constraint-envelope acceptance in the filter line search (batch sqp
    # solver): accepted trials must keep max-violation within
    # max(current, tol, envelope_tol) — blocks the violation-for-cost
    # trades that limit-cycle on boundary-riding optima. Off = the plain
    # mim_solvers filter (used by the cross-solver equivalence tests,
    # which pin identical iteration PATHS, not just optima).
    constraint_envelope: bool = True
    # Envelope floor: accepted
    # trials must keep max-violation within max(current, tol, THIS). The
    # floor exists because the achievable per-step feasibility is set by
    # the ADMM exit residual (~1e-6 at realistic qp budgets), not by the
    # outer termination tolerance — with a tight tolerance (1e-8 in the
    # cross-solver equivalence tests) an unfloored envelope rejects every
    # alpha and freezes the solver with open gaps.
    envelope_tol: float = 1e-5
    # Second-order (Maratos) correction: after the ADMM step, re-evaluate
    # the NONLINEAR constraints at the trial point and re-run this many
    # warm-started ADMM iterations against curvature-shifted bounds. The
    # bench's keep-away optimum RIDES a curved boundary (goal inside the
    # band), where plain linearization leaves O(|step|^2 * curvature)
    # intrusion (~1.4-3.5 mm of a 20 mm band measured); SOC repairs it.
    soc_iters: int = 4


class CSQPSolution(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    K: jnp.ndarray  # [T, nu, nx] Riccati feedback gains (rho-augmented)
    k: jnp.ndarray  # [T, nu] last QP feed-forward step
    cost: jnp.ndarray
    kkt: jnp.ndarray
    gap_norm: jnp.ndarray
    constraint_norm: jnp.ndarray
    iters: jnp.ndarray
    qp_iters: jnp.ndarray
    converged: jnp.ndarray


def _violation(g, lb, ub):
    return jnp.maximum(jnp.maximum(lb - g, g - ub), 0.0)


def solve_csqp(
    cf: CostFunctions,
    x0,
    refs,
    xs_init,
    us_init,
    settings: CSQPSettings = CSQPSettings(),
) -> CSQPSolution:
    """Solve the constrained OCP from a warm start. Pure & jittable."""
    T = us_init.shape[0]
    nx = xs_init.shape[1]
    nu = us_init.shape[1]
    nc = cf.n_constraints
    dtype = xs_init.dtype
    rho = jnp.asarray(settings.rho, dtype)
    alphas = jnp.asarray([0.5**i for i in range(settings.n_alphas)], dtype)
    ts = jnp.arange(T)

    def stage_all(xs, us):
        d = jax.vmap(lambda x, u, t: cf.stage_derivs(x, u, t, refs))(xs[:-1], us, ts)
        term = cf.terminal_derivs(xs[-1], refs)
        return d, term

    def constraint_all(xs, us):
        """[T+1]-node constraint data; terminal node keeps terminal-flagged
        rows only (others unbounded) and has no control columns."""
        g, lb, ub, Gx, Gu = jax.vmap(
            lambda x, u, t: cf.constraint_derivs(x, u, t, refs)
        )(xs[:-1], us, ts)
        u0 = jnp.zeros((nu,), dtype)
        gT, lbT, ubT, GxT, _ = cf.constraint_derivs(xs[-1], u0, T, refs)
        rmask = jnp.asarray(cf.terminal_constraint_row_mask)
        inf = jnp.asarray(jnp.inf, dtype)
        lbT = jnp.where(rmask, lbT, -inf)
        ubT = jnp.where(rmask, ubT, inf)
        g = jnp.concatenate([g, gT[None]])
        lb = jnp.concatenate([lb, lbT[None]])
        ub = jnp.concatenate([ub, ubT[None]])
        Gx = jnp.concatenate([Gx, GxT[None]])
        Gu = jnp.concatenate([Gu, jnp.zeros((1, nc, nu), dtype)])
        return g, lb, ub, Gx, Gu

    def gaps_of(d, xs):
        return jnp.concatenate([(x0 - xs[0])[None], d.xnext - xs[1:]], axis=0)

    # ------------------------------------------------------------------
    # one SQP iteration
    # ------------------------------------------------------------------
    def sqp_iteration(carry, _):
        (xs, us, cost, merit_inf, kkt, converged, iters, qp_total, Ks_prev,
         ks_prev, y_carry) = carry
        d, term = stage_all(xs, us)
        fs = gaps_of(d, xs)
        gap_norm = jnp.sum(jnp.abs(fs))
        if nc > 0:
            g, lb, ub, Gx, Gu = constraint_all(xs, us)
            viol = jnp.sum(_violation(g, lb, ub))
        else:
            g = lb = ub = Gx = Gu = None
            viol = jnp.zeros((), dtype)

        # ---- factorize the rho-augmented quadratic part (once) ----------
        reg = jnp.asarray(settings.reg_min, dtype)

        def factor_body(Vxx, inp):
            if nc > 0:
                lxx, lxu, luu, Fx, Fu, gx, gu = inp
                lxx = lxx + rho * gx.T @ gx
                luu = luu + rho * gu.T @ gu
                lxu = lxu + rho * gx.T @ gu
            else:
                lxx, lxu, luu, Fx, Fu = inp
            Qxx = lxx + Fx.T @ Vxx @ Fx
            Quu = luu + Fu.T @ Vxx @ Fu + reg * jnp.eye(nu, dtype=dtype)
            Qux = lxu.T + Fu.T @ Vxx @ Fx
            L = jnp.linalg.cholesky(Quu)
            K = jax.scipy.linalg.cho_solve((L, True), Qux)
            Vxx_new = Qxx - Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return Vxx_new, (L, K, Vxx)

        VxxT = term.lxx + (rho * Gx[-1].T @ Gx[-1] if nc > 0 else 0.0)
        inputs = (
            (d.lxx, d.lxu, d.luu, d.Fx, d.Fu, Gx[:-1], Gu[:-1])
            if nc > 0
            else (d.lxx, d.lxu, d.luu, d.Fx, d.Fu)
        )
        # emit Vxx_next (the carry BEFORE update) at each node = V_{t+1}
        _, (Ls, Ks, Vxx_next) = jax.lax.scan(factor_body, VxxT, inputs, reverse=True)
        factor_bad = ~(jnp.all(jnp.isfinite(Ls)) & jnp.all(jnp.isfinite(Ks)))

        # ---- linear sweep given slack/dual linear terms ------------------
        def qp_sweep(z, y):
            if nc > 0:
                rx = d.lx + rho * jnp.einsum("tci,tc->ti", Gx[:-1], y[:-1] - z[:-1])
                ru = d.lu + rho * jnp.einsum("tci,tc->ti", Gu[:-1], y[:-1] - z[:-1])
                rxT = term.lx + rho * Gx[-1].T @ (y[-1] - z[-1])
            else:
                rx, ru, rxT = d.lx, d.lu, term.lx

            def backward(Vx, inp):
                lx, lu, Fx, Fu, f_next, L, K, Vxx_n = inp
                Vx_plus = Vx + Vxx_n @ f_next
                Qx = lx + Fx.T @ Vx_plus
                Qu = lu + Fu.T @ Vx_plus
                kk = jax.scipy.linalg.cho_solve((L, True), Qu)
                Vx_new = Qx - K.T @ Qu
                return Vx_new, (kk, Qu)

            _, (ks, Qus) = jax.lax.scan(
                backward, rxT, (rx, ru, d.Fx, d.Fu, fs[1:], Ls, Ks, Vxx_next),
                reverse=True,
            )

            def forward(dx, inp):
                kk, K, Fx, Fu, f_next = inp
                du = -kk - K @ dx
                dx_next = Fx @ dx + Fu @ du + f_next
                return dx_next, (dx, du)

            dxT, (dxs, dus) = jax.lax.scan(
                forward, fs[0], (ks, Ks, d.Fx, d.Fu, fs[1:])
            )
            dxs = jnp.concatenate([dxs, dxT[None]], axis=0)  # [T+1, nx]
            return dxs, dus, ks, Qus

        # ---- ADMM loop ---------------------------------------------------
        if nc > 0:
            lo = lb - g  # constraint sets in delta space
            hi = ub - g

            def cvals(dxs, dus):
                cu = jnp.einsum("tci,ti->tc", Gu[:-1], dus)
                cx = jnp.einsum("tci,ti->tc", Gx, dxs)
                return cx + jnp.concatenate([cu, jnp.zeros((1, nc), dtype)], axis=0)

            z0 = jnp.clip(jnp.zeros((T + 1, nc), dtype), lo, hi)
            # WARM-STARTED duals: carried across SQP iterations (mim_solvers
            # warm-starts its QP); cold duals make the outer loop creep on
            # curved active constraints (r04 finding in sqp_batch)
            y0 = y_carry

            def admm_body(state, _):
                z, y, dxs, dus, ks, r_prim, r_dual, done, n = state

                def do(_):
                    dxs2, dus2, ks2, _ = qp_sweep(z, y)
                    c = cvals(dxs2, dus2)
                    z2 = jnp.clip(c + y, lo, hi)
                    y2 = y + c - z2
                    rp = jnp.max(jnp.abs(c - z2))
                    dz = z2 - z
                    rd = rho * jnp.maximum(
                        jnp.max(jnp.abs(jnp.einsum("tci,tc->ti", Gx, dz))),
                        jnp.max(jnp.abs(jnp.einsum("tci,tc->ti", Gu, dz))),
                    )
                    return z2, y2, dxs2, dus2, ks2, rp, rd, n + 1

                z2, y2, dxs2, dus2, ks2, rp, rd, n2 = jax.lax.cond(
                    done, lambda _: (z, y, dxs, dus, ks, r_prim, r_dual, n), do, None
                )
                tol = settings.eps_abs + settings.eps_rel * jnp.maximum(
                    jnp.max(jnp.abs(z2)), 1.0
                )
                done2 = done | ((rp < tol) & (rd < tol))
                return (z2, y2, dxs2, dus2, ks2, rp, rd, done2, n2), None

            dxs0 = jnp.zeros((T + 1, nx), dtype)
            dus0 = jnp.zeros((T, nu), dtype)
            ks0 = jnp.zeros((T, nu), dtype)
            init = (z0, y0, dxs0, dus0, ks0,
                    jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                    jnp.asarray(False), jnp.asarray(0))
            (z, y, dxs, dus, ks, r_prim, r_dual, qp_done, qp_n), _ = jax.lax.scan(
                admm_body, init, None, length=settings.max_qp_iters
            )
            # TRUE stationarity of the original problem at the current
            # iterate: Lagrangian gradient in the reduced (u) space with the
            # inequality multipliers mu = rho*y from the ADMM (mim_solvers'
            # KKT criterion, `ocp_base_croco.py:134-140` — replaces the r03
            # `max|du|` step-size proxy, VERDICT #3). qp_sweep(0, y) builds
            # rx/ru = l* + rho G^T (y - 0) = l* + G^T mu.
            _, _, _, Qus_stat = qp_sweep(jnp.zeros_like(z), y)
            stat = jnp.max(jnp.abs(Qus_stat))
        else:
            dxs, dus, ks, Qus_stat = qp_sweep(None, None)
            stat = jnp.max(jnp.abs(Qus_stat))
            qp_n = jnp.asarray(1)

        step_bad = factor_bad | ~(jnp.all(jnp.isfinite(dxs)) & jnp.all(jnp.isfinite(dus)))
        dxs = jnp.where(step_bad, jnp.zeros_like(dxs), dxs)
        dus = jnp.where(step_bad, jnp.zeros_like(dus), dus)

        # ---- filter line search (SQP trial: linear state update) --------
        def trial(alpha):
            xs_t = xs + alpha * dxs
            us_t = us + alpha * dus
            cost_t = _total_cost(cf, T, xs_t, us_t, refs)
            xnext_t = jax.vmap(lambda x, u, t: cf.step(x, u, t, refs))(xs_t[:-1], us_t, ts)
            gap_t = jnp.sum(jnp.abs(
                jnp.concatenate([(x0 - xs_t[0])[None], xnext_t - xs_t[1:]], axis=0)))
            if nc > 0:
                g_t, lb_t, ub_t, _, _ = constraint_all(xs_t, us_t)
                viol_t = jnp.sum(_violation(g_t, lb_t, ub_t))
            else:
                viol_t = jnp.zeros((), dtype)
            return xs_t, us_t, cost_t, gap_t + viol_t

        xs_a, us_a, cost_a, infeas_a = jax.vmap(trial)(alphas)
        infeas0 = gap_norm + viol
        finite = jnp.all(jnp.isfinite(cost_a.reshape(settings.n_alphas, -1)), axis=-1)
        accept = finite & ((cost_a < cost) | (infeas_a < infeas0 * (1.0 - 1e-8)))
        any_accept = jnp.any(accept) & ~step_bad
        best = jnp.argmax(accept)

        xs_next = jnp.where(any_accept, xs_a[best], xs)
        us_next = jnp.where(any_accept, us_a[best], us)
        cost_next = jnp.where(any_accept, cost_a[best], cost)
        merit_next = jnp.where(any_accept, infeas_a[best], infeas0)

        # honest KKT at the current iterate: Lagrangian stationarity (with
        # the ADMM duals) + primal feasibility — the mim_solvers criterion
        # (`checkKKTConditions`); a failed factorization keeps the previous
        # value so a NaN sweep cannot fake convergence
        kkt_raw = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(fs)),
                        jnp.max(_violation(g, lb, ub)) if nc > 0 else 0.0),
            stat,
        )
        kkt_new = jnp.where(step_bad | ~jnp.isfinite(kkt_raw),
                            jnp.asarray(jnp.inf, dtype), kkt_raw)
        newly_conv = kkt_new < settings.termination_tolerance

        # KKT is measured at the CURRENT iterate: on convergence return this
        # verified iterate, not the unverified post-step point (mim_solvers
        # terminates before stepping further)
        keep = converged | newly_conv
        out_xs = jnp.where(keep, xs, xs_next)
        out_us = jnp.where(keep, us, us_next)
        out_cost = jnp.where(keep, cost, cost_next)
        out_merit = jnp.where(keep, merit_inf, merit_next)
        out_kkt = jnp.where(converged, kkt, kkt_new)
        out_K = jnp.where(converged, Ks_prev, Ks)
        out_k = jnp.where(converged, ks_prev, ks)
        out_iters = iters + jnp.where(converged, 0, 1)
        out_qp = qp_total + jnp.where(converged, 0, qp_n)
        if nc > 0:
            y_out = jnp.where(converged, y_carry, y)
        else:
            y_out = y_carry
        return (
            out_xs, out_us, out_cost, out_merit, out_kkt,
            converged | newly_conv, out_iters, out_qp, out_K, out_k, y_out,
        ), None

    cost0 = _total_cost(cf, T, xs_init, us_init, refs)
    init = (
        xs_init, us_init, cost0, jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype), jnp.asarray(False), jnp.asarray(0),
        jnp.asarray(0), jnp.zeros((T, nu, nx), dtype), jnp.zeros((T, nu), dtype),
        jnp.zeros((T + 1, max(nc, 1)), dtype),  # ADMM dual carry
    )
    (xs, us, cost, merit, kkt, converged, iters, qp_total, Ks, ks,
     _y), _ = jax.lax.scan(
        sqp_iteration, init, None, length=settings.max_iters
    )

    # final feasibility report
    d, term = stage_all(xs, us)
    fs = gaps_of(d, xs)
    gap_norm = jnp.max(jnp.abs(fs))
    if nc > 0:
        g, lb, ub, _, _ = constraint_all(xs, us)
        cnorm = jnp.max(_violation(g, lb, ub))
    else:
        cnorm = jnp.zeros((), dtype)
    return CSQPSolution(
        xs=xs, us=us, K=Ks, k=ks, cost=cost, kkt=kkt, gap_norm=gap_norm,
        constraint_norm=cnorm, iters=iters, qp_iters=qp_total, converged=converged,
    )
