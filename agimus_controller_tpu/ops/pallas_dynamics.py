"""Fused Pallas TPU kernels for rigid-body dynamics (+ derivatives).

Why: the component-form step (`batched_dynamics.py`) compiles to thousands
of small XLA ops; at latency-critical batch sizes each op costs ~2-5 us of
issue overhead, so a T*B=800-node derivative pass costs ~0.9 ms even though
the arithmetic is trivial. Inside ONE Pallas kernel the same component-form
trace (every scalar of the computation = one (8,128) VMEM tile op) runs at
~1-2 ns/op — the whole RNEA + mass matrix + Cholesky + 14-tangent Jacobian
body is a single dispatch.

The kernels re-trace the *existing* component-form functions
(`_rnea_c`, `_joint_transforms`, `_mass_matrix_cols`) unchanged — inside a
pallas kernel their "[B] scalars" are (8,128) tiles. Reverse-mode
`jax.vjp` also traces cleanly inside the kernel (validated numerically vs
`make_batched_step_with_derivs` to ~1e-7).

Layout: node-minor "component" layout — each state/control component is a
row of tiles: `x_cl [nx, R, 128]` where `R*128 = N` padded nodes. Dense
`[N, nx]` wrappers handle the (cheap, XLA-side) transposes.

Reference parity: these kernels implement the same contract as Pinocchio's
ABA/RNEA-derivative path inside Crocoddyl's
`DifferentialActionModelFreeFwdDynamics.calc/calcDiff` (SURVEY.md §2b N3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.model import ModelParams, RobotModel
from .batched_dynamics import (
    _StaticModel,
    _joint_transforms,
    _mass_matrix_cols,
    _rnea_c,
)

LANES = 128
SUBLANES = 8
BLOCK_NODES = SUBLANES * LANES  # 1024 nodes per grid step


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _chol_factor_c(M, n):
    """Unrolled scalar Cholesky of an SPD component matrix (list-of-lists)."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]
    return L


def _chol_solve_col(L, bcol, n):
    """Solve (L L^T) x = b for one component column vector."""
    y = [None] * n
    for i in range(n):
        s = bcol[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def dynamics_terms(sm: _StaticModel, q, v, u, dt, with_derivs: bool):
    """Component-form Euler step (+ Fx, Fu via the RNEA identity).

    q/v/u: lists of component tiles, dt a tile. Returns
    (xnext list[nx], fx list[nx*nx] | None, fu list[nx*nj] | None).
    All temporaries stay 2D — 3D packing inside a pallas kernel forces
    Mosaic relayouts (measured ~10x slower)."""
    nj = sm.nj
    Xs = _joint_transforms(sm, q)
    zero = [jnp.zeros_like(q[0])] * nj
    b = _rnea_c(sm, q, v, zero, Xs)
    M = _mass_matrix_cols(sm, Xs)
    rhs = [u[i] - b[i] for i in range(nj)]
    L = _chol_factor_c(M, nj)
    a = _chol_solve_col(L, rhs, nj)

    xnext = [None] * (2 * nj)
    for i in range(nj):
        vn = v[i] + dt * a[i]
        xnext[nj + i] = vn
        xnext[i] = q[i] + dt * vn
    if not with_derivs:
        return xnext, None, None

    # d rnea(q, v, a)/d(q, v) at fixed a: nj reverse-mode rows
    def rnea_qv(qv):
        ql = [qv[i] for i in range(nj)]
        vl = [qv[nj + i] for i in range(nj)]
        Xs2 = _joint_transforms(sm, ql)
        return jnp.stack(_rnea_c(sm, ql, vl, a, Xs2))

    qv = jnp.stack(q + v)
    _, pullback = jax.vjp(rnea_qv, qv)
    rows = []
    for i in range(nj):
        ct = jnp.stack([
            jnp.full_like(qv[0], 1.0 if j == i else 0.0) for j in range(nj)])
        (g,) = pullback(ct)
        rows.append(g)  # [2nj, 8, 128]: d tau_i / d (q, v)

    one = jnp.ones_like(q[0])
    zero_t = jnp.zeros_like(q[0])
    # Minv columns (unit rhs) and da columns (da[:,k] = -Minv drnea[:,k]),
    # per-column substitutions to keep every temp 2D
    minv_cols = [
        _chol_solve_col(L, [one if i == j else zero_t for i in range(nj)], nj)
        for j in range(nj)
    ]  # minv_cols[j][i] = Minv[i, j]
    da_cols = [
        _chol_solve_col(L, [-rows[i][k] for i in range(nj)], nj)
        for k in range(2 * nj)
    ]  # da_cols[k][i] = d a_i / d qv_k

    # semi-implicit Euler chain rule: v+ = v + dt a ; q+ = q + dt v+
    dt2 = dt * dt
    fx = [None] * (4 * nj * nj)
    fu = [None] * (2 * nj * nj)
    for i in range(nj):
        for k in range(2 * nj):
            da_ik = da_cols[k][i]
            if k < nj:
                fx[i * 2 * nj + k] = (1.0 if k == i else 0.0) + dt2 * da_ik
                fx[(nj + i) * 2 * nj + k] = dt * da_ik
            else:
                fx[i * 2 * nj + k] = (dt if k - nj == i else 0.0) + dt2 * da_ik
                fx[(nj + i) * 2 * nj + k] = (
                    1.0 if k - nj == i else 0.0) + dt * da_ik
        for j in range(nj):
            fu[i * nj + j] = dt2 * minv_cols[j][i]
            fu[(nj + i) * nj + j] = dt * minv_cols[j][i]
    return xnext, fx, fu


def _step_derivs_kernel(sm: _StaticModel, with_derivs: bool,
                        x_ref, u_ref, dt_ref, *out_refs):
    """Kernel body: one block of nodes through `dynamics_terms`."""
    nj = sm.nj
    q = [x_ref[i] for i in range(nj)]
    v = [x_ref[nj + i] for i in range(nj)]
    u = [u_ref[i] for i in range(nj)]
    dt = dt_ref[0]
    xnext, fx, fu = dynamics_terms(sm, q, v, u, dt, with_derivs)
    for i in range(2 * nj):
        out_refs[0][i] = xnext[i]
    if with_derivs:
        _, fx_ref, fu_ref = out_refs
        for i, val in enumerate(fx):
            fx_ref[i] = val
        for i, val in enumerate(fu):
            fu_ref[i] = val


def _build(model: RobotModel, params: ModelParams, with_derivs: bool,
           interpret: bool = False):
    sm = _StaticModel(model, params)
    nj = sm.nj
    nx = 2 * nj
    kernel = functools.partial(_step_derivs_kernel, sm, with_derivs)

    def run_cl(x_cl, u_cl, dt_cl):
        """Component-layout entry: x_cl [nx, R, 128], u_cl [nj, R, 128],
        dt_cl [1, R, 128] with R a multiple of 8."""
        R = x_cl.shape[1]
        grid = R // SUBLANES
        blk = lambda c: pl.BlockSpec(
            (c, SUBLANES, LANES),
            # literal 0 must stay i32: under jax x64 a Python-int
            # index-map return becomes i64 and Mosaic fails to
            # legalize 'func.return' (i64, i32, i64)
            lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM)
        if with_derivs:
            out_shape = (
                jax.ShapeDtypeStruct((nx, R, LANES), x_cl.dtype),
                jax.ShapeDtypeStruct((nx * nx, R, LANES), x_cl.dtype),
                jax.ShapeDtypeStruct((nx * nj, R, LANES), x_cl.dtype),
            )
            out_specs = (blk(nx), blk(nx * nx), blk(nx * nj))
        else:
            out_shape = jax.ShapeDtypeStruct((nx, R, LANES), x_cl.dtype)
            out_specs = blk(nx)
        # x64 OFF during kernel trace: all kernel data is f32, and under
        # jax x64 trace-time 64-bit literals/vectors crash Mosaic
        # ("Check failed: bitwidth_ <= 32")
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                out_shape=out_shape,
                in_specs=[blk(nx), blk(nj), blk(1)],
                out_specs=out_specs,
                interpret=interpret,
            )(x_cl, u_cl, dt_cl)

    def to_cl(arr, n_comp, N_pad):
        # [N, n_comp] -> [n_comp, R, 128] with zero padding
        N = arr.shape[0]
        at = arr.T
        if N_pad != N:
            at = jnp.concatenate(
                [at, jnp.zeros((n_comp, N_pad - N), arr.dtype)], axis=1)
        return at.reshape(n_comp, N_pad // LANES, LANES)

    def dense(x, u, dt):
        """Dense entry: x [N, nx], u [N, nj], dt scalar or [N]."""
        N = x.shape[0]
        N_pad = _round_up(max(N, 1), BLOCK_NODES)
        dt_arr = jnp.broadcast_to(jnp.asarray(dt, x.dtype), (N,))
        x_cl = to_cl(x, nx, N_pad)
        u_cl = to_cl(u, nj, N_pad)
        # pad dt with ones: zero dt is fine too, but keep chol well-posed on
        # padded (all-zero q) rows -> q=0 is a valid configuration, safe.
        dt_cl = to_cl(dt_arr[:, None], 1, N_pad)
        out = run_cl(x_cl, u_cl, dt_cl)
        if with_derivs:
            xn_cl, fx_cl, fu_cl = out
            xn = xn_cl.reshape(nx, N_pad)[:, :N].T
            Fx = jnp.moveaxis(
                fx_cl.reshape(nx, nx, N_pad)[:, :, :N], 2, 0)
            Fu = jnp.moveaxis(
                fu_cl.reshape(nx, nj, N_pad)[:, :, :N], 2, 0)
            return xn, Fx, Fu
        return out.reshape(nx, N_pad)[:, :N].T

    dense.component_layout = run_cl
    return dense


def make_pallas_step(model: RobotModel, params: ModelParams,
                     interpret: bool = False):
    """`step(x [N,nx], u [N,nj], dt) -> x_next [N,nx]` as ONE fused kernel.
    Same semantics as `make_batched_step` (semi-implicit Euler)."""
    return _build(model, params, with_derivs=False, interpret=interpret)


def make_pallas_step_derivs(model: RobotModel, params: ModelParams,
                            interpret: bool = False):
    """`f(x, u, dt) -> (x_next, Fx [N,nx,nx], Fu [N,nx,nj])` as ONE fused
    kernel. Same semantics as `make_batched_step_with_derivs`."""
    return _build(model, params, with_derivs=True, interpret=interpret)
