"""Batch-minor Riccati backward pass (full-lane layout).

The dense backward sweep works on `[B, nx, nx]` arrays: XLA lays the minor
`nx=14` dimension across the 128-wide vector lanes, wasting ~9x of the VPU,
and the batched 7x7 Cholesky/triangular solves are worse. Here every tensor
is stored with the batch as the MINOR (lane) dimension — `Vxx [nx, nx, B]`,
`Fx [nx, nx, B]` — so the small-matrix products become broadcast-multiply-
reduce over fully-populated lanes:

    (Vxx Fx)[i,j,b] = sum_k Vxx[i,k,b] * Fx[k,j,b]
                    = jnp.sum(Vxx[:, :, None, :] * Fx[None, :, :, :], 1)

one fused HLO per product (compile-friendly, unlike a fully scalar-unrolled
form), with the 14-point contraction in sublanes and B in lanes — zero
padding at any B that is a multiple of 128. The 7x7 Cholesky and the
triangular solves are unrolled scalar recurrences over `[B]` (and `[n, B]`)
vectors.

Math is identical to the dense sweep in `fddp_batch.backward` (Crocoddyl
FDDP backward pass with gap folding); validated element-wise in
tests/test_riccati_components.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mm(A, B_):
    """[n, m, B] @ [m, p, B] -> [n, p, B] (contraction in sublanes)."""
    return jnp.sum(A[:, :, None, :] * B_[None, :, :, :], axis=1)


def _mm_T1(A, B_):
    """A^T @ B with A [m, n, B], B [m, p, B] -> [n, p, B]."""
    return jnp.sum(A[:, :, None, :] * B_[:, None, :, :], axis=0)


def _mv(A, v):
    """[n, m, B] @ [m, B] -> [n, B]."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _mv_T(A, v):
    """A^T @ v with A [m, n, B], v [m, B] -> [n, B]."""
    return jnp.sum(A * v[:, None, :], axis=0)


def _chol_lanes(A, n):
    """Cholesky of SPD A [n, n, B] -> rows list L[i][j] of [B] vectors."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def _chol_solve_lanes(L, rhs, n):
    """Solve (L L^T) X = rhs with rhs [n, p, B] -> [n, p, B]."""
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k][None, :] * y[k]
        y[i] = s / L[i][i][None, :]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][None, :] * x[k]
        x[i] = s / L[i][i][None, :]
    return jnp.stack(x, axis=0)


def backward_components(Fx, Fu, lx, lu, lxx, lxu, luu, fs,
                        term_lx, term_lxx, reg):
    """FDDP backward Riccati sweep, batch-minor layout.

    Args (dense, time-major): Fx [T,B,nx,nx], Fu [T,B,nx,nu], lx [T,B,nx],
    lu [T,B,nu], lxx [T,B,nx,nx], lxu [T,B,nx,nu], luu [T,B,nu,nu],
    fs [T+1,B,nx] dynamics gaps, term_lx [B,nx], term_lxx [B,nx,nx],
    reg [B] Levenberg-Marquardt parameter.

    Returns (ks [T,B,nu], Ks [T,B,nu,nx], Qus [T,B,nu], d1 [B], d2 [B],
    bad [B]) — identical semantics to the dense `fddp_batch.backward`.
    """
    T, B, nx, nu = Fu.shape
    dtype = Fx.dtype

    # relayout once, outside the scan: batch into the minor (lane) dim
    Fx_t = jnp.transpose(Fx, (0, 2, 3, 1))      # [T, nx, nx, B]
    Fu_t = jnp.transpose(Fu, (0, 2, 3, 1))      # [T, nx, nu, B]
    lx_t = jnp.transpose(lx, (0, 2, 1))         # [T, nx, B]
    lu_t = jnp.transpose(lu, (0, 2, 1))
    lxx_t = jnp.transpose(lxx, (0, 2, 3, 1))
    lxu_t = jnp.transpose(lxu, (0, 2, 3, 1))    # [T, nx, nu, B]
    luu_t = jnp.transpose(luu, (0, 2, 3, 1))
    fnext_t = jnp.transpose(fs[1:], (0, 2, 1))  # [T, nx, B]

    VxT = jnp.transpose(term_lx)                # [nx, B]
    VxxT = jnp.transpose(term_lxx, (1, 2, 0))   # [nx, nx, B]
    zero = jnp.zeros((B,), dtype)

    def body(carry, inp):
        Vx, Vxx, d1, d2 = carry
        lxn, lun, lxxn, lxun, luun, Fxn, Fun, fn = inp
        Vxp = Vx + _mv(Vxx, fn)                        # [nx, B]
        Qx = lxn + _mv_T(Fxn, Vxp)                     # [nx, B]
        Qu = lun + _mv_T(Fun, Vxp)                     # [nu, B]
        M = _mm(Vxx, Fxn)                              # Vxx Fx   [nx, nx, B]
        N = _mm(Vxx, Fun)                              # Vxx Fu   [nx, nu, B]
        Qxx = lxxn + _mm_T1(Fxn, M)                    # [nx, nx, B]
        # Qux = lxu^T + Fu^T (Vxx Fx)
        Qux = jnp.swapaxes(lxun, 0, 1) + _mm_T1(Fun, M)  # [nu, nx, B]
        Quu = luun + _mm_T1(Fun, N)                    # [nu, nu, B]
        Quu = Quu + reg[None, None, :] * jnp.eye(nu, dtype=dtype)[:, :, None]
        L = _chol_lanes(Quu, nu)
        kk = _chol_solve_lanes(L, Qu[:, None, :], nu)[:, 0, :]  # [nu, B]
        KK = _chol_solve_lanes(L, Qux, nu)             # [nu, nx, B]
        Vx_new = Qx - _mv_T(Qux, kk)                   # Qux^T kk
        QK = _mm_T1(Qux, KK)                           # Qux^T KK [nx, nx, B]
        Vxx_new = Qxx - 0.5 * (QK + jnp.swapaxes(QK, 0, 1))
        d1n = d1 + jnp.sum(Qu * kk, axis=0)
        d2n = d2 + jnp.sum(kk[:, None, :] * Quu * kk[None, :, :],
                           axis=(0, 1))
        return (Vx_new, Vxx_new, d1n, d2n), (kk, KK, Qu)

    (Vx, Vxx, d1, d2), (ks_t, Ks_t, Qus_t) = jax.lax.scan(
        body, (VxT, VxxT, zero, zero),
        (lx_t, lu_t, lxx_t, lxu_t, luu_t, Fx_t, Fu_t, fnext_t),
        reverse=True,
    )
    ks = jnp.transpose(ks_t, (0, 2, 1))       # [T, B, nu]
    Ks = jnp.transpose(Ks_t, (0, 3, 1, 2))    # [T, B, nu, nx]
    Qus = jnp.transpose(Qus_t, (0, 2, 1))
    bad = ~jnp.all(jnp.isfinite(ks_t.reshape(T, -1, B)), axis=(0, 1)) | (
        ~jnp.all(jnp.isfinite(Ks_t.reshape(T, -1, B)), axis=(0, 1)))
    return ks, Ks, Qus, d1, d2, bad
