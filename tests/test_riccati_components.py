"""Component-form Riccati backward pass must match the dense einsum sweep
element-wise (same math, different layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
from agimus_controller_tpu.solver.riccati_components import (
    backward_components,
    _chol_lanes,
    _chol_solve_lanes,
)


def test_chol_solve_lanes():
    rng = np.random.default_rng(0)
    n, B = 7, 5
    Ls = rng.normal(size=(B, n, n))
    A = np.einsum("bij,bkj->bik", Ls, Ls) + 3.0 * np.eye(n)
    b = rng.normal(size=(B, n))
    A_t = jnp.asarray(np.transpose(A, (1, 2, 0)))  # [n, n, B]
    rhs = jnp.asarray(b.T[:, None, :])  # [n, 1, B]
    L = _chol_lanes(A_t, n)
    x = np.asarray(_chol_solve_lanes(L, rhs, n))[:, 0, :].T  # [B, n]
    want = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
    np.testing.assert_allclose(x, want, atol=1e-10)


def test_backward_components_matches_dense():
    """Random (PSD-cost) LQR data: component sweep == dense sweep."""
    rng = np.random.default_rng(1)
    T, B, nx, nu = 6, 4, 14, 7

    def psd(n, scale=1.0):
        M = rng.normal(size=(T, B, n, n)) * scale
        return np.einsum("tbij,tbkj->tbik", M, M) + 0.5 * np.eye(n)

    Fx = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(T, B, nx, nx)))
    Fu = jnp.asarray(0.1 * rng.normal(size=(T, B, nx, nu)))
    lx = jnp.asarray(rng.normal(size=(T, B, nx)))
    lu = jnp.asarray(rng.normal(size=(T, B, nu)))
    lxx = jnp.asarray(psd(nx, 0.3))
    luu = jnp.asarray(psd(nu, 0.3))
    lxu = jnp.asarray(0.05 * rng.normal(size=(T, B, nx, nu)))
    fs = jnp.asarray(0.01 * rng.normal(size=(T + 1, B, nx)))
    term_lx = jnp.asarray(rng.normal(size=(B, nx)))
    tl = rng.normal(size=(B, nx, nx))
    term_lxx = jnp.asarray(np.einsum("bij,bkj->bik", tl, tl) + np.eye(nx))
    reg = jnp.full((B,), 1e-9)

    ks, Ks, Qus, d1, d2, bad = backward_components(
        Fx, Fu, lx, lu, lxx, lxu, luu, fs, term_lx, term_lxx, reg)

    # dense reference sweep (the einsum formulation)
    def dense():
        eye_u = jnp.eye(nu, dtype=Fx.dtype)

        def body(carry, inp):
            Vx, Vxx, d1, d2 = carry
            lx_t, lu_t, lxx_t, lxu_t, luu_t, Fx_t, Fu_t, f_next = inp
            Vx_plus = Vx + jnp.einsum("bij,bj->bi", Vxx, f_next)
            Qx = lx_t + jnp.einsum("bji,bj->bi", Fx_t, Vx_plus)
            Qu = lu_t + jnp.einsum("bji,bj->bi", Fu_t, Vx_plus)
            VF = jnp.einsum("bij,bjk->bik", Vxx, Fx_t)
            Qxx = lxx_t + jnp.einsum("bji,bjk->bik", Fx_t, VF)
            Qux = jnp.swapaxes(lxu_t, -1, -2) + jnp.einsum(
                "bji,bjk->bik", Fu_t, VF)
            VFu = jnp.einsum("bij,bjk->bik", Vxx, Fu_t)
            Quu = luu_t + jnp.einsum("bji,bjk->bik", Fu_t, VFu) + (
                reg[:, None, None] * eye_u)
            kk = jnp.linalg.solve(Quu, Qu[..., None])[..., 0]
            KK = jnp.linalg.solve(Quu, Qux)
            Vx_new = Qx - jnp.einsum("bji,bj->bi", Qux, kk)
            Vxx_new = Qxx - jnp.einsum("bji,bjk->bik", Qux, KK)
            Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2))
            d1n = d1 + jnp.einsum("bi,bi->b", Qu, kk)
            d2n = d2 + jnp.einsum("bi,bij,bj->b", kk, Quu, kk)
            return (Vx_new, Vxx_new, d1n, d2n), (kk, KK, Qu)

        zero = jnp.zeros(B, Fx.dtype)
        (_, _, d1, d2), (ks, Ks, Qus) = jax.lax.scan(
            body, (term_lx, term_lxx, zero, zero),
            (lx, lu, lxx, lxu, luu, Fx, Fu, fs[1:]), reverse=True)
        return ks, Ks, Qus, d1, d2

    ks_d, Ks_d, Qus_d, d1_d, d2_d = dense()
    np.testing.assert_allclose(np.asarray(ks), np.asarray(ks_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(Ks_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Qus), np.asarray(Qus_d), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_d), atol=1e-8)
    assert not np.any(np.asarray(bad))


@pytest.mark.slow  # two full make_batch_fddp compiles: 22 min XLA:CPU (r03 VERDICT #8)
def test_batch_fddp_component_vs_dense_backward():
    """Full solver: component-backward and dense-backward paths agree."""
    model, params = load_panda(dtype=np.float64)
    from tests.test_solver_fddp import goal_reaching_problem

    T = 8
    spec, cf, refs = goal_reaching_problem(model, params, T=T, dt=0.02)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    B = 2
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))
    settings = SolverSettings(max_iters=10)
    sol_c = jax.jit(make_batch_fddp(
        model, params, spec, cf, settings, riccati="component"))(
        x0s, refs, xs0, us0)
    sol_d = jax.jit(make_batch_fddp(
        model, params, spec, cf, settings, riccati="dense"))(
        x0s, refs, xs0, us0)
    sol_p = jax.jit(make_batch_fddp(
        model, params, spec, cf, settings, riccati="pscan"))(
        x0s, refs, xs0, us0)
    np.testing.assert_allclose(
        np.asarray(sol_c.us), np.asarray(sol_d.us), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sol_c.K), np.asarray(sol_d.K), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(sol_p.us), np.asarray(sol_d.us), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(sol_p.K), np.asarray(sol_d.K), atol=1e-7)
