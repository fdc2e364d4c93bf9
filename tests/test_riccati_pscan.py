"""Parallel (associative-scan) Riccati must match the sequential sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.ocp.costs import StageDerivs, TerminalDerivs
from agimus_controller_tpu.solver.fddp import _backward
from agimus_controller_tpu.solver.riccati_pscan import parallel_riccati


def random_lqr_data(T=40, nx=6, nu=3, seed=0, with_gaps=True):
    rng = np.random.default_rng(seed)
    j = lambda *s: jnp.asarray(rng.normal(size=s))

    def spd(n, scale=1.0):
        A = rng.normal(size=(T, n, n))
        return jnp.asarray(
            scale * (A @ np.swapaxes(A, -1, -2)) + 2.0 * np.eye(n))

    lxx = spd(nx)
    luu = spd(nu)
    lxu = 0.1 * j(T, nx, nu)
    lx = j(T, nx)
    lu = j(T, nu)
    Fx = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(T, nx, nx)))
    Fu = 0.3 * j(T, nx, nu)
    fs = j(T + 1, nx) if with_gaps else jnp.zeros((T + 1, nx))
    term_lx = j(nx)
    A = rng.normal(size=(nx, nx))
    term_lxx = jnp.asarray(A @ A.T + 2.0 * np.eye(nx))
    d = StageDerivs(jnp.zeros(T), lx, lu, lxx, lxu, luu,
                    jnp.zeros((T, nx)), Fx, Fu)
    term = TerminalDerivs(jnp.zeros(()), term_lx, term_lxx)
    return d, term, fs


@pytest.mark.parametrize("with_gaps", [False, True])
def test_parallel_matches_sequential(with_gaps):
    d, term, fs = random_lqr_data(with_gaps=with_gaps)
    reg = 1e-9
    ks_s, Ks_s, Qus_s, d1, d2, div = _backward(d, term, fs, reg)
    ks_p, Ks_p, Qus_p, Vx, Vxx, d1_p, d2_p = parallel_riccati(
        d.lx, d.lu, d.lxx, d.lxu, d.luu, d.Fx, d.Fu, fs,
        term.lx, term.lxx, reg=reg)
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Qus_p), np.asarray(Qus_s), atol=1e-8)
    # terminal boundary
    np.testing.assert_allclose(np.asarray(Vxx[-1]), np.asarray(term.lxx), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Vx[-1]), np.asarray(term.lx), atol=1e-12)


def test_parallel_long_horizon():
    d, term, fs = random_lqr_data(T=512, seed=3)
    ks_s, Ks_s, *_ = _backward(d, term, fs, 1e-9)
    ks_p, Ks_p, *_ = parallel_riccati(
        d.lx, d.lu, d.lxx, d.lxu, d.luu, d.Fx, d.Fu, fs,
        term.lx, term.lxx, reg=1e-9)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s), atol=1e-6)
