"""Closed-form RNEA derivatives vs autodiff ground truth.

The analytic path (`ops/analytic_derivs.py`) replaces the reverse-mode
pulls in `make_batched_step_with_derivs` — the batched equivalent of the
reference's Pinocchio `computeRNEADerivatives` hot loop (SURVEY.md N3,
`/root/reference/agimus_controller/agimus_controller/ocp_base_croco.py:184-189`).
Validated against `jax.jacobian` of the unrolled component RNEA, which is
itself FD-checked elsewhere (`tests/test_batched_dynamics.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import load_panda
from agimus_controller_tpu.ops.analytic_derivs import rnea_qv_derivatives
from agimus_controller_tpu.ops.batched_dynamics import (
    _StaticModel,
    _rnea_c,
    make_batched_step_with_derivs,
)


def _dense(D, nj, b):
    return np.array(
        [[np.asarray(D[i][j])[b] if not isinstance(D[i][j], float) else 0.0
          for j in range(nj)] for i in range(nj)])


def _check_model(model, params, seed=0, atol=1e-8):
    sm = _StaticModel(model, params)
    nj = sm.nj
    rng = np.random.default_rng(seed)
    B = 2
    q = jnp.asarray(rng.normal(size=(B, nj)))
    v = jnp.asarray(rng.normal(size=(B, nj)))
    a = jnp.asarray(rng.normal(size=(B, nj)))

    Dq, Dv = rnea_qv_derivatives(
        sm, [q[:, i] for i in range(nj)], [v[:, i] for i in range(nj)],
        [a[:, i] for i in range(nj)])

    for b in range(B):
        ab = a[b]

        def rnea(qv):
            ql = [qv[i] for i in range(nj)]
            vl = [qv[nj + i] for i in range(nj)]
            return jnp.stack(_rnea_c(sm, ql, vl, [ab[i] for i in range(nj)]))

        J_ref = np.asarray(
            jax.jacobian(rnea)(jnp.concatenate([q[b], v[b]])))
        J_ana = np.concatenate([_dense(Dq, nj, b), _dense(Dv, nj, b)], axis=1)
        scale = max(1.0, np.abs(J_ref).max())
        np.testing.assert_allclose(J_ana, J_ref, atol=atol * scale, rtol=0)


def test_panda_matches_autodiff():
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        model, params = load_panda()
        _check_model(model, params, seed=1)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_panda_zero_velocity_gravity_only():
    # pure gravity/configuration case: dtau/dv must vanish, dtau/dq is the
    # gravity-torque Jacobian
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        model, params = load_panda()
        sm = _StaticModel(model, params)
        nj = sm.nj
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(1, nj)))
        z = jnp.zeros((1, nj))
        Dq, Dv = rnea_qv_derivatives(
            sm, [q[:, i] for i in range(nj)],
            [z[:, i] for i in range(nj)], [z[:, i] for i in range(nj)])
        assert np.abs(_dense(Dv, nj, 0)).max() < 1e-10

        def grav(qv):
            zl = [jnp.zeros(()) for _ in range(nj)]
            return jnp.stack(
                _rnea_c(sm, [qv[i] for i in range(nj)], zl, zl))

        J_ref = np.asarray(jax.jacobian(grav)(q[0]))
        np.testing.assert_allclose(_dense(Dq, nj, 0), J_ref, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_step_with_derivs_analytic_matches_vjp():
    model, params = load_panda()
    f_ana = jax.jit(make_batched_step_with_derivs(
        model, params, dt=0.01, deriv_mode="analytic"))
    f_vjp = jax.jit(make_batched_step_with_derivs(
        model, params, dt=0.01, deriv_mode="vjp"))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(4, 7)) * 5.0, jnp.float32)
    xn_a, Fx_a, Fu_a = f_ana(x, u)
    xn_v, Fx_v, Fu_v = f_vjp(x, u)
    np.testing.assert_allclose(np.asarray(xn_a), np.asarray(xn_v),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(Fx_a), np.asarray(Fx_v),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Fu_a), np.asarray(Fu_v),
                               atol=1e-6, rtol=1e-4)


@pytest.mark.slow
def test_branched_prismatic_tree_matches_autodiff():
    # Tiago-Pro-class branched model: prismatic torso + two arms exercises
    # the tree/ancestor masking and prismatic joint subspaces
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        from agimus_controller_tpu.models.tiago_pro import load_tiago_pro

        model, params = load_tiago_pro()
        _check_model(model, params, seed=3, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
