"""Component-form batched dynamics: must agree with the general path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ops import integrator
from agimus_controller_tpu.ops.batched_dynamics import (
    make_batched_step,
    make_batched_step_with_derivs,
)


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def rand_batch(B=8, seed=0):
    rng = np.random.default_rng(seed)
    x = np.concatenate(
        [PANDA_Q_READY + 0.3 * rng.normal(size=(B, 7)),
         0.5 * rng.normal(size=(B, 7))], axis=1)
    u = 5.0 * rng.normal(size=(B, 7))
    return jnp.asarray(x), jnp.asarray(u)


def test_batched_step_matches_general(panda):
    model, params = panda
    dt = 0.01
    x, u = rand_batch()
    step_c = jax.jit(make_batched_step(model, params, dt))
    ref = jax.vmap(lambda xx, uu: integrator.euler_step(model, params, xx, uu, dt))
    np.testing.assert_allclose(
        np.asarray(step_c(x, u)), np.asarray(ref(x, u)), atol=1e-10)


def test_batched_derivs_match_jacfwd(panda):
    model, params = panda
    dt = 0.01
    x, u = rand_batch(B=4, seed=2)
    f = jax.jit(make_batched_step_with_derivs(model, params, dt))
    xn, Fx, Fu = f(x, u)
    ref = jax.vmap(
        lambda xx, uu: integrator.euler_step_with_derivatives(model, params, xx, uu, dt)
    )
    xn_r, Fx_r, Fu_r = ref(x, u)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Fx), np.asarray(Fx_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Fu), np.asarray(Fu_r), atol=1e-8)
