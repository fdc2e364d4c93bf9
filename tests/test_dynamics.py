"""Dynamics kernel validation: RNEA/CRBA/forward-dynamics cross-consistency,
analytic-vs-autodiff identities, and energy conservation.

Without pinocchio in this environment, correctness rests on independent
mathematical identities that would each fail under an implementation bug:
- CRBA mass matrix vs RNEA unit-acceleration columns (two different algorithms)
- generalized gravity vs autodiff of the potential energy (kinematics route)
- forward dynamics as the exact inverse of RNEA (+ armature)
- energy conservation in free fall (整 dynamics + integrator loop)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ops import dynamics, kinematics


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


RNG = np.random.default_rng(42)


def rand_q():
    return jnp.asarray(PANDA_Q_READY + 0.3 * RNG.normal(size=7))


def test_crba_matches_rnea_columns(panda):
    model, params = panda
    q = rand_q()
    M = dynamics.crba(model, params, q)
    z = jnp.zeros(7)
    g = dynamics.rnea(model, params, q, z, z)
    cols = [dynamics.rnea(model, params, q, z, jnp.eye(7)[i]) - g for i in range(7)]
    np.testing.assert_allclose(M, jnp.stack(cols, axis=1), atol=1e-10)


def test_mass_matrix_spd(panda):
    model, params = panda
    for _ in range(5):
        M = dynamics.mass_matrix(model, params, rand_q())
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)


def test_gravity_is_potential_gradient(panda):
    model, params = panda
    q = rand_q()
    g_rnea = dynamics.generalized_gravity(model, params, q)
    g_auto = jax.grad(lambda qq: dynamics.potential_energy(model, params, qq))(q)
    np.testing.assert_allclose(g_rnea, g_auto, atol=1e-9)


def test_kinetic_energy_quadratic_form(panda):
    model, params = panda
    q, v = rand_q(), jnp.asarray(RNG.normal(size=7))
    ke = dynamics.kinetic_energy(model, params, q, v)
    M = dynamics.crba(model, params, q)
    np.testing.assert_allclose(ke, 0.5 * v @ M @ v, atol=1e-10)
    assert ke > 0


def test_forward_dynamics_inverts_rnea(panda):
    model, params = panda
    q, v = rand_q(), jnp.asarray(RNG.normal(size=7))
    tau = jnp.asarray(RNG.normal(size=7)) * 5.0
    a = dynamics.forward_dynamics(model, params, q, v, tau)
    # rnea gives M_c a + b; armature contributes A*a on top
    tau_back = dynamics.rnea(model, params, q, v, a) + params.armature * a
    np.testing.assert_allclose(tau_back, tau, atol=1e-8)


def test_coriolis_power_balance(panda):
    """Passivity: v^T (M_dot - 2C) v = 0  <=>  d(KE)/dt = v^T (tau - g)."""
    model, params = panda
    q, v = rand_q(), jnp.asarray(RNG.normal(size=7))
    # b(q,v) = C(q,v)v + g(q); power of Coriolis forces must satisfy
    # v^T C v = 0.5 v^T M_dot v
    b = dynamics.nonlinear_effects(model, params, q, v)
    g = dynamics.generalized_gravity(model, params, q)
    coriolis_power = v @ (b - g)
    Mdot = jax.jvp(lambda qq: dynamics.crba(model, params, qq), (q,), (v,))[1]
    np.testing.assert_allclose(coriolis_power, 0.5 * v @ Mdot @ v, atol=1e-9)


def test_energy_conservation_free_fall(panda):
    """RK4 zero-torque rollout conserves total mechanical energy (no armature:
    armature is a motor-side effect, excluded from the conserved energy)."""
    model, params = panda
    params0 = params._replace(armature=jnp.zeros(7))

    def f(x):
        q, v = x[:7], x[7:]
        a = dynamics.forward_dynamics(model, params0, q, v, jnp.zeros(7))
        return jnp.concatenate([v, a])

    def rk4(x, dt):
        k1 = f(x)
        k2 = f(x + 0.5 * dt * k1)
        k3 = f(x + 0.5 * dt * k2)
        k4 = f(x + dt * k3)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    x = jnp.concatenate([jnp.asarray(PANDA_Q_READY), jnp.zeros(7)])
    e0 = dynamics.kinetic_energy(model, params0, x[:7], x[7:]) + (
        dynamics.potential_energy(model, params0, x[:7])
    )
    step = jax.jit(lambda xx: rk4(xx, 1e-3))
    for _ in range(200):
        x = step(x)
    e1 = dynamics.kinetic_energy(model, params0, x[:7], x[7:]) + (
        dynamics.potential_energy(model, params0, x[:7])
    )
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)


def test_frame_jacobian_matches_autodiff(panda):
    model, params = panda
    q = rand_q()
    fid = model.frame_id("panda_hand_tcp")
    J = kinematics.frame_jacobian(model, params, q, fid, "local_world_aligned")
    # linear rows == d p(q) / dq
    Jp = jax.jacobian(lambda qq: kinematics.frame_placement(model, params, qq, fid)[1])(q)
    np.testing.assert_allclose(J[3:], Jp, atol=1e-10)
    # angular rows: dR/dq_i R^T == hat(Jw_i)
    JR = jax.jacobian(lambda qq: kinematics.frame_placement(model, params, qq, fid)[0])(q)
    R = kinematics.frame_placement(model, params, q, fid)[0]
    for i in range(7):
        W = JR[:, :, i] @ R.T
        w = jnp.asarray([W[2, 1], W[0, 2], W[1, 0]])
        np.testing.assert_allclose(J[:3, i], w, atol=1e-10)


def test_frame_velocity_consistency(panda):
    model, params = panda
    q, v = rand_q(), jnp.asarray(RNG.normal(size=7))
    fid = model.frame_id("panda_hand_tcp")
    nu = kinematics.frame_velocity(model, params, q, v, fid, "local_world_aligned")
    # finite-difference the placement along the flow
    dt = 1e-7
    _, p0 = kinematics.frame_placement(model, params, q, fid)
    _, p1 = kinematics.frame_placement(model, params, q + dt * v, fid)
    np.testing.assert_allclose(nu[3:], (p1 - p0) / dt, atol=1e-5)


def test_batched_vmap_consistency(panda):
    model, params = panda
    qs = jnp.asarray(PANDA_Q_READY + 0.2 * RNG.normal(size=(16, 7)))
    vs = jnp.asarray(RNG.normal(size=(16, 7)))
    taus = jnp.asarray(RNG.normal(size=(16, 7)))
    fd = jax.vmap(lambda q, v, t: dynamics.forward_dynamics(model, params, q, v, t))
    batched = fd(qs, vs, taus)
    for i in range(4):
        single = dynamics.forward_dynamics(model, params, qs[i], vs[i], taus[i])
        np.testing.assert_allclose(batched[i], single, atol=1e-12)


def test_external_forces(panda):
    """fext at a joint shows up as -S^T fext in that joint's torque."""
    model, params = panda
    q = rand_q()
    z = jnp.zeros(7)
    fext = jnp.zeros((7, 6)).at[6, :].set(jnp.asarray([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
    tau0 = dynamics.rnea(model, params, q, z, z)
    tau1 = dynamics.rnea(model, params, q, z, z, fext=fext)
    # the wrench propagates to all ancestors -> all torques change
    assert np.all(np.abs(np.asarray(tau1 - tau0)) > 0)
    # validate via virtual work: tau1 - tau0 = -J_local^T fext  at joint 7 frame
    jid = 6
    fr_candidates = [f for f in model.frames if f.parent_joint == jid]
    # use a temp frame at the joint itself: joint frame == link7 frame
    fid = model.frame_id("panda_link7")
    J = kinematics.frame_jacobian(model, params, q, fid, "local")
    np.testing.assert_allclose(tau1 - tau0, -J.T @ fext[6], atol=1e-9)
