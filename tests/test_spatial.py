"""Unit tests for spatial algebra (SO3/SE3/motion/force ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.ops import spatial


RNG = np.random.default_rng(0)


def random_rotvec(n, max_angle=3.0):
    w = RNG.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    return w * RNG.uniform(0.01, max_angle, size=(n, 1))


def test_exp3_log3_roundtrip():
    w = jnp.asarray(random_rotvec(64))
    R = spatial.exp3(w)
    # orthonormality
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)
    w2 = spatial.log3(R)
    np.testing.assert_allclose(w2, w, atol=1e-9)


def test_exp3_small_angle():
    w = jnp.asarray([[1e-9, -2e-9, 1e-10], [0.0, 0.0, 0.0]])
    R = spatial.exp3(w)
    np.testing.assert_allclose(spatial.log3(R), w, atol=1e-14)
    # differentiable at zero
    g = jax.jacobian(lambda x: spatial.exp3(x))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_exp6_log6_roundtrip():
    nu = jnp.asarray(np.concatenate([random_rotvec(64), RNG.normal(size=(64, 3))], -1))
    R, p = spatial.exp6(nu)
    nu2 = spatial.log6(R, p)
    np.testing.assert_allclose(nu2, nu, atol=1e-9)


def test_quaternion_roundtrip():
    w = jnp.asarray(random_rotvec(64, max_angle=3.1))
    R = spatial.exp3(w)
    q = spatial.matrix_to_quat(R)
    R2 = spatial.quat_to_matrix(q)
    np.testing.assert_allclose(R2, R, atol=1e-12)


def test_motion_act_inverse():
    m = (spatial.exp3(jnp.asarray(random_rotvec(1)[0])), jnp.asarray(RNG.normal(size=3)))
    nu = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(
        spatial.motion_act_inv(m, spatial.motion_act(m, nu)), nu, atol=1e-12
    )
    np.testing.assert_allclose(
        spatial.force_act_inv(m, spatial.force_act(m, nu)), nu, atol=1e-12
    )


def test_force_motion_pairing_invariant():
    """<f, nu> is frame invariant under the dual transforms."""
    m = (spatial.exp3(jnp.asarray(random_rotvec(1)[0])), jnp.asarray(RNG.normal(size=3)))
    nu = jnp.asarray(RNG.normal(size=6))
    f = jnp.asarray(RNG.normal(size=6))
    lhs = jnp.dot(f, nu)
    rhs = jnp.dot(spatial.force_act(m, f), spatial.motion_act(m, nu))
    np.testing.assert_allclose(rhs, lhs, atol=1e-12)


def test_se3_compose_inverse():
    a = (spatial.exp3(jnp.asarray(random_rotvec(1)[0])), jnp.asarray(RNG.normal(size=3)))
    b = (spatial.exp3(jnp.asarray(random_rotvec(1)[0])), jnp.asarray(RNG.normal(size=3)))
    ab = spatial.se3_mul(a, b)
    ident = spatial.se3_mul(spatial.se3_inv(ab), ab)
    np.testing.assert_allclose(ident[0], jnp.eye(3), atol=1e-12)
    np.testing.assert_allclose(ident[1], jnp.zeros(3), atol=1e-12)


def test_rpy_matches_exp3_single_axis():
    r = 0.7
    np.testing.assert_allclose(
        spatial.rpy_to_matrix(jnp.asarray([r, 0.0, 0.0])),
        spatial.exp3(jnp.asarray([r, 0.0, 0.0])),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        spatial.rpy_to_matrix(jnp.asarray([0.0, 0.0, r])),
        spatial.exp3(jnp.asarray([0.0, 0.0, r])),
        atol=1e-12,
    )


def test_motion_cross_jacobi():
    """motion cross is a Lie bracket: antisymmetric."""
    m1 = jnp.asarray(RNG.normal(size=6))
    m2 = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(
        spatial.motion_cross(m1, m2), -spatial.motion_cross(m2, m1), atol=1e-12
    )
