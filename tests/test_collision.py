"""Collision distance kernel tests (colmpc ResidualDistanceCollision
equivalent): analytic cases + gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import load_panda
from agimus_controller_tpu.ops import collision
from agimus_controller_tpu.ops.spatial import exp3


def cap(pos, axis_angle=(0, 0, 0), r=0.1, hl=0.5):
    R = exp3(jnp.asarray(axis_angle, jnp.float64))
    return R, jnp.asarray(pos, jnp.float64), r, hl


def dist(c1, c2):
    return float(collision.capsule_capsule_distance(
        c1[0], c1[1], c1[2], c1[3], c2[0], c2[1], c2[2], c2[3]))


def test_parallel_capsules():
    c1 = cap([0, 0, 0])
    c2 = cap([1.0, 0, 0])
    assert dist(c1, c2) == pytest.approx(1.0 - 0.2, abs=1e-9)


def test_perpendicular_capsules():
    c1 = cap([0, 0, 0])  # along z
    c2 = cap([0.5, 0, 2.0], axis_angle=(0, np.pi / 2, 0))  # along x, above
    # closest: top of c1 at z=0.5 vs line z=2.0 -> 1.5 minus radii
    assert dist(c1, c2) == pytest.approx(1.5 - 0.2, abs=1e-9)


def test_sphere_sphere():
    s1 = cap([0, 0, 0], r=0.2, hl=0.0)
    s2 = cap([0, 1.0, 0], r=0.3, hl=0.0)
    assert dist(s1, s2) == pytest.approx(1.0 - 0.5, abs=1e-9)


def test_penetration_negative():
    c1 = cap([0, 0, 0])
    c2 = cap([0.15, 0, 0])
    assert dist(c1, c2) == pytest.approx(0.15 - 0.2, abs=1e-9)
    assert dist(c1, c2) < 0


def test_endpoint_clamping():
    c1 = cap([0, 0, 0], hl=0.5)
    c2 = cap([0, 0, 3.0], hl=0.5)  # colinear, separated along the axis
    assert dist(c1, c2) == pytest.approx(3.0 - 1.0 - 0.2, abs=1e-9)


def test_distance_gradient_finite():
    """Gradient must be finite and match finite differences away from the
    nonsmooth set (SURVEY.md hard-part #5)."""
    def d_of(p):
        c1 = cap([0, 0, 0])
        R2 = exp3(jnp.asarray([0.3, 0.2, 0.1], jnp.float64))
        return collision.capsule_capsule_distance(
            c1[0], c1[1], c1[2], c1[3], R2, p, 0.1, 0.5)

    p = jnp.asarray([0.8, 0.3, 0.4], jnp.float64)
    g = jax.grad(d_of)(p)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-7
    for i in range(3):
        fd = (d_of(p.at[i].add(eps)) - d_of(p.at[i].add(-eps))) / (2 * eps)
        assert float(g[i]) == pytest.approx(float(fd), abs=1e-5)


def test_panda_self_distances():
    """Pairs on the real Panda: all registered SRDF pairs are collision-free
    at the ready pose, and vmapped batch evaluation matches single."""
    from agimus_controller_tpu.models.panda import PANDA_Q_READY

    model, params = load_panda(self_collision=True, dtype=np.float64)
    assert len(model.collision_pairs) > 0
    q = jnp.asarray(PANDA_Q_READY)
    ds = collision.all_pair_distances(model, params, q)
    assert ds.shape == (len(model.collision_pairs),)
    assert np.all(np.asarray(ds) > 0), "ready pose should be collision-free"
    # batch consistency
    qs = jnp.tile(q[None], (4, 1))
    batched = jax.vmap(lambda qq: collision.all_pair_distances(model, params, qq))(qs)
    np.testing.assert_allclose(batched[2], ds, atol=1e-12)


def test_environment_obstacle_distance():
    from agimus_controller_tpu.models.panda import PANDA_Q_READY
    from tests.test_robot_models import ENV_URDF

    model, params = load_panda(
        env_urdf=ENV_URDF,
        collision_pairs=[("panda_link7_capsule", "obstacle_sphere")],
        dtype=np.float64,
    )
    q = jnp.asarray(PANDA_Q_READY)
    d = collision.pair_distance(model, params, q, 0)
    assert np.isfinite(float(d))
    # moving the obstacle far away must increase the distance
    far = params._replace(
        geom_trans=jnp.asarray(params.geom_trans).at[model.geometry_id("obstacle_sphere")].set(
            jnp.asarray([5.0, 5.0, 5.0])))
    d_far = collision.pair_distance(model, far, q, 0)
    assert float(d_far) > float(d) + 1.0
