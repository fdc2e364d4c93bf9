"""Native C++ kernels: cross-LANGUAGE validation of the JAX dynamics (the
role pinocchio played for the reference) + ring-buffer semantics + a
multithreaded SPSC stress test."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.native import NativeRBD, RingBuffer
from agimus_controller_tpu.ops import dynamics


@pytest.fixture(scope="module")
def oracle():
    model, params = load_panda(dtype=np.float64)
    return model, params, NativeRBD(model, params)


RNG = np.random.default_rng(7)


def test_rnea_cross_language(oracle):
    model, params, nat = oracle
    for _ in range(10):
        q = PANDA_Q_READY + 0.4 * RNG.normal(size=7)
        v = RNG.normal(size=7)
        a = RNG.normal(size=7)
        tau_cpp = nat.rnea(q, v, a)
        tau_jax = dynamics.rnea(model, params, jnp.asarray(q), jnp.asarray(v),
                                jnp.asarray(a))
        np.testing.assert_allclose(tau_cpp, np.asarray(tau_jax), atol=1e-10)


def test_crba_cross_language(oracle):
    model, params, nat = oracle
    q = PANDA_Q_READY + 0.3 * RNG.normal(size=7)
    M_cpp = nat.crba(q)
    M_jax = dynamics.crba(model, params, jnp.asarray(q))
    np.testing.assert_allclose(M_cpp, np.asarray(M_jax), atol=1e-9)


def test_forward_dynamics_cross_language(oracle):
    model, params, nat = oracle
    q = PANDA_Q_READY + 0.3 * RNG.normal(size=7)
    v = RNG.normal(size=7)
    tau = 5.0 * RNG.normal(size=7)
    a_cpp = nat.forward_dynamics(q, v, tau)
    a_jax = dynamics.forward_dynamics(model, params, jnp.asarray(q),
                                      jnp.asarray(v), jnp.asarray(tau))
    np.testing.assert_allclose(a_cpp, np.asarray(a_jax), atol=1e-8)


def test_ring_buffer_fifo():
    rb = RingBuffer(8, 3)
    assert rb.pop() is None
    assert rb.latest() is None
    for i in range(5):
        assert rb.push(np.asarray([i, i + 0.5, i + 0.25]))
    assert len(rb) == 5
    np.testing.assert_allclose(rb.latest(), [4, 4.5, 4.25])
    np.testing.assert_allclose(rb.pop(), [0, 0.5, 0.25])
    assert len(rb) == 4


def test_ring_buffer_full_drops():
    rb = RingBuffer(4, 1)
    for i in range(4):
        assert rb.push(np.asarray([float(i)]))
    assert not rb.push(np.asarray([99.0]))  # full: dropped, producer not blocked
    np.testing.assert_allclose(rb.pop(), [0.0])
    assert rb.push(np.asarray([4.0]))


def test_ring_buffer_capacity_validation():
    with pytest.raises(ValueError):
        RingBuffer(3, 1)


def test_ring_buffer_spsc_stress():
    """Producer/consumer threads: every record arrives exactly once, in order."""
    rb = RingBuffer(64, 2)
    N = 20000
    got = []

    def producer():
        i = 0
        while i < N:
            if rb.push(np.asarray([float(i), float(2 * i)])):
                i += 1

    def consumer():
        while len(got) < N:
            r = rb.pop()
            if r is not None:
                got.append(r)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=30); tc.join(timeout=30)
    assert len(got) == N
    arr = np.stack(got)
    np.testing.assert_allclose(arr[:, 0], np.arange(N))
    np.testing.assert_allclose(arr[:, 1], 2 * np.arange(N))


def test_branched_tree_cross_language():
    """r03 VERDICT #9: the branched Tiago-Pro tree (prismatic torso + two
    7-DoF arms) cross-checked against the independent C++ kernels — the
    forward pass indexes parents, the backward pass accumulates to parents,
    so any topologically-ordered tree works."""
    from agimus_controller_tpu.models.tiago_pro import load_tiago_pro

    model, params = load_tiago_pro(moving_joint_names="all", dtype=np.float64)
    # confirm this IS a branched topology (two children share a parent)
    parents = list(model.parents)
    assert any(parents.count(p) > 1 for p in set(parents) if p >= 0), parents
    nat = NativeRBD(model, params)
    nj = model.nj
    for _ in range(6):
        q = 0.3 * RNG.normal(size=nj)
        v = RNG.normal(size=nj)
        a = RNG.normal(size=nj)
        np.testing.assert_allclose(
            nat.rnea(q, v, a),
            np.asarray(dynamics.rnea(model, params, jnp.asarray(q),
                                     jnp.asarray(v), jnp.asarray(a))),
            atol=1e-9)
    q = 0.3 * RNG.normal(size=nj)
    np.testing.assert_allclose(
        nat.crba(q), np.asarray(dynamics.crba(model, params, jnp.asarray(q))),
        atol=1e-9)
    tau = 5.0 * RNG.normal(size=nj)
    v = RNG.normal(size=nj)
    a_cpp = nat.forward_dynamics(q, v, tau)
    a_jax = dynamics.forward_dynamics(
        model, params, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau))
    np.testing.assert_allclose(a_cpp, np.asarray(a_jax), atol=1e-8)
