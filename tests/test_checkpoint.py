"""Checkpoint/resume: warm-start + buffer snapshot round-trip, and a resumed
controller that skips the unlimited-budget first solve."""

import numpy as np
import pytest

from agimus_controller_tpu.mpc.buffer import DTFactorsNSeq, TrajectoryBuffer
from agimus_controller_tpu.mpc.mpc import MPC
from agimus_controller_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from tests.test_mpc import UnicycleOCP, UnicycleWarmStart, unicycle_point
from agimus_controller_tpu.mpc.data import OCPResults


def make_mpc(T=10):
    buffer = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[T]))
    mpc = MPC()
    mpc.setup(UnicycleOCP(T), UnicycleWarmStart(), buffer)
    return mpc, buffer


def test_checkpoint_roundtrip(tmp_path):
    T = 10
    mpc, buffer = make_mpc(T)
    for i in range(T + 3):
        mpc.append_trajectory_point(unicycle_point(i, i * 10**7))
    sol = OCPResults(
        states=np.arange((T + 1) * 3, dtype=float).reshape(T + 1, 3),
        ricatti_gains=np.zeros((T, 2, 3)),
        feed_forward_terms=np.ones((T, 2)))
    mpc._warm_start.update_previous_solution(sol)

    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, mpc)

    mpc2, buffer2 = make_mpc(T)
    resumed = load_checkpoint(path, mpc2)
    assert resumed
    assert len(buffer2) == T + 3
    assert buffer2[0].point.id == 0
    np.testing.assert_allclose(
        buffer2[4].point.robot_configuration,
        buffer[4].point.robot_configuration)
    np.testing.assert_allclose(
        mpc2._warm_start._previous_solution.states, sol.states)
    np.testing.assert_allclose(
        mpc2._warm_start._previous_solution.feed_forward_terms,
        sol.feed_forward_terms)


def test_checkpoint_without_solution(tmp_path):
    mpc, _ = make_mpc(5)
    for i in range(7):
        mpc.append_trajectory_point(unicycle_point(i, i))
    path = tmp_path / "c.npz"
    save_checkpoint(path, mpc)
    mpc2, buf2 = make_mpc(5)
    assert not load_checkpoint(path, mpc2)  # no warm start stored
    assert len(buf2) == 7
