"""MPC debugger + prediction-tails plotting tests (#25/#26/#31 analogs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.mpc.ocp_base import OCPJax
from agimus_controller_tpu.ocp.spec import CostItem, ProblemSpec
from agimus_controller_tpu.plots.dump_utils import dump_filename
from agimus_controller_tpu.plots.mpc_utils import plot_tails
from agimus_controller_tpu.runtime.debugger import MPCDebugger


@pytest.fixture(scope="module")
def setup():
    model, params = load_panda(dtype=np.float64)
    T = 5
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="ctrl_reg", kind="control", weight=1e-2, update=True),
            CostItem(name="goal", kind="frame_placement", weight=10.0,
                     update=True, frame="panda_hand_tcp", publish_residual=True),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=50.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T, dt=0.01,
    )
    ocp = OCPJax(model, params, spec, dtype=jnp.float64)
    return model, params, ocp, T


def test_debugger_cost_breakdown(setup):
    model, params, ocp, T = setup
    dbg = MPCDebugger(ocp)
    x0 = np.concatenate([PANDA_Q_READY, np.zeros(7)])
    xs = np.tile(x0, (T + 1, 1))
    us = np.zeros((T, 7))
    out = dbg.evaluate(xs, us)
    assert set(out["running_costs"]) == {"state_reg", "ctrl_reg", "goal"}
    assert out["running_costs"]["goal"].shape == (T,)
    assert set(out["terminal_costs"]) == {"goal"}
    # the goal cost must dominate at the default (identity) reference pose
    assert np.all(out["running_costs"]["goal"] > out["running_costs"]["ctrl_reg"])
    assert out["residuals"]["goal"].shape == (T, 6)
    assert out["grad_heatmap"].shape == (T, 14)
    assert np.all(np.isfinite(out["grad_heatmap"]))


def test_debugger_ee_path(setup):
    model, params, ocp, T = setup
    dbg = MPCDebugger(ocp)
    xs = np.tile(np.concatenate([PANDA_Q_READY, np.zeros(7)]), (T + 1, 1))
    path = dbg.ee_path(xs, "panda_hand_tcp")
    assert path.shape == (T + 1, 3)
    # all rows identical for a constant state path
    np.testing.assert_allclose(path, np.tile(path[0], (len(path), 1)), atol=1e-12)


def test_plot_tails(tmp_path, setup):
    model, params, _, _ = setup
    N, T1 = 12, 6
    rng = np.random.default_rng(0)
    xs = np.tile(np.concatenate([PANDA_Q_READY, np.zeros(7)]), (N, T1, 1))
    xs += 0.01 * rng.normal(size=xs.shape)
    us = rng.normal(size=(N, T1 - 1, 7))
    figs = plot_tails(xs, us, dt=0.01, model=model, params=params,
                      ee_frame="panda_hand_tcp", dump_path=str(tmp_path))
    assert set(figs) == {"state q", "state v", "control u", "ee position",
                         "ee orientation rpy", "ee angular velocity"}
    assert len(figs["state q"]["tails"]) == 2  # N=12, tail_every=10 -> 0, 10
    assert dump_filename(tmp_path, "state q").exists()
    assert dump_filename(tmp_path, "ee position").exists()
    ee = np.asarray(figs["ee position"]["measured"])
    assert ee.shape == (N, 3)
