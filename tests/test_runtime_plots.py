"""Runtime lifecycle + recorder + plot-dump tests (reference semantics of
`agimus_controller_ros/agimus_controller.py` buffer gating / delay comp, and
`plots/PLOT_DATA_FORMAT.md` dump schema)."""

import json

import numpy as np
import pytest

from agimus_controller_tpu.mpc.buffer import (
    DTFactorsNSeq,
    TrajectoryBuffer,
)
from agimus_controller_tpu.mpc.data import MPCDebugData, OCPDebugData, OCPResults
from agimus_controller_tpu.mpc.mpc import MPC
from agimus_controller_tpu.plots.dump_utils import dump_filename
from agimus_controller_tpu.plots.plots_utils import plot_mpc_data, plot_values
from agimus_controller_tpu.runtime.controller import (
    ControllerRuntime,
    RuntimeParams,
    Sensor,
)
from agimus_controller_tpu.runtime.recorder import MPCRecorder
from tests.test_mpc import UnicycleOCP, UnicycleWarmStart, unicycle_point


def make_runtime(T=10, constant_delay=False):
    buffer = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[T]))
    ocp = UnicycleOCP(T)
    ws = UnicycleWarmStart()
    mpc = MPC()
    mpc.setup(ocp, ws, buffer)
    rt = ControllerRuntime(
        mpc, buffer, UnicycleWarmStart(),
        RuntimeParams(constant_delay=constant_delay),
    )
    return rt, buffer, ocp


def test_initialization_gate():
    rt, buffer, ocp = make_runtime(T=10)
    rt.set_sensor(Sensor(time_ns=0, position=np.zeros(2), velocity=np.zeros(1)))
    # below 2x horizon time: must not start
    for i in range(12):
        rt.append_reference(unicycle_point(i, i))
    assert rt.step() is None
    assert not rt.initialized
    # fill to 2x: starts and produces a control
    for i in range(12, 21):
        rt.append_reference(unicycle_point(i, i))
    ctrl = rt.step(now_ns=0)
    assert rt.initialized
    assert ctrl is not None
    assert ctrl.feedback_gain.shape == (2, 3)
    assert ctrl.feedforward.shape == (2,)


def test_buffer_underrun_pads_last_point():
    rt, buffer, ocp = make_runtime(T=10)
    rt.set_sensor(Sensor(time_ns=0, position=np.zeros(2), velocity=np.zeros(1)))
    for i in range(21):
        rt.append_reference(unicycle_point(i, i))
    assert rt.step(now_ns=0) is not None
    # drain the buffer below 1x horizon: runtime must pad with the last
    # point until the horizon is extractable again (reference `run_callback`
    # `:498-503`, with the exactly-1x deadlock fixed)
    while len(buffer) > 9:
        buffer.clear_past()
    ctrl = rt.step(now_ns=1)
    assert ctrl is not None
    assert len(buffer) >= 10


def test_constant_delay_publishes_previous():
    rt, buffer, ocp = make_runtime(T=10, constant_delay=True)
    rt.set_sensor(Sensor(time_ns=0, position=np.zeros(2), velocity=np.zeros(1)))
    for i in range(25):
        rt.append_reference(unicycle_point(i, i))
    seen = []
    rt.control_callbacks.append(lambda c: seen.append(c))
    rt.step(now_ns=0)  # first tick: solves, publishes nothing yet
    assert len(seen) == 0
    rt.step(now_ns=10)  # second tick: publishes the FIRST tick's result
    assert len(seen) == 1


def test_recorder_roundtrip(tmp_path):
    rec = MPCRecorder()
    res = OCPResults(states=np.zeros((11, 3)), ricatti_gains=np.zeros((10, 2, 3)),
                     feed_forward_terms=np.zeros((10, 2)))
    dbg = MPCDebugData(ocp=OCPDebugData(kkt_norm=1e-4, nb_iter=3),
                       duration_ocp_solve_ns=123456)
    for i in range(5):
        rec.record(i * 10**7, np.zeros(3), res, dbg)
    path = tmp_path / "run.npz"
    rec.save(path)
    data = MPCRecorder.load(path)
    assert data["state_predictions"].shape == (5, 11, 3)
    assert data["kkt"].shape == (5,)
    np.testing.assert_allclose(data["solve_time_ns"], 123456)


def test_plot_dump_schema(tmp_path):
    """Dump must match the reference PLOT_DATA_FORMAT.md schema."""
    t = np.linspace(0, 1, 50)
    vals = np.stack([np.sin(t), np.cos(t)], axis=1)
    plot_values("my plot", vals, t, labels=["a", "b"], dump_path=str(tmp_path))
    f = dump_filename(tmp_path, "my plot")
    assert f.name == "my_plot_plotdata.json"
    data = json.loads(f.read_text())
    for key in ("title", "time", "values", "labels", "ylabels", "semilogs",
                "ylimits", "colors"):
        assert key in data
    assert data["title"] == "my plot"
    assert len(data["time"]) == 50
    assert len(data["values"]) == 2  # one list per series
    assert data["labels"] == ["a", "b"]


def test_plot_mpc_data_dispatch(tmp_path):
    rec = MPCRecorder()
    res = OCPResults(states=np.zeros((11, 3)), ricatti_gains=np.zeros((10, 2, 3)),
                     feed_forward_terms=np.zeros((10, 2)))
    dbg = MPCDebugData(ocp=OCPDebugData(kkt_norm=1e-4, nb_iter=3),
                       duration_ocp_solve_ns=2_000_000)
    for i in range(5):
        rec.record(i * 10**7, np.zeros(3), res, dbg)
    plot_mpc_data(rec.as_mpc_data(), which_plots=["computation_time", "iter"],
                  dump_path=str(tmp_path))
    assert dump_filename(tmp_path, "computation time").exists()
    assert dump_filename(tmp_path, "iter").exists()
