"""Observability parity tail: bag containers, live debug rendering, meshcat
scene export (VERDICT r2 #7; reference `read_from_bag_trajectory.py:29-196`,
`mpc_debugger_node.py:269-379,450-611`, `wrapper_meshcat.py:49-162`)."""

import numpy as np
import pytest

from agimus_controller_tpu.runtime.bag_readers import (
    load_bag,
    load_mpc_inputs_from_bag,
    read_mcap_bag,
    read_sqlite_bag,
    write_mcap_bag,
    write_sqlite_bag,
)
from agimus_controller_tpu.runtime.recorder import MPCRecorder


def _topics(rng):
    return {
        "/ocp_x0": [(1000 + i, rng.normal(size=14)) for i in range(5)],
        "/mpc_debug/state_predictions": [
            (1000 + i, rng.normal(size=(21, 14))) for i in range(5)],
    }


@pytest.mark.parametrize("fmt", ["mcap", "sqlite3"])
def test_bag_roundtrip(tmp_path, fmt):
    rng = np.random.default_rng(0)
    topics = _topics(rng)
    path = tmp_path / f"run.{fmt}"
    if fmt == "mcap":
        write_mcap_bag(path, topics)
        back = read_mcap_bag(path)
    else:
        write_sqlite_bag(path, topics)
        back = read_sqlite_bag(path)
    for name, recs in topics.items():
        assert len(back[name]) == len(recs)
        for (t0, a0), (t1, a1) in zip(recs, back[name]):
            assert t0 == t1
            np.testing.assert_array_equal(a0, a1)
    # autodetect by magic (reference `read_from_bag_trajectory.py:29-54`)
    auto = load_bag(path)
    assert set(auto.keys()) == set(topics.keys())
    ts, x0 = load_mpc_inputs_from_bag(path)
    assert x0.shape == (5, 14) and ts[0] == 1000


def test_mcap_chunked_container(tmp_path):
    """Real mcap writers store messages inside Chunk records by default
    (ADVICE r03): a chunked file must parse, not come back empty."""
    import struct

    from agimus_controller_tpu.runtime import bag_readers as br

    rng = np.random.default_rng(3)
    topics = _topics(rng)
    plain = tmp_path / "plain.mcap"
    write_mcap_bag(plain, topics)
    # re-wrap every channel/message record of the plain file into one
    # uncompressed Chunk record
    data = plain.read_bytes()
    off, end = 8, len(data) - 8
    inner, outer = b"", b""
    while off < end:
        op, length = struct.unpack_from("<BQ", data, off)
        rec = data[off:off + 9 + length]
        off += 9 + length
        if op in (br._OP_CHANNEL, br._OP_MESSAGE):
            inner += rec
        elif op == br._OP_DATA_END:
            chunk_body = (struct.pack("<QQQI", 0, 0, len(inner), 0)
                          + struct.pack("<I", 0)  # compression ""
                          + struct.pack("<Q", len(inner)) + inner)
            outer += br._rec(br._OP_CHUNK, chunk_body) + rec
        else:
            outer += rec
    chunked = tmp_path / "chunked.mcap"
    chunked.write_bytes(br._MCAP_MAGIC + outer + br._MCAP_MAGIC)
    back = read_mcap_bag(chunked)
    for name, recs in topics.items():
        assert len(back[name]) == len(recs)
        for (t0, a0), (t1, a1) in zip(recs, back[name]):
            assert t0 == t1
            np.testing.assert_array_equal(a0, a1)


@pytest.mark.parametrize("fmt", ["mcap", "sqlite3"])
def test_recorder_bag_matches_npz(tmp_path, fmt):
    from agimus_controller_tpu.mpc.data import MPCDebugData, OCPDebugData, OCPResults

    rng = np.random.default_rng(1)
    rec = MPCRecorder()
    for k in range(4):
        res = OCPResults(
            states=rng.normal(size=(11, 14)),
            ricatti_gains=rng.normal(size=(10, 7, 14)),
            feed_forward_terms=rng.normal(size=(10, 7)))
        dbg = MPCDebugData(ocp=OCPDebugData(
            result=[], references={}, residuals={},
            kkt_norm=0.1 * k, nb_iter=k, nb_qp_iter=2 * k,
            problem_solved=True))
        dbg.duration_ocp_solve_ns = 1_000_000 + k
        rec.record(10_000 + k * 10, rng.normal(size=14), res, dbg)
    bag_path = tmp_path / f"run_bag.{fmt}"
    rec.save_bag(bag_path, fmt=fmt)
    npz = rec.as_mpc_data()
    back = MPCRecorder.load_bag(bag_path)
    np.testing.assert_allclose(back["time"], npz["time"])
    np.testing.assert_array_equal(back["x0"], npz["x0"])
    np.testing.assert_array_equal(
        back["state_predictions"], npz["state_predictions"])
    np.testing.assert_allclose(back["kkt"], npz["kkt"])
    np.testing.assert_array_equal(back["iters"], npz["iters"])
    np.testing.assert_array_equal(back["solve_time_ns"], npz["solve_time_ns"])


def test_live_debug_view_renders_frames(tmp_path):
    from agimus_controller_tpu.factory.registry import create_ocp
    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.mpc.ocp_base import OCPParams
    from agimus_controller_tpu.runtime.debugger import LiveDebugView, MPCDebugger

    model, params = load_panda()
    ocp = create_ocp("goal_reaching", model, params,
                     OCPParams(dt=0.02, horizon_size=8),
                     ee_frame="panda_hand_tcp")
    dbg = MPCDebugger(ocp)
    view = LiveDebugView(dbg, ee_frame="panda_hand_tcp")
    rng = np.random.default_rng(2)
    K, T = 3, 8
    q0 = np.asarray(PANDA_Q_READY)
    xs = np.tile(np.concatenate([q0, np.zeros(7)]), (K, T + 1, 1))
    xs += rng.normal(size=xs.shape) * 0.01
    us = rng.normal(size=(K, T, 7)) * 0.5
    paths = view.render_run(xs, us, tmp_path / "frames")
    view.close()
    assert len(paths) == K
    for p in paths:
        assert p.exists() and p.stat().st_size > 1000


def test_meshcat_scene_export(tmp_path):
    import json

    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.runtime.meshcat_viz import export_scene_json

    model, params = load_panda()
    qs = np.tile(np.asarray(PANDA_Q_READY), (4, 1))
    qs[1:, 0] += np.linspace(0.1, 0.3, 3)
    path = tmp_path / "scene.json"
    doc = export_scene_json(model, params, qs, path, every=2)
    assert len(doc["frames"]) == 2
    assert len(doc["geometries"]) == len(model.geometries)
    assert all(g["type"] in ("sphere", "capsule") for g in doc["geometries"])
    on_disk = json.loads(path.read_text())
    assert on_disk["geometries"] == doc["geometries"]
    # the base geometry must move with joint 0
    f0 = np.asarray(doc["frames"][0][-1]["trans"])
    f1 = np.asarray(doc["frames"][1][-1]["trans"])
    assert np.any(np.abs(f0 - f1) > 1e-6) or len(model.geometries) == 0


def test_three_rate_sim_data(tmp_path):
    # reference init_sim_data/extract machinery (`plots/mpc_utils.py:26-111`)
    from agimus_controller_tpu.plots.mpc_utils import (
        extract_plot_data_from_sim_data,
        init_sim_data,
        plot_mpc_results,
        record_mpc,
        record_plan,
        record_sim,
    )

    T, nx, nu = 6, 14, 7
    sd = init_sim_data(T, nx, nu, dt_plan=0.02, dt_mpc=0.01, dt_sim=0.002,
                       duration=0.1)
    assert sd["N_plan"] == 5 and sd["N_mpc"] == 10 and sd["N_sim"] == 50
    rng = np.random.default_rng(3)
    for i in range(sd["N_plan"]):
        record_plan(sd, rng.normal(size=(T + 1, nx)),
                    rng.normal(size=(T, nu)))
        for j in range(2):  # 2 MPC ticks per plan
            record_mpc(sd, rng.normal(size=nx), rng.normal(size=nu))
            for k in range(5):  # 5 SIM steps per MPC tick
                record_sim(sd, rng.normal(size=nx))
    pd = extract_plot_data_from_sim_data(sd)
    assert pd["q_measured"].shape == (50, 7)
    assert pd["u_applied"].shape == (50, 7)
    assert pd["x_pred_interp_mpc"].shape == (10, nx)
    assert pd["time_mpc"].shape == (10,)
    # x0*/x1* interpolation: tick 1 of plan 0 is the midpoint of nodes 0-1
    mid = 0.5 * (sd["state_pred"][0, 0] + sd["state_pred"][0, 1])
    np.testing.assert_allclose(pd["x_pred_interp_mpc"][1], mid)
    figs = plot_mpc_results(pd, dump_path=str(tmp_path))
    assert "state q" in figs and "control u" in figs
    assert any(p.suffix == ".json" for p in tmp_path.iterdir())


def test_three_rate_rejects_uneven_rates():
    from agimus_controller_tpu.plots.mpc_utils import init_sim_data

    with pytest.raises(ValueError):
        init_sim_data(4, 14, 7, dt_plan=0.02, dt_mpc=0.015, dt_sim=0.001,
                      duration=0.1)
