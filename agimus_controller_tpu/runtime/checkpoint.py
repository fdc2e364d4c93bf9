"""Controller checkpoint/resume.

SURVEY.md §5: the reference has no in-controller checkpointing — its
substitute is rosbag record/replay, and the only cross-tick state is the
warm-start previous solution, rebuilt by one unlimited-budget solve. Here the
full hot state (previous solution + trajectory buffer) snapshots to one npz,
so a controller restarts *without* the expensive first solve."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..mpc.buffer import (
    TrajectoryBuffer,
    TrajectoryPoint,
    TrajectoryPointWeights,
    WeightedTrajectoryPoint,
)
from ..mpc.data import OCPResults
from ..mpc.mpc import MPC


def save_checkpoint(path, mpc: MPC) -> None:
    """Snapshot warm-start previous solution + buffer contents."""
    ws = mpc._warm_start
    buf = mpc._buffer
    payload = {}
    sol: Optional[OCPResults] = getattr(ws, "_previous_solution", None)
    if sol is not None:
        payload["ws_states"] = np.asarray(sol.states)
        payload["ws_gains"] = np.asarray(sol.ricatti_gains)
        payload["ws_ff"] = np.asarray(sol.feed_forward_terms)
    n = len(buf)
    payload["buf_len"] = np.asarray(n)
    if n:
        payload["buf_id"] = np.asarray([wp.point.id if wp.point.id is not None else -1
                                        for wp in buf])
        payload["buf_time_ns"] = np.asarray(
            [wp.point.time_ns if wp.point.time_ns is not None else 0 for wp in buf])
        payload["buf_q"] = np.stack([wp.point.robot_configuration for wp in buf])
        payload["buf_v"] = np.stack([wp.point.robot_velocity for wp in buf])
        if buf[0].point.robot_effort is not None:
            payload["buf_tau"] = np.stack([wp.point.robot_effort for wp in buf])
        payload["buf_wq"] = np.stack([wp.weights.w_robot_configuration for wp in buf])
        payload["buf_wv"] = np.stack([wp.weights.w_robot_velocity for wp in buf])
    np.savez_compressed(Path(path), **payload)


def load_checkpoint(path, mpc: MPC) -> bool:
    """Restore warm-start + buffer into an already-`setup()` MPC. Returns
    True when a previous solution was restored (first solve can be skipped)."""
    with np.load(Path(path)) as f:
        data = {k: f[k] for k in f.files}
    n = int(data.get("buf_len", 0))
    buf = mpc._buffer
    buf.clear()
    for i in range(n):
        pt = TrajectoryPoint(
            id=int(data["buf_id"][i]) if data["buf_id"][i] >= 0 else None,
            time_ns=int(data["buf_time_ns"][i]),
            robot_configuration=data["buf_q"][i],
            robot_velocity=data["buf_v"][i],
            robot_effort=data["buf_tau"][i] if "buf_tau" in data else None,
        )
        w = TrajectoryPointWeights(
            w_robot_configuration=data["buf_wq"][i],
            w_robot_velocity=data["buf_wv"][i],
        )
        buf.append(WeightedTrajectoryPoint(point=pt, weights=w))
    if "ws_states" in data:
        mpc._warm_start.update_previous_solution(OCPResults(
            states=data["ws_states"], ricatti_gains=data["ws_gains"],
            feed_forward_terms=data["ws_ff"]))
        return True
    return False
