"""MPC telemetry recorder: the rosbag-record analog (reference checkpoint/
resume substitute, SURVEY.md §5: `/ocp_x0` + `/mpc_debug` recording via
`read_from_bag_trajectory.py`). Records per-tick inputs/outputs into numpy
arrays, feeds `plots.plot_mpc_data`, and round-trips through `.npz` so runs
can be replayed offline."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..mpc.data import MPCDebugData, OCPResults


class MPCRecorder:
    def __init__(self):
        self.time_ns: List[int] = []
        self.x0: List[np.ndarray] = []
        self.state_predictions: List[np.ndarray] = []
        self.control_predictions: List[np.ndarray] = []
        self.kkt: List[float] = []
        self.iters: List[int] = []
        self.qp_iters: List[int] = []
        self.solve_time_ns: List[int] = []

    def record(self, time_ns: int, x0: np.ndarray, res: OCPResults,
               debug: MPCDebugData) -> None:
        self.time_ns.append(time_ns)
        self.x0.append(np.asarray(x0))
        self.state_predictions.append(res.states)
        self.control_predictions.append(res.feed_forward_terms)
        self.kkt.append(debug.ocp.kkt_norm if debug.ocp else 0.0)
        self.iters.append(debug.ocp.nb_iter if debug.ocp else 0)
        self.qp_iters.append(debug.ocp.nb_qp_iter if debug.ocp else 0)
        self.solve_time_ns.append(debug.duration_ocp_solve_ns)

    def as_mpc_data(self) -> Dict[str, np.ndarray]:
        t0 = self.time_ns[0] if self.time_ns else 0
        return {
            "time": (np.asarray(self.time_ns) - t0) / 1e9,
            "x0": np.stack(self.x0) if self.x0 else np.zeros((0, 0)),
            "state_predictions": np.stack(self.state_predictions)
            if self.state_predictions else np.zeros((0, 0, 0)),
            "control_predictions": np.stack(self.control_predictions)
            if self.control_predictions else np.zeros((0, 0, 0)),
            "kkt": np.asarray(self.kkt),
            "iters": np.asarray(self.iters),
            "qp_iters": np.asarray(self.qp_iters),
            "solve_time_ns": np.asarray(self.solve_time_ns),
        }

    def save(self, path) -> None:
        np.savez_compressed(Path(path), **self.as_mpc_data())

    @staticmethod
    def load(path) -> Dict[str, np.ndarray]:
        with np.load(Path(path)) as f:
            return {k: f[k] for k in f.files}
