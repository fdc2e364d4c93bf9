"""MPC orchestrator: the per-tick receding-horizon pipeline.

Reference: `MPC` (`mpc.py:14-95`). Semantics preserved: buffer-sufficiency
guard, horizon extraction at `horizon_indexes`, reference update, warm start,
solve, previous-solution update, buffer head pop, and the four ns-phase
timers surfaced in `MPCDebugData` (`mpc.py:32-66`). The known reference
defect `time_ns += int(dt*1e-9)` (`mpc.py:77`, SURVEY.md known defects) is
fixed to `int(dt*1e9)`.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from .buffer import TrajectoryBuffer, TrajectoryPoint, WeightedTrajectoryPoint
from .data import MPCDebugData, OCPResults
from .ocp_base import OCPBase
from .warm_start import WarmStartBase


class MPC:
    def __init__(self) -> None:
        self._ocp: Optional[OCPBase] = None
        self._warm_start: Optional[WarmStartBase] = None
        self._buffer: Optional[TrajectoryBuffer] = None
        self._mpc_debug_data: Optional[MPCDebugData] = None

    def setup(
        self,
        ocp: OCPBase,
        warm_start: WarmStartBase,
        buffer: TrajectoryBuffer,
    ) -> None:
        self._ocp = ocp
        self._warm_start = warm_start
        self._buffer = buffer
        self._mpc_debug_data = MPCDebugData(ocp=self._ocp.debug_data)

    def run(self, initial_state: TrajectoryPoint, current_time_ns: int) -> Optional[OCPResults]:
        assert self._ocp is not None
        assert self._warm_start is not None
        timer1 = time.perf_counter_ns()

        if len(self._buffer) < self._ocp.n_controls + 1:
            return None
        reference_trajectory = self._buffer.horizon
        self._ocp.set_reference_weighted_trajectory(reference_trajectory)
        timer2 = time.perf_counter_ns()

        reference_points = [el.point for el in reference_trajectory]
        x0, x_init, u_init = self._warm_start.generate(initial_state, reference_points)
        assert len(x_init) == self._ocp.n_controls + 1
        assert len(u_init) == self._ocp.n_controls
        timer3 = time.perf_counter_ns()

        self._ocp.solve(x0, x_init, u_init)
        self._warm_start.update_previous_solution(self._ocp.ocp_results)
        self._buffer.clear_past()
        timer4 = time.perf_counter_ns()

        self._mpc_debug_data.ocp = self._ocp.debug_data
        self._mpc_debug_data.reference_id = reference_points[0].id
        self._mpc_debug_data.duration_iteration_ns = timer4 - timer1
        self._mpc_debug_data.duration_horizon_update_ns = timer2 - timer1
        self._mpc_debug_data.duration_generate_warm_start_ns = timer3 - timer2
        self._mpc_debug_data.duration_ocp_solve_ns = timer4 - timer3
        return self._ocp.ocp_results

    def integrate(self, state: TrajectoryPoint, control: np.ndarray) -> TrajectoryPoint:
        """Advance a state one OCP dt (constant-delay compensation path,
        reference `mpc.py:68-83` / `agimus_controller.py:518-523`)."""
        x = self._ocp.integrate(state.robot_state, control)
        nq = len(state.robot_configuration)
        state.time_ns += int(self._ocp.dt * 1e9)
        state.robot_configuration = x[:nq]
        state.robot_velocity = x[nq:]
        return state

    @property
    def mpc_debug_data(self) -> MPCDebugData:
        return self._mpc_debug_data

    def append_trajectory_point(self, trajectory_point: WeightedTrajectoryPoint):
        self._buffer.append(trajectory_point)

    def append_trajectory_points(self, trajectory_points: List[WeightedTrajectoryPoint]):
        self._buffer.extend(trajectory_points)
