"""Trajectory points, weights, FIFO buffer with multi-resolution horizons.

Host-side equivalent of the reference's `trajectory.py` (points `:9-178`,
buffer `:181-231`, `interpolate_weights` `:234-279`). Poses are `(R, p)`
numpy pairs and spatial velocities/forces 6-vectors `[w; v]` / `[n; f]`
instead of pinocchio `SE3/Motion/Force` objects; everything else mirrors the
reference field-for-field so the ROS-side message conversions port 1:1.
"""

from __future__ import annotations

import dataclasses
from copy import deepcopy
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


Pose = Tuple[np.ndarray, np.ndarray]  # (R [3,3], p [3])


@dataclasses.dataclass
class DTFactorsNSeq:
    """Multi-resolution horizon spec (reference `ocp_param_base.py:6-28`):
    segment i uses timestep `factors[i] * dt` for `n_steps[i]` nodes."""

    factors: List[int]
    n_steps: List[int]

    def __post_init__(self):
        assert len(self.factors) == len(self.n_steps)
        assert all(f >= 1 for f in self.factors)


@dataclasses.dataclass
class TrajectoryPoint:
    """Reference for one MPC node (reference `TrajectoryPoint`,
    `trajectory.py:9-81`)."""

    id: Optional[int] = None
    time_ns: Optional[int] = None
    robot_configuration: Optional[np.ndarray] = None
    robot_velocity: Optional[np.ndarray] = None
    robot_acceleration: Optional[np.ndarray] = None
    robot_effort: Optional[np.ndarray] = None
    forces: Optional[Dict[str, np.ndarray]] = None  # [n; f] 6-vectors
    end_effector_poses: Optional[Dict[str, Pose]] = None
    end_effector_velocities: Optional[Dict[str, np.ndarray]] = None  # [w; v]

    @property
    def robot_state(self) -> np.ndarray:
        return np.concatenate((self.robot_configuration, self.robot_velocity))


@dataclasses.dataclass
class TrajectoryPointWeights:
    """Weights for one MPC node (reference `TrajectoryPointWeights`,
    `trajectory.py:84-158`). EE pose weights are 6-vectors ordered
    [translation(3), rotation(3)] like the reference wire format."""

    w_robot_configuration: Optional[np.ndarray] = None
    w_robot_velocity: Optional[np.ndarray] = None
    w_robot_acceleration: Optional[np.ndarray] = None
    w_robot_effort: Optional[np.ndarray] = None
    w_forces: Optional[Dict[str, np.ndarray]] = None
    w_end_effector_poses: Optional[Dict[str, np.ndarray]] = None
    w_end_effector_velocities: Optional[Dict[str, np.ndarray]] = None
    w_collision_avoidance: Optional[float] = None

    @property
    def w_robot_state(self) -> np.ndarray:
        return np.concatenate((self.w_robot_configuration, self.w_robot_velocity))


@dataclasses.dataclass
class WeightedTrajectoryPoint:
    """Point + weights (reference `WeightedTrajectoryPoint`,
    `trajectory.py:161-178`)."""

    point: TrajectoryPoint
    weights: TrajectoryPointWeights


class TrajectoryBuffer:
    """FIFO of WeightedTrajectoryPoints with multi-resolution horizon
    extraction (reference `TrajectoryBuffer`, `trajectory.py:181-231`)."""

    def __init__(self, dt_factor_n_seq: DTFactorsNSeq):
        self._buffer: List[WeightedTrajectoryPoint] = []
        self.dt_factor_n_seq = deepcopy(dt_factor_n_seq)
        self.horizon_indexes = self.compute_horizon_indexes()

    def append(self, item: WeightedTrajectoryPoint):
        self._buffer.append(item)

    def extend(self, items: Sequence[WeightedTrajectoryPoint]):
        self._buffer.extend(items)

    def pop(self, index: int = -1):
        return self._buffer.pop(index)

    def clear_past(self):
        """Drop the consumed head (one base-dt step)."""
        if self._buffer:
            self._buffer.pop(0)

    def compute_horizon_indexes(self) -> List[int]:
        """Cumulative-factor subsampling indexes (reference
        `compute_horizon_indexes`, `trajectory.py:199-215`): with factors
        [1,2] / n_steps [2,2] -> [0, 1, 2, 4, 6]."""
        n_states = sum(self.dt_factor_n_seq.n_steps) + 1
        indexes = [0] * n_states
        i = 1
        for factor, sn in zip(self.dt_factor_n_seq.factors, self.dt_factor_n_seq.n_steps):
            for _ in range(sn):
                indexes[i] = factor + indexes[i - 1]
                i += 1
        assert i == len(indexes)
        assert all(a <= b for a, b in zip(indexes[:-1], indexes[1:]))
        return indexes

    @property
    def horizon(self) -> List[WeightedTrajectoryPoint]:
        assert self.horizon_indexes[-1] < len(self._buffer), (
            "Size of buffer must be at least horizon_indexes[-1]."
        )
        return [self._buffer[i] for i in self.horizon_indexes]

    def __len__(self):
        return len(self._buffer)

    def __getitem__(self, index):
        return self._buffer[index]

    def __setitem__(self, index, value):
        self._buffer[index] = value


def interpolate_weights(
    p1: TrajectoryPointWeights, p2: TrajectoryPointWeights, alpha: float
) -> TrajectoryPointWeights:
    """Linear, dict-aware weight interpolation (reference
    `interpolate_weights`, `trajectory.py:234-279`). Missing dict keys
    interpolate against zero, like the reference."""
    alpha = float(np.clip(alpha, 0.0, 1.0))

    def lerp(a, b):
        return (1.0 - alpha) * a + alpha * b

    def lerp_dict(d1, d2):
        if d1 is None and d2 is None:
            return None
        d1 = d1 or {}
        d2 = d2 or {}
        out = {}
        for key in set(d1) | set(d2):
            if key not in d2:
                out[key] = lerp(d1[key], np.zeros_like(d1[key]))
            elif key not in d1:
                out[key] = lerp(np.zeros_like(d2[key]), d2[key])
            else:
                out[key] = lerp(d1[key], d2[key])
        return out

    def combine(a, b):
        if a is None and b is None:
            return None
        if isinstance(a, dict) or isinstance(b, dict):
            return lerp_dict(a, b)
        if a is None or b is None:
            return a if b is None else b
        return lerp(a, b)

    return TrajectoryPointWeights(
        **{
            f.name: combine(getattr(p1, f.name), getattr(p2, f.name))
            for f in dataclasses.fields(TrajectoryPointWeights)
        }
    )
