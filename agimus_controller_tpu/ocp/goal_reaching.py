"""Hand-coded goal-reaching OCP (reference `OCPCrocoGoalReaching`,
`ocp/ocp_croco_goal_reaching.py:9-213`): the same problem as the YAML
definition but constructed programmatically — stateReg + ctrlReg +
goalTracking(frame placement) per node with per-tick reference updates."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from ..mpc.ocp_base import OCPJax, OCPParams
from .spec import CostItem, ProblemSpec


class OCPGoalReaching(OCPJax):
    def __init__(
        self,
        model: RobotModel,
        params: ModelParams,
        ocp_params: OCPParams,
        ee_frame: str,
        w_state: float = 1.0,
        w_control: float = 1.0,
        w_goal_running: float = 1.0,
        w_goal_terminal: float = 1.0,
        dtype=jnp.float32,
    ):
        model.frame_id(ee_frame)  # validate (single-EE, reference `:164-167`)
        spec = ProblemSpec(
            running_costs=(
                CostItem(name="ctrlReg", kind="control", weight=w_control, update=True),
                CostItem(name="stateReg", kind="state", weight=w_state, update=True),
                CostItem(name="goalTracking", kind="frame_placement",
                         weight=w_goal_running, update=True, frame=ee_frame),
            ),
            terminal_costs=(
                CostItem(name="stateReg", kind="state", weight=w_state, update=True),
                CostItem(name="goalTracking", kind="frame_placement",
                         weight=w_goal_terminal, update=True, frame=ee_frame),
            ),
            horizon=ocp_params.horizon_size,
            dt=ocp_params.dt,
            dt_factor_n_seq=tuple(ocp_params.dt_factor_n_seq),
        )
        super().__init__(model, params, spec, ocp_params, dtype=dtype)
