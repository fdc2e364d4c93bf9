"""MPC orchestration layer (reference L3/L4: `mpc.py`, `trajectory.py`,
`warm_start_*.py`, `mpc_data.py`, `ocp_base.py`)."""

from .buffer import (
    DTFactorsNSeq,
    TrajectoryBuffer,
    TrajectoryPoint,
    TrajectoryPointWeights,
    WeightedTrajectoryPoint,
    interpolate_weights,
)
from .data import MPCDebugData, OCPDebugData, OCPResults
from .mpc import MPC
from .ocp_base import OCPBase, OCPJax, OCPParams
from .warm_start import (
    WarmStartBase,
    WarmStartReference,
    WarmStartShiftPreviousSolution,
    WarmStartShiftPreviousSolutionForceFeedback,
)
