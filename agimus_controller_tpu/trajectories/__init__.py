"""Reference trajectory generators (reference L5:
`agimus_controller/trajectories/`): quintic ramps, sine waves in
configuration/cartesian space, weight schedules, user-supplied arrays,
visual-servoing state machine."""

from .base import QuinticTrajectory, SinWaveParams, TrajectoryBase, WeightIncreasing
from .generic import GenericTrajectory, GenericVisualServoingTrajectory, VisualServoingState
from .sine_waves import (
    SinusWaveCartesianSpace,
    SinusWaveCartesianSpaceWeightIncreasing,
    SinusWaveConfigurationSpace,
)
