"""Host runtime: the controller-node lifecycle without ROS (reference L6,
`agimus_controller_ros/agimus_controller.py`). In-process channels replace
DDS topics; the same semantics are preserved (buffer gating, constant-delay
compensation, control message contents, telemetry)."""

from .controller import Control, ControllerRuntime, RuntimeParams, Sensor
from .recorder import MPCRecorder
