"""Standalone trajectory-publisher process (reference
`simple_trajectory_publisher.py:162-406`): process separation, monotonic
ids, end-of-stream, and pumping into a controller buffer."""

import numpy as np

from agimus_controller_tpu.models.panda import PANDA_Q_READY
from agimus_controller_tpu.mpc.buffer import (
    DTFactorsNSeq,
    TrajectoryBuffer,
)
from agimus_controller_tpu.runtime.publisher import (
    PublisherParams,
    TrajectoryPublisherProcess,
)


def _make_traj():
    from agimus_controller_tpu.trajectories.base import SinWaveParams
    from agimus_controller_tpu.trajectories.sine_waves import (
        SinusWaveConfigurationSpace,
    )

    return SinusWaveConfigurationSpace(
        SinWaveParams(amplitude=[0.2] * 7, period=[2.0] * 7,
                      scale_duration=[1.0] * 7),
        ee_frame_name="panda_hand_tcp",
        w_q=np.full(7, 1.0), w_qdot=np.full(7, 0.1),
        w_qddot=np.zeros(7), w_robot_effort=np.zeros(7),
        w_pose=np.full(6, 1.0))


def test_publisher_streams_points():
    params = PublisherParams(ocp_dt=0.01, rate_s=0.0, max_points=50)
    pub = TrajectoryPublisherProcess(_make_traj, PANDA_Q_READY, params)
    got = []
    with pub:
        deadline = 60.0
        import time

        t0 = time.monotonic()
        while not pub.done and time.monotonic() - t0 < deadline:
            pub.pump_into(got.append, timeout_s=1.0)
    assert len(got) == 50
    ids = [p.point.id for p in got]
    assert ids == list(range(50)), "ids must be monotonically increasing"
    # points carry the full reference payload
    assert got[0].point.robot_configuration.shape == (7,)
    assert np.isfinite(got[0].point.robot_effort).all()
    assert np.all(np.asarray(got[0].weights.w_robot_configuration) == 1.0)


def test_publisher_feeds_buffer():
    buf = TrajectoryBuffer(DTFactorsNSeq(factors=[1], n_steps=[10]))
    params = PublisherParams(ocp_dt=0.01, rate_s=0.0, max_points=30)
    with TrajectoryPublisherProcess(_make_traj, PANDA_Q_READY, params) as pub:
        import time

        t0 = time.monotonic()
        while not pub.done and time.monotonic() - t0 < 60.0:
            pub.pump_into(buf.append, timeout_s=1.0)
    assert len(buf) == 30
    horizon = buf.horizon
    assert len(horizon) == 11  # horizon_indexes[-1] + 1 points available
