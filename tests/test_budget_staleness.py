"""max_solve_time budget enforcement + visual-servoing transform staleness.

Round-2 VERDICT items 3 and 5. Reference behaviors matched:
- `ocp_base_croco.py:70-71,166-171`: every tick capped at `max_solve_time`;
- `agimus_controller.py:306-338`: transforms older than 0.5 s are nulled;
- `ocp_croco_generic.py:463-467`: visual-servoing weights must be zero while
  no transform is available.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.mpc.ocp_base import (
    OCPJax,
    OCPParams,
    TRANSFORM_STALENESS_NS,
)
from agimus_controller_tpu.ocp.spec import CostItem, ProblemSpec

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda():
    return load_panda()


def _goal_spec(T=6, vs=False):
    running = [
        CostItem(name="state_reg", kind="state", weight=0.1, update=True),
        CostItem(name="ctrl", kind="control_grav", weight=1e-3),
        CostItem(name="goal", kind="frame_placement", weight=10.0,
                 update=True, frame="panda_hand_tcp"),
    ]
    if vs:
        running.append(CostItem(
            name="vs", kind="visual_servoing", weight=5.0, update=True,
            frame="panda_hand_tcp", object_frame="object"))
    return ProblemSpec(
        running_costs=tuple(running),
        terminal_costs=(CostItem(name="state_reg", kind="state", weight=0.1,
                                 update=True),),
        horizon=T,
        dt=0.02,
    )


def _warm(model, T):
    x0 = np.concatenate([np.asarray(PANDA_Q_READY), np.zeros(7)])
    xs = [x0.copy() for _ in range(T + 1)]
    us = [np.zeros(7) for _ in range(T)]
    return x0, xs, us


def test_max_solve_time_caps_iterations(panda):
    model, params = panda
    T = 6
    spec = _goal_spec(T)
    ocp = OCPJax(model, params, spec, OCPParams(
        dt=0.02, horizon_size=T, solver_iters=10,
        max_solve_time=1e-7))  # deliberately impossible budget
    x0, xs, us = _warm(model, T)
    ocp.solve(x0, xs, us, use_iteration_limits_and_timeout=False)
    cap = ocp.calibrate_solve_budget(x0, xs, us)
    assert cap == 1  # the tightest legal cap
    # capped solve flags non-convergence
    ocp.solve(x0, xs, us)  # first call compiles the capped program
    assert ocp.debug_data.nb_iter <= cap
    assert not ocp.debug_data.problem_solved
    # steady-state wall clock is a small multiple of the per-iter cost
    t0 = time.perf_counter()
    ocp.solve(x0, xs, us)
    elapsed = time.perf_counter() - t0
    assert elapsed < 50 * ocp._budget_per_iter_s + 1.0


def test_generous_budget_keeps_full_iterations(panda):
    model, params = panda
    T = 6
    spec = _goal_spec(T)
    ocp = OCPJax(model, params, spec, OCPParams(
        dt=0.02, horizon_size=T, solver_iters=5, max_solve_time=1e3))
    x0, xs, us = _warm(model, T)
    ocp.solve(x0, xs, us, use_iteration_limits_and_timeout=False)
    assert ocp.calibrate_solve_budget(x0, xs, us) == 5


def test_stale_transform_nulled_and_weights_asserted(panda):
    model, params = panda
    T = 4
    spec = _goal_spec(T, vs=True)
    ocp = OCPJax(model, params, spec, OCPParams(dt=0.02, horizon_size=T))

    now = time.time_ns()
    rot = np.eye(3)
    trans = np.asarray([0.3, 0.1, 0.5])
    ocp.set_transform("object", rot, trans, time_ns=now)

    # fresh transform: fine regardless of weights
    ocp.validate_transforms(now_ns=now + TRANSFORM_STALENESS_NS // 2)
    assert np.allclose(np.asarray(ocp.refs["wMo_trans:object"]), trans)

    # stale: transform nulled; zero VS weights -> passes
    ocp.validate_transforms(now_ns=now + TRANSFORM_STALENESS_NS + 1)
    assert np.allclose(np.asarray(ocp.refs["wMo_trans:object"]), 0.0)
    assert np.allclose(np.asarray(ocp.refs["wMo_rot:object"]), np.eye(3))

    # nonzero streamed VS weights with no transform -> assertion
    ocp._host_refs["w_ee:panda_hand_tcp"] = np.ones((T + 1, 6))
    with pytest.raises(AssertionError, match="visual servoing"):
        ocp.validate_transforms(now_ns=now + 2 * TRANSFORM_STALENESS_NS)
