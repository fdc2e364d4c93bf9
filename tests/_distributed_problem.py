"""Shared tiny Panda problem for the 2-process distributed test.

Imported by BOTH the pytest parent (single-process reference solve) and
tests/_distributed_worker.py (sharded 2-process solve) so the two sides
provably solve the same OCP.
"""

import jax.numpy as jnp
import numpy as np


def build_tiny_problem():
    """(model, params, spec, cf, refs, x0_of) — T=8 goal-tracking OCP.

    ``x0_of(i)`` gives scenario i's initial state: PANDA_Q_READY with a
    deterministic per-scenario joint perturbation, so every global
    scenario is distinct and a shard mix-up cannot cancel out.
    """
    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.ocp.costs import build_cost_functions
    from agimus_controller_tpu.ocp.spec import (
        CostItem,
        ProblemSpec,
        default_references,
    )

    T = 8
    model, params = load_panda(dtype=np.float64)
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="ctrl", kind="control_grav", weight=1e-3),
            CostItem(name="goal", kind="frame_placement", weight=10.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="goal", kind="frame_placement", weight=100.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T,
        dt=0.01,
    )
    cf = build_cost_functions(model, params, spec, dtype=jnp.float64)
    refs = default_references(spec, model, dtype=jnp.float64)
    q0 = np.asarray(PANDA_Q_READY, np.float64)
    x0 = np.concatenate([q0, np.zeros(7)])
    refs["xref"] = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))

    def x0_of(i: int) -> np.ndarray:
        out = x0.copy()
        out[:7] += 0.02 * (1 + i) * np.sin(1.0 + np.arange(7.0))
        return out

    return model, params, spec, cf, refs, x0_of
