"""MPC debugger: re-evaluate per-cost values/residuals over received
predictions (reference `MPCDebuggerNode`,
`agimus_controller_ros/mpc_debugger_node.py:82-679`).

The reference rebuilds the controller's OCP from its ROS params and re-runs
Crocoddyl calc/calcDiff on each received prediction to produce a live per-cost
bar chart + cost-Jacobian heatmap; here the same data comes from one jitted
vmapped `cost_breakdown` pass plus `jax.grad` of the stage cost. EE-path
extraction for markers is a batched FK call (reference FK-projected
MarkerArrays `:555-611`)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mpc.ocp_base import OCPJax
from ..ops import kinematics


class MPCDebugger:
    def __init__(self, ocp: OCPJax):
        self._ocp = ocp
        self._cf = ocp._cf
        self._model = ocp._model
        self._params = ocp._params
        T = ocp.spec.horizon
        ts = jnp.arange(T)

        def breakdown(xs, us, refs):
            run = jax.vmap(
                lambda x, u, t: {
                    k: v[0] for k, v in self._cf.cost_breakdown(x, u, t, refs).items()
                }
            )(xs[:-1], us, ts)
            u0 = jnp.zeros_like(us[0])
            term = {
                k: v[0]
                for k, v in self._cf.cost_breakdown(
                    xs[-1], u0, T, refs, terminal=True
                ).items()
            }
            return run, term

        def residuals(xs, us, refs):
            return jax.vmap(
                lambda x, u, t: {
                    k: v[1] for k, v in self._cf.cost_breakdown(x, u, t, refs).items()
                }
            )(xs[:-1], us, ts)

        def grad_heatmap(xs, us, refs):
            """|d(stage cost)/dx| per node — the normalized cost-Jacobian
            heatmap of the reference (`_init_cost_plot`, `:330-379`)."""
            g = jax.vmap(
                lambda x, u, t: jax.grad(
                    lambda xx: self._cf.stage_cost(xx, u, t, refs)
                )(x)
            )(xs[:-1], us, ts)
            return jnp.abs(g)

        self._breakdown = jax.jit(breakdown)
        self._residuals = jax.jit(residuals)
        self._heatmap = jax.jit(grad_heatmap)

    def evaluate(self, xs: np.ndarray, us: np.ndarray) -> Dict:
        """Per-cost running values [T], terminal values, residual streams and
        the |dL/dx| heatmap for a prediction (xs [T+1,nx], us [T,nu])."""
        refs = self._ocp.refs
        xs_j = jnp.asarray(xs, self._ocp._dtype)
        us_j = jnp.asarray(us, self._ocp._dtype)
        run, term = self._breakdown(xs_j, us_j, refs)
        res = self._residuals(xs_j, us_j, refs)
        heat = self._heatmap(xs_j, us_j, refs)
        return {
            "running_costs": {k: np.asarray(v) for k, v in run.items()},
            "terminal_costs": {k: float(v) for k, v in term.items()},
            "residuals": {k: np.asarray(v) for k, v in res.items()},
            "grad_heatmap": np.asarray(heat),
        }

    def ee_path(self, xs: np.ndarray, frame: str) -> np.ndarray:
        """FK-projected EE positions of a predicted state path, [T+1, 3]
        (the RViz prediction-marker data)."""
        fid = self._model.frame_id(frame)
        f = jax.jit(jax.vmap(
            lambda q: kinematics.frame_placement(self._model, self._params, q, fid)[1]
        ))
        qs = jnp.asarray(xs[:, : self._model.nq], self._ocp._dtype)
        return np.asarray(f(qs))
