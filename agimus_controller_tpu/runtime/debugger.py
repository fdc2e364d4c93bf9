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

    @staticmethod
    def streams_from_tick(debug) -> Optional[Dict[str, Dict[str, np.ndarray]]]:
        """Consume the per-tick named reference/residual streams the OCP
        already published (`OCPDebugData.references/residuals`, filled by
        `OCPJax._fill_debug_streams` when `use_debug_data` is on) WITHOUT
        re-evaluating the OCP — the reference's MpcDebug-message consumption
        path (`ros_utils.py:295-317`). Returns None when the tick carried no
        streams (fall back to `evaluate`)."""
        ocp_dbg = getattr(debug, "ocp", debug)
        if ocp_dbg is None or not (ocp_dbg.references or ocp_dbg.residuals):
            return None
        return {
            "references": dict(ocp_dbg.references),
            "residuals": dict(ocp_dbg.residuals),
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


class LiveDebugView:
    """Live rendering of the debugger data: animated per-cost bar chart,
    normalized |dL/dx| heatmap and the FK-projected EE prediction path —
    the reference's matplotlib animation + RViz marker stream
    (`mpc_debugger_node.py:269-379` cost plots, `:450-611` markers).

    Interactive sessions get a redrawing figure (`update` + `plt.pause`);
    headless runs render each tick to a PNG under ``out_dir``
    (`render_run`), which is also what the tests exercise.
    """

    def __init__(self, debugger: MPCDebugger, ee_frame: Optional[str] = None,
                 interactive: bool = False):
        import matplotlib

        if not interactive:
            matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        self._plt = plt
        self._dbg = debugger
        self._frame = ee_frame
        self._interactive = interactive
        ncols = 3 if ee_frame else 2
        self._fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
        self._ax_bar, self._ax_heat = axes[0], axes[1]
        self._ax_ee = axes[2] if ee_frame else None
        self._bars = None
        self._im = None
        self._ee_line = None

    def update(self, xs: np.ndarray, us: np.ndarray) -> Dict:
        """Re-evaluate the OCP on a received prediction and redraw."""
        data = self._dbg.evaluate(xs, us)
        names = list(data["running_costs"].keys())
        totals = [float(np.sum(v)) for v in data["running_costs"].values()]
        if self._bars is None:
            self._bars = self._ax_bar.bar(range(len(names)), totals)
            self._ax_bar.set_xticks(range(len(names)))
            self._ax_bar.set_xticklabels(names, rotation=30, ha="right")
            self._ax_bar.set_title("running cost per term")
        else:
            for b, v in zip(self._bars, totals):
                b.set_height(v)
            self._ax_bar.relim()
            self._ax_bar.autoscale_view()
        heat = data["grad_heatmap"]
        norm = heat / (np.max(heat) + 1e-12)
        if self._im is None:
            self._im = self._ax_heat.imshow(
                norm.T, aspect="auto", origin="lower", cmap="viridis")
            self._ax_heat.set_title("|dL/dx| (normalized)")
            self._ax_heat.set_xlabel("node")
            self._ax_heat.set_ylabel("state dim")
        else:
            self._im.set_data(norm.T)
        if self._ax_ee is not None:
            path = self._dbg.ee_path(xs, self._frame)
            if self._ee_line is None:
                (self._ee_line,) = self._ax_ee.plot(path[:, 0], path[:, 2],
                                                    "o-", ms=2)
                self._ax_ee.set_title(f"EE prediction path ({self._frame})")
                self._ax_ee.set_xlabel("x [m]")
                self._ax_ee.set_ylabel("z [m]")
            else:
                self._ee_line.set_data(path[:, 0], path[:, 2])
                self._ax_ee.relim()
                self._ax_ee.autoscale_view()
        if self._interactive:
            self._plt.pause(0.001)
        return data

    def render_run(self, state_predictions: np.ndarray,
                   control_predictions: np.ndarray, out_dir,
                   every: int = 1) -> list:
        """Render a recorded run ([K, T+1, nx], [K, T, nu]) frame-by-frame
        to PNGs; returns the written paths (the offline-animation mode)."""
        from pathlib import Path

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        paths = []
        for k in range(0, state_predictions.shape[0], every):
            self.update(state_predictions[k], control_predictions[k])
            p = out / f"debug_{k:05d}.png"
            self._fig.savefig(p, dpi=60)
            paths.append(p)
        return paths

    def close(self):
        self._plt.close(self._fig)
