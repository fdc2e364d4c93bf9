"""OCP facade: the reference's `OCPBase` contract over the jitted solver.

Mirrors `ocp_base.py:11-107` (abstract interface) + `ocp_base_croco.py:16-215`
(concrete Crocoddyl OCP) with one deep difference: references and weights are
not mutated into a model object graph — `set_reference_weighted_trajectory`
packs the horizon into the refs array dict consumed by the jitted solve.
That turns the reference's per-tick Python property-write loop
(`ocp_croco_generic.py:855-892`, its known hot path) into one host->device
transfer.
"""

from __future__ import annotations

import abc
import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import ModelParams, RobotModel
from ..ocp.costs import build_cost_functions
from ..ocp.spec import ProblemSpec, default_references
from ..ops import integrator
from ..solver.fddp import SolverSettings, solve_fddp
from .buffer import WeightedTrajectoryPoint
from .data import OCPDebugData, OCPResults


@dataclasses.dataclass
class OCPParams:
    """Solver/runtime parameters (reference `OCPParamsBaseCroco`,
    `ocp_param_base.py:31-85`)."""

    dt: float = 0.01
    horizon_size: int = 20
    dt_factor_n_seq: Tuple[Tuple[int, int], ...] = ()
    solver_iters: int = 10
    qp_iters: int = 200
    termination_tolerance: float = 1e-3
    eps_abs: float = 1e-6
    eps_rel: float = 0.0
    max_solve_time: float = 0.1
    use_filter_line_search: bool = True
    use_debug_data: bool = False
    n_threads: int = 1  # accepted for API parity; XLA owns parallelism

    @property
    def n_controls(self) -> int:
        return self.horizon_size


class OCPBase(abc.ABC):
    """Abstract OCP contract (reference `OCPBase`, `ocp_base.py:11-107`)."""

    @abc.abstractmethod
    def set_reference_weighted_trajectory(
        self, reference_weighted_trajectory: List[WeightedTrajectoryPoint]
    ): ...

    @property
    @abc.abstractmethod
    def n_controls(self) -> int: ...

    @property
    @abc.abstractmethod
    def dt(self) -> float: ...

    @abc.abstractmethod
    def solve(
        self,
        x0: np.ndarray,
        x_warmstart: List[np.ndarray],
        u_warmstart: List[np.ndarray],
        use_iteration_limits_and_timeout: bool = True,
    ): ...

    @abc.abstractmethod
    def integrate(self, state: np.ndarray, control: np.ndarray) -> np.ndarray: ...

    @property
    @abc.abstractmethod
    def ocp_results(self) -> OCPResults: ...

    @property
    @abc.abstractmethod
    def debug_data(self) -> OCPDebugData: ...


# transforms older than this are nulled before a solve (reference
# `agimus_controller.py:306-338`: 0.5 s TF staleness cutoff)
TRANSFORM_STALENESS_NS = int(0.5e9)


class OCPJax(OCPBase):
    """Concrete OCP over the FDDP/CSQP jitted solver (the `OCPBaseCroco` /
    `OCPCrocoGeneric` replacement)."""

    def __init__(
        self,
        model: RobotModel,
        params: ModelParams,
        spec: ProblemSpec,
        ocp_params: Optional[OCPParams] = None,
        dtype=jnp.float32,
    ):
        self._model = model
        self._params = params
        self._spec = spec
        self._dtype = dtype
        self._ocp_params = ocp_params or OCPParams(
            dt=spec.dt, horizon_size=spec.horizon, dt_factor_n_seq=spec.dt_factor_n_seq
        )
        self._cf = build_cost_functions(model, params, spec, dtype=dtype)
        self._refs = default_references(spec, model, dtype=dtype)
        self._results: Optional[OCPResults] = None
        self._debug = OCPDebugData()
        self._timesteps = spec.timesteps()

        if spec.constraints:
            # constrained specs run the CSQP solver — the reference's runtime
            # solver (`mim_solvers.SolverCSQP`, `ocp_base_croco.py:64-80`)
            from ..solver.csqp import CSQPSettings, solve_csqp

            run_settings = CSQPSettings(
                max_iters=self._ocp_params.solver_iters,
                max_qp_iters=self._ocp_params.qp_iters,
                eps_abs=self._ocp_params.eps_abs,
                eps_rel=self._ocp_params.eps_rel,
                termination_tolerance=self._ocp_params.termination_tolerance,
                use_filter_line_search=self._ocp_params.use_filter_line_search,
            )
            init_settings = dataclasses.replace(run_settings, max_iters=1000)
            solver = solve_csqp
        else:
            run_settings = SolverSettings(
                max_iters=self._ocp_params.solver_iters,
                termination_tolerance=self._ocp_params.termination_tolerance,
                use_filter_line_search=self._ocp_params.use_filter_line_search,
            )
            # first-solve semantics: unlimited budget (1000 iters, no time
            # cap, reference `ocp_base_croco.py:160-171`)
            init_settings = dataclasses.replace(run_settings, max_iters=1000)
            solver = solve_fddp
        self._solve_run = jax.jit(
            lambda x0, refs, xs, us: solver(self._cf, x0, refs, xs, us, run_settings)
        )
        self._solve_init = jax.jit(
            lambda x0, refs, xs, us: solver(self._cf, x0, refs, xs, us, init_settings)
        )
        # delay-compensation integrate runs the node-0 action model, which is
        # the soft-contact step when the spec is force-augmented
        self._integrate0 = jax.jit(
            lambda x, u, refs: self._cf.step(x, u, 0, refs)
        )
        self._run_solver_builder = solver
        self._run_settings = run_settings
        # wall-clock budget enforcement (`max_solve_time`): a calibrated
        # per-iteration cost -> static iteration cap (jit-compatible; see
        # `calibrate_solve_budget`). None = not yet calibrated.
        self._budget_iters: Optional[int] = None
        self._budget_per_iter_s: Optional[float] = None
        # visual-servoing transform staleness bookkeeping (reference
        # `agimus_controller.py:306-338` + `ocp_croco_generic.py:463-467`)
        self._transform_stamp_ns: Dict[str, int] = {}
        self._row_layout = None
        self._vs_items = tuple(
            (c.object_frame, c.frame)
            for c in (tuple(spec.running_costs) + tuple(spec.terminal_costs))
            if c.kind == "visual_servoing"
        )
        self._host_refs: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------
    @property
    def spec(self) -> ProblemSpec:
        return self._spec

    @property
    def n_controls(self) -> int:
        return self._spec.horizon

    @property
    def dt(self) -> float:
        return float(self._timesteps[0])

    @property
    def horizon_size(self) -> int:
        return self._spec.horizon

    @property
    def refs(self) -> Dict[str, jnp.ndarray]:
        return self._refs

    # ------------------------------------------------------------------
    @property
    def row_layout(self):
        """Packed per-point row layout (lazy; shared with `RefRing`)."""
        if self._row_layout is None:
            from .ring import RowLayout

            self._row_layout = RowLayout(self._spec, self._model)
        return self._row_layout

    def set_reference_weighted_trajectory(
        self, reference_weighted_trajectory: List[WeightedTrajectoryPoint]
    ):
        """Pack the horizon's references/weights into device arrays
        (replaces the per-node `update()` mutation loop,
        `ocp_croco_generic.py:855-892`). Each point is flattened into one
        packed row, then the refs arrays are sliced out of the row matrix —
        the same layout the device-resident `RefRing` ships, so the host
        path and the ring path cannot diverge."""
        pts = reference_weighted_trajectory
        T1 = self._spec.horizon + 1
        assert len(pts) == T1, f"expected {T1} horizon points, got {len(pts)}"
        layout = self.row_layout
        np_dtype = np.dtype(jnp.dtype(self._dtype).name)
        rows = np.zeros((T1, layout.width), np_dtype)
        for t, wp in enumerate(pts):
            layout.pack_point(wp, out=rows[t])
        refs = layout.unpack_refs(jnp.asarray(rows), self._refs)
        # host copies kept for staleness checks (no device reads on the
        # control path)
        for frame in layout._frames:
            fl = layout._by_key[f"w_ee:{frame}"]
            self._host_refs[f"w_ee:{frame}"] = (
                rows[:, fl.offset:fl.offset + fl.size])
        self._refs = refs

    def set_transform(
        self,
        object_frame: str,
        rot: np.ndarray,
        trans: np.ndarray,
        time_ns: Optional[int] = None,
    ):
        """Feed a visual-servoing vision transform (reference
        `input_transforms`, `ocp_croco_generic.py:791-796`). ``time_ns``
        stamps the transform for the 0.5 s staleness cutoff
        (`agimus_controller.py:306-338`); defaults to now."""
        self._refs[f"wMo_rot:{object_frame}"] = jnp.asarray(rot, self._dtype)
        self._refs[f"wMo_trans:{object_frame}"] = jnp.asarray(trans, self._dtype)
        self._transform_stamp_ns[object_frame] = (
            time.time_ns() if time_ns is None else int(time_ns))

    def validate_transforms(self, now_ns: Optional[int] = None):
        """Null stale visual-servoing transforms and enforce the reference's
        invariant that VS weights are zero while no transform is available.

        Mirrors the controller's TF handling (`agimus_controller.py:306-338`:
        transforms older than 0.5 s are dropped) + the OCP-side assertion
        (`ocp_croco_generic.py:463-467`). Raises AssertionError if the
        streamed VS weights are nonzero for a frame with no fresh transform.
        """
        now = time.time_ns() if now_ns is None else int(now_ns)
        for obj, frame in self._vs_items:
            stamp = self._transform_stamp_ns.get(obj)
            if stamp is not None and now - stamp <= TRANSFORM_STALENESS_NS:
                continue
            if stamp is not None:
                self._transform_stamp_ns.pop(obj, None)
                self._refs[f"wMo_rot:{obj}"] = jnp.eye(3, dtype=self._dtype)
                self._refs[f"wMo_trans:{obj}"] = jnp.zeros(3, dtype=self._dtype)
            w = self._host_refs.get(f"w_ee:{frame}")
            assert w is None or not np.any(np.abs(w) > 0.0), (
                f"weights of visual servoing cost (frame {frame!r}) must be "
                f"zero while no fresh transform for {obj!r} is available "
                "(reference ocp_croco_generic.py:463-467)")

    def update_geometry_placement(self, geom_rot: np.ndarray, geom_trans: np.ndarray):
        """Move obstacle geometries (reference `update_geometry_placement`,
        `ocp_base_croco.py:110-132`)."""
        self._refs["geom_rot"] = jnp.asarray(geom_rot, self._dtype)
        self._refs["geom_trans"] = jnp.asarray(geom_trans, self._dtype)

    # ------------------------------------------------------------------
    def calibrate_solve_budget(self, x0, x_warmstart, u_warmstart) -> int:
        """Enforce `max_solve_time` (reference `ocp_base_croco.py:70-71,
        166-171`) the jit-compatible way: measure the per-iteration cost of
        the compiled run solver once, then cap the static iteration count so
        a tick can never exceed its wall-clock budget. Returns the cap.

        Call after the first (unlimited) solve — e.g. from the runtime's
        initialization path — so compilation cost is already paid.
        """
        xs = jnp.asarray(np.stack(x_warmstart), self._dtype)
        us = jnp.asarray(np.stack(u_warmstart), self._dtype)
        x0j = jnp.asarray(x0, self._dtype)
        sol = self._solve_run(x0j, self._refs, xs, us)  # compile
        jax.block_until_ready(sol.cost)
        t0 = time.perf_counter()
        n_cal = 3
        for _ in range(n_cal):
            sol = self._solve_run(x0j, self._refs, xs, us)
        jax.block_until_ready(sol.cost)
        per_solve = (time.perf_counter() - t0) / n_cal
        full_iters = max(1, int(self._ocp_params.solver_iters))
        self._budget_per_iter_s = per_solve / full_iters
        budget = self._ocp_params.max_solve_time
        if budget and per_solve > budget:
            capped = max(1, int(budget / self._budget_per_iter_s))
            capped = min(capped, full_iters)
            if capped < full_iters:
                settings = dataclasses.replace(
                    self._run_settings, max_iters=capped)
                self._solve_run = jax.jit(
                    lambda x0_, refs, xs_, us_: self._run_solver_builder(
                        self._cf, x0_, refs, xs_, us_, settings))
            self._budget_iters = capped
        else:
            self._budget_iters = full_iters
        return self._budget_iters

    @property
    def budget_iters(self) -> Optional[int]:
        return self._budget_iters

    def solve(
        self,
        x0: np.ndarray,
        x_warmstart,
        u_warmstart,
        use_iteration_limits_and_timeout: bool = True,
    ):
        xs = jnp.asarray(np.stack(x_warmstart), self._dtype)
        us = jnp.asarray(np.stack(u_warmstart), self._dtype)
        x0j = jnp.asarray(x0, self._dtype)
        fn = self._solve_run if use_iteration_limits_and_timeout else self._solve_init
        sol = fn(x0j, self._refs, xs, us)
        self._results = OCPResults(
            states=np.asarray(sol.xs),
            ricatti_gains=np.asarray(sol.K),
            feed_forward_terms=np.asarray(sol.us),
        )
        self._debug.kkt_norm = float(sol.kkt)
        self._debug.nb_iter = int(sol.iters)
        self._debug.nb_qp_iter = int(getattr(sol, "qp_iters", 0))
        self._debug.problem_solved = bool(sol.converged)
        return self._results

    def integrate(self, state: np.ndarray, control: np.ndarray) -> np.ndarray:
        """One Euler step on the first node's dynamics (delay compensation,
        reference `ocp_base_croco.py:184-189`)."""
        return np.asarray(
            self._integrate0(
                jnp.asarray(state, self._dtype),
                jnp.asarray(control, self._dtype),
                self._refs,
            )
        )

    @property
    def ocp_results(self) -> OCPResults:
        return self._results

    @ocp_results.setter
    def ocp_results(self, value: OCPResults):
        self._results = value

    @property
    def debug_data(self) -> OCPDebugData:
        return self._debug
