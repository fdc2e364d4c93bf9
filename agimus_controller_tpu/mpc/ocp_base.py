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
    def set_reference_weighted_trajectory(
        self, reference_weighted_trajectory: List[WeightedTrajectoryPoint]
    ):
        """Pack the horizon's references/weights into device arrays
        (replaces the per-node `update()` mutation loop,
        `ocp_croco_generic.py:855-892`)."""
        pts = reference_weighted_trajectory
        T1 = self._spec.horizon + 1
        assert len(pts) == T1, f"expected {T1} horizon points, got {len(pts)}"
        refs = dict(self._refs)
        np_dtype = np.dtype(jnp.dtype(self._dtype).name)

        def stack(get, shape):
            out = np.zeros((T1,) + shape, dtype=np_dtype)
            for t, wp in enumerate(pts):
                val = get(wp)
                if val is not None:
                    out[t] = val
            return out

        nxs = self._spec.state_dim(self._model)
        if "xref" in refs:
            def xref_of(wp):
                x = wp.point.robot_state
                return np.concatenate([x, np.zeros(nxs - len(x))]) if len(x) < nxs else x

            def wx_of(wp):
                w = wp.weights.w_robot_state
                return np.concatenate([w, np.zeros(nxs - len(w))]) if len(w) < nxs else w

            refs["xref"] = jnp.asarray(stack(xref_of, (nxs,)))
            refs["w_x"] = jnp.asarray(stack(wx_of, (nxs,)))
        if "uref" in refs:
            refs["uref"] = jnp.asarray(stack(lambda wp: wp.point.robot_effort, (self._model.nv,)))
            refs["w_u"] = jnp.asarray(stack(lambda wp: wp.weights.w_robot_effort, (self._model.nv,)))
        if "w_coll" in refs:
            refs["w_coll"] = jnp.asarray(stack(
                lambda wp: wp.weights.w_collision_avoidance, ()))

        if self._spec.soft_contact is not None:
            # desired force + activation from the streamed wrench/weights
            # (reference per-tick `dam.f_des/f_weight/active_contact` update,
            # `ocp_croco_generic_force_feedback.py:141-155`)
            sc = self._spec.soft_contact
            mask = list(sc.mask_indices())
            ncf = sc.nc
            f_des = np.zeros((T1, ncf), dtype=np_dtype)
            w_f = np.zeros((T1, ncf), dtype=np_dtype)
            active = np.zeros((T1,), dtype=np_dtype)
            for t, wp in enumerate(pts):
                forces = wp.point.forces or {}
                wforces = wp.weights.w_forces or {}
                fv = forces.get(sc.frame)
                wv = wforces.get(sc.frame)
                if fv is not None:
                    f_des[t] = np.asarray(fv)[3:6][mask]  # [n; f] -> linear
                if wv is not None:
                    w_sel = np.asarray(wv)[:3][mask]
                    w_f[t] = w_sel
                    active[t] = 1.0 if np.sum(np.abs(w_sel)) > 1e-9 else 0.0
            refs["f_des"] = jnp.asarray(f_des)
            refs["w_force"] = jnp.asarray(w_f)
            refs["contact_active"] = jnp.asarray(active)

        def ee_entry(dct, frame):
            """Reference semantics: match by frame name; if the point carries
            exactly one EE entry, use it (`ocp_croco_generic.py:198-221`
            dynamic-id path)."""
            if dct is None:
                return None
            if frame in dct:
                return dct[frame]
            if len(dct) == 1:
                return next(iter(dct.values()))
            return None

        for key in list(refs):
            if key.startswith("ee_rot:"):
                frame = key.split(":", 1)[1]
                rots = np.tile(np.eye(3, dtype=np_dtype), (T1, 1, 1))
                trans = np.zeros((T1, 3), dtype=np_dtype)
                w = np.zeros((T1, 6), dtype=np_dtype)
                for t, wp in enumerate(pts):
                    pose = ee_entry(wp.point.end_effector_poses, frame)
                    if pose is not None:
                        rots[t], trans[t] = pose[0], pose[1]
                    wv = ee_entry(wp.weights.w_end_effector_poses, frame)
                    if wv is not None:
                        # wire order [trans(3), rot(3)] -> twist order [rot, trans]
                        w[t, :3], w[t, 3:] = wv[3:], wv[:3]
                refs[key] = jnp.asarray(rots)
                refs[f"ee_trans:{frame}"] = jnp.asarray(trans)
                refs[f"w_ee:{frame}"] = jnp.asarray(w)
            elif key.startswith("ee_vel:"):
                frame = key.split(":", 1)[1]
                vel = np.zeros((T1, 6), dtype=np_dtype)
                w = np.zeros((T1, 6), dtype=np_dtype)
                for t, wp in enumerate(pts):
                    vv = ee_entry(wp.point.end_effector_velocities, frame)
                    if vv is not None:
                        vel[t] = vv
                    wv = ee_entry(wp.weights.w_end_effector_velocities, frame)
                    if wv is not None:
                        w[t, :3], w[t, 3:] = wv[3:], wv[:3]
                refs[key] = jnp.asarray(vel)
                refs[f"w_ee_vel:{frame}"] = jnp.asarray(w)
        self._refs = refs

    def set_transform(self, object_frame: str, rot: np.ndarray, trans: np.ndarray):
        """Feed a visual-servoing vision transform (reference
        `input_transforms`, `ocp_croco_generic.py:791-796`)."""
        self._refs[f"wMo_rot:{object_frame}"] = jnp.asarray(rot, self._dtype)
        self._refs[f"wMo_trans:{object_frame}"] = jnp.asarray(trans, self._dtype)

    def update_geometry_placement(self, geom_rot: np.ndarray, geom_trans: np.ndarray):
        """Move obstacle geometries (reference `update_geometry_placement`,
        `ocp_base_croco.py:110-132`)."""
        self._refs["geom_rot"] = jnp.asarray(geom_rot, self._dtype)
        self._refs["geom_trans"] = jnp.asarray(geom_trans, self._dtype)

    # ------------------------------------------------------------------
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
