"""Soft-contact (force-augmented) dynamics: the force_feedback_mpc
`DAMSoftContact{1,3}DAugmentedFwdDynamics` + `IAMSoftContactAugmented`
equivalent (SURVEY.md §2b N7; reference call sites
`ocp/ocp_croco_generic_force_feedback.py:74-215`).

The state is augmented with the contact force: x = [q; v; f] (nc = 1 or 3
enabled linear directions). The visco-elastic contact at frame `frame_id`
with anchor `oPc` gives

    tau_total = tau + J_c^T f               (f applied at the contact frame)
    a         = fd(q, v, tau_total)
    f_dot     = -Kp * v_c - Kv * a_c        (spring-damper differentiated)

where v_c / a_c are the contact-point linear velocity/acceleration expressed
in the chosen reference frame ("local" or "local_world_aligned"/"world").
Per-node contact activation is a runtime array (`contact_active`), replacing
the reference's `dam.active_contact` object mutation (`:141-155`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from . import dynamics, kinematics


@dataclasses.dataclass(frozen=True)
class SoftContactConfig:
    """Static soft-contact configuration (mirrors the reference DAM
    dataclass fields `:30-43`)."""

    frame: str
    Kp: Tuple[float, ...] = (100.0, 100.0, 100.0)
    Kv: Tuple[float, ...] = (10.0, 10.0, 10.0)
    oPc: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    enabled_directions: Tuple[bool, bool, bool] = (True, True, True)
    ref: str = "local"  # frame the force/vel are expressed in
    with_gravity_torque_reg: bool = False
    force_lb: Tuple[float, ...] = ()
    force_ub: Tuple[float, ...] = ()

    @property
    def nc(self) -> int:
        n = sum(self.enabled_directions)
        assert n in (1, 3), "Soft contact is either 1D or 3D."
        return n

    def mask_indices(self):
        return tuple(i for i, e in enumerate(self.enabled_directions) if e)


def _contact_kinematics(model: RobotModel, params: ModelParams,
                        sc: SoftContactConfig, q, v):
    """(J_lin [3,nv], v_c [3]) of the contact frame in the sc.ref frame."""
    fid = model.frame_id(sc.frame)
    ref = "local" if sc.ref == "local" else "local_world_aligned"
    J = kinematics.frame_jacobian(model, params, q, fid, ref)
    J_lin = J[3:]  # [w; v] rows -> linear block
    return J_lin, J_lin @ v


def soft_contact_dynamics(model: RobotModel, params: ModelParams,
                          sc: SoftContactConfig, x, u, active=1.0):
    """(a [nv], f_dot [nc]) of the augmented dynamics.

    ``active``: scalar 0/1 contact activation (runtime array input)."""
    nq, nv = model.nq, model.nv
    idx = jnp.asarray(sc.mask_indices())
    q, v, f = x[:nq], x[nq:nq + nv], x[nq + nv:]
    f3 = jnp.zeros(3, x.dtype).at[idx].set(f) * active
    J_lin, _ = _contact_kinematics(model, params, sc, q, v)
    tau_total = u + J_lin.T @ f3
    a = dynamics.forward_dynamics(model, params, q, v, tau_total)
    # contact-point accel in sc.ref frame: d/dt (J v) along (v, a)
    vc_of = lambda qq, vv: _contact_kinematics(model, params, sc, qq, vv)[1]
    _, vc_dot_q = jax.jvp(lambda qq: vc_of(qq, v), (q,), (v,))
    a_c = vc_dot_q + J_lin @ a
    v_c = vc_of(q, v)
    Kp = jnp.asarray(sc.Kp, x.dtype)[idx]
    Kv = jnp.asarray(sc.Kv, x.dtype)[idx]
    f_dot = active * (-Kp * v_c[idx] - Kv * a_c[idx])
    return a, f_dot


def soft_contact_step(model: RobotModel, params: ModelParams,
                      sc: SoftContactConfig, x, u, dt, active=1.0):
    """Semi-implicit Euler on the augmented state (`IAMSoftContactAugmented`
    integration)."""
    nq, nv = model.nq, model.nv
    q, v, f = x[:nq], x[nq:nq + nv], x[nq + nv:]
    a, f_dot = soft_contact_dynamics(model, params, sc, x, u, active)
    v_next = v + a * dt
    q_next = q + v_next * dt
    f_next = f + f_dot * dt
    return jnp.concatenate([q_next, v_next, f_next])


# ----------------------------------------------------------------------
# quaternion free-flyer variants (manifold state + force augmentation —
# the reference composes DAMSoftContactAugmented with a StateMultibody
# free-flyer model, `ocp_croco_generic_force_feedback.py:218-297`)
# ----------------------------------------------------------------------
def ff_soft_contact_dynamics(model: RobotModel, params: ModelParams,
                             sc: SoftContactConfig, x, u, active=1.0):
    """(a [nv], f_dot [nc]) on the free-flyer augmented state
    x = [p(3); quat(4); qj; v(nv); f(nc)].

    Dynamics are evaluated on the chart re-centered at the current base
    pose (`ops/lie.py::ff_step` convention); ``u`` is the FULL nv torque
    (already through the actuation map)."""
    from . import lie

    nv = model.nj
    nxr = (model.nj - lie.N_FF) + 7 + nv  # rigid (quaternion) ambient dim
    xr, f = x[:nxr], x[nxr:]
    p, quat, qj, v = lie.split_state(model, xr)
    pr = lie.recenter_params(model, params, p, quat)
    qc = lie.chart_q(model, qj)
    idx = jnp.asarray(sc.mask_indices())
    f3 = jnp.zeros(3, x.dtype).at[idx].set(f) * active
    J_lin, _ = _contact_kinematics(model, pr, sc, qc, v)
    tau_total = u + J_lin.T @ f3
    a = dynamics.forward_dynamics(model, pr, qc, v, tau_total)
    # contact-point accel in sc.ref frame: d/dt (J v) along (v, a); at the
    # chart center the chart velocity equals v (same assumption ff_step
    # makes for the configuration update)
    vc_of = lambda qq, vv: _contact_kinematics(model, pr, sc, qq, vv)[1]
    _, vc_dot_q = jax.jvp(lambda qq: vc_of(qq, v), (qc,), (v,))
    a_c = vc_dot_q + J_lin @ a
    v_c = vc_of(qc, v)
    Kp = jnp.asarray(sc.Kp, x.dtype)[idx]
    Kv = jnp.asarray(sc.Kv, x.dtype)[idx]
    f_dot = active * (-Kp * v_c[idx] - Kv * a_c[idx])
    return a, f_dot


def ff_soft_contact_step(model: RobotModel, params: ModelParams,
                         sc: SoftContactConfig, x, u, dt, active=1.0):
    """Semi-implicit Euler on the free-flyer augmented state: velocity and
    force integrate additively, the configuration through the singularity-
    free retraction (`lie.q_integrate`)."""
    from . import lie

    nv = model.nj
    nxr = (model.nj - lie.N_FF) + 7 + nv
    xr, f = x[:nxr], x[nxr:]
    p, quat, qj, v = lie.split_state(model, xr)
    a, f_dot = ff_soft_contact_dynamics(model, params, sc, x, u, active)
    v_new = v + dt * a
    p2, quat2, qj2 = lie.q_integrate(model, p, quat, qj, dt * v_new)
    return jnp.concatenate(
        [lie.join_state(p2, quat2, qj2, v_new), f + dt * f_dot])
