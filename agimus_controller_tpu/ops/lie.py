"""Quaternion Lie-group free-flyer state (singularity-free floating base).

The model factory's ``free_flyer=True`` realizes the floating base as a
6-single-DoF chart (3 prismatic + 3 euler-ZYX revolute,
`models/urdf.py::build_model_from_urdf`), which is exact away from the
euler singularity at pitch = ±pi/2.  This module provides the global,
singularity-free state on top of it — the reference's `StateMultibody`
free-flyer semantics (`factory/robot_model.py:17`: nq = 7 + n with a unit
quaternion, tangent dim nv = 6 + n, Lie-group integrate/difference):

    q = [p (3, world), quat (4, xyzw), q_joints (n)]          nq = n + 7
    v = [v_base (3, BODY), w_base-chart-rates (3), vq (n)]    nv = n + 6

The trick is **chart re-centering**: every dynamics/kinematics evaluation
rebuilds the 6-DoF chart *at the current base pose* (the chart's mount
placement becomes (R_base, p_base), evaluated at chart coordinates 0, where
the chart is exact and maximally far from its singularity).  The existing
engine — RNEA/CRBA/FK on the chart model — is reused unchanged; only the
mount placement in `ModelParams` changes per evaluation.  At the chart
center the chart rates coincide with the body twist (prismatic axes are
base-local; the ZYX euler-rate map is the identity at zero angles), so
velocities/accelerations need no conversion.

`integrate` is the chart retraction (exact composition of the chart step
with the base pose); `difference` is its inverse (relative pose to chart
coordinates).  Both are smooth for relative pitch < pi/2 — i.e. everywhere
that matters, since they are only applied to *local* increments, while the
global orientation lives in the quaternion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from . import dynamics as dyn

N_FF = 6  # chart dofs (tx ty tz rz ry rx, models/urdf.py ff_spec)


# ---------------------------------------------------------------------------
# quaternion utilities ([x, y, z, w], matching ops/spatial.py)
# ---------------------------------------------------------------------------

def quat_to_matrix(q):
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q)


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], a.dtype)


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], a.dtype)


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]], a.dtype)


def _euler_zyx_to_matrix(e):
    """Chart rotation Rz(e[0]) Ry(e[1]) Rx(e[2]) (ff_spec joint order)."""
    return _rot_z(e[0]) @ _rot_y(e[1]) @ _rot_x(e[2])


def _matrix_to_euler_zyx(R):
    """Inverse of `_euler_zyx_to_matrix`; valid for |pitch| < pi/2 (only
    applied to local increments)."""
    sy = -R[2, 0]
    sy = jnp.clip(sy, -1.0 + 1e-12, 1.0 - 1e-12)
    y = jnp.arcsin(sy)
    z = jnp.arctan2(R[1, 0], R[0, 0])
    x = jnp.arctan2(R[2, 1], R[2, 2])
    return jnp.stack([z, y, x])


def so3_exp(w):
    """Rodrigues: exp([w]x). Stable series coefficients near |w| = 0."""
    th2 = w @ w
    th = jnp.sqrt(th2 + 1e-300)
    small = th2 < 1e-12
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    W = jnp.array([[0.0, -w[2], w[1]],
                   [w[2], 0.0, -w[0]],
                   [-w[1], w[0], 0.0]], w.dtype)
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def so3_log(R):
    """Rotation-vector log of R, |log| <= pi — valid up to angle pi (the
    reference's `StateMultibody.diff` SO(3) log; replaces the euler-ZYX
    chart whose pitch clip silently aliased relative pitch >= pi/2).

    Computed through the quaternion with the atan2 form, which is stable at
    both ends of the angle range."""
    q = matrix_to_quat(R)
    q = jnp.where(q[3] < 0, -q, q)  # shortest arc (double cover)
    s2 = q[:3] @ q[:3]
    s = jnp.sqrt(s2 + 1e-300)  # smooth |q_xyz| (no NaN gradient at 0)
    angle = 2.0 * jnp.arctan2(s, q[3])
    # factor = angle / sin(angle/2); series 2/q_w (1 - s^2/(3 q_w^2)) at 0
    qw = jnp.maximum(q[3], 1e-12)
    factor = jnp.where(s2 < 1e-18,
                       2.0 / qw * (1.0 - s2 / (3.0 * qw * qw)),
                       angle / s)
    return factor * q[:3]


def matrix_to_quat(R):
    """Branch-free rotation matrix -> unit quaternion [x, y, z, w]."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    cands = jnp.stack([
        jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12]),
        jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20]),
        jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01]),
        jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr]),
    ])
    scores = jnp.stack([m00, m11, m22, tr])
    best = jnp.argmax(scores)
    q = cands[best]
    return q / jnp.linalg.norm(q)


# ---------------------------------------------------------------------------
# free-flyer state
# ---------------------------------------------------------------------------

def ff_dims(model: RobotModel):
    """(nq, nv, nx_global) of the quaternion free-flyer state for a chart
    model (model.nj includes the 6 chart dofs)."""
    n = model.nj - N_FF
    return n + 7, model.nj, n + 7 + model.nj


def split_state(model: RobotModel, x):
    """x [nq+nv] -> (p, quat, qj, v)."""
    n = model.nj - N_FF
    return x[:3], x[3:7], x[7:7 + n], x[7 + n:]


def join_state(p, quat, qj, v):
    return jnp.concatenate([p, quat, qj, v])


def recenter_params(model: RobotModel, params: ModelParams, p, quat):
    """Chart params with the mount placement set to the base pose."""
    R = quat_to_matrix(quat)
    jr = jnp.asarray(params.joint_rot)
    jt = jnp.asarray(params.joint_trans)
    return params._replace(
        joint_rot=jr.at[0].set(R.astype(jr.dtype)),
        joint_trans=jt.at[0].set(p.astype(jt.dtype)),
    )


def chart_q(model: RobotModel, qj):
    """Chart configuration at the re-centered base: zeros for the 6 chart
    dofs, then the joint angles."""
    return jnp.concatenate([jnp.zeros((N_FF,), qj.dtype), qj])


def q_integrate(model: RobotModel, p, quat, qj, dq):
    """Retract a tangent increment dq [nv] onto the global configuration:
    R3xSO(3) direct-product retraction with body-frame coordinates —
    translation steps in the base frame, rotation through the SO(3) exp
    (smooth for ANY increment; the euler chart retraction it replaces
    aliased at relative pitch pi/2)."""
    R = quat_to_matrix(quat)
    p_new = p + R @ dq[:3]
    # chart angular coords are (z, y, x)-ordered (ff_spec joint order); at
    # the chart center they equal the body angular velocity components
    # (wz, wy, wx) — reorder for the exp map
    R_new = R @ so3_exp(dq[3:6][::-1])
    return p_new, quat_normalize(matrix_to_quat(R_new)), qj + dq[N_FF:]


def state_integrate(model: RobotModel):
    def integrate(x, dx):
        n = model.nj - N_FF
        p, quat, qj, v = split_state(model, x)
        p2, quat2, qj2 = q_integrate(model, p, quat, qj, dx[:model.nj])
        return join_state(p2, quat2, qj2, v + dx[model.nj:])
    return integrate


def state_difference(model: RobotModel):
    def difference(x1, x0):
        p1, quat1, qj1, v1 = split_state(model, x1)
        p0, quat0, qj0, v0 = split_state(model, x0)
        R0 = quat_to_matrix(quat0)
        R1 = quat_to_matrix(quat1)
        dp = R0.T @ (p1 - p0)
        # SO(3) log (valid up to angle pi — no pitch aliasing), reordered
        # into the chart's (z, y, x) angular coordinates
        de = so3_log(R0.T @ R1)[::-1]
        return jnp.concatenate([dp, de, qj1 - qj0, v1 - v0])
    return difference


def ff_step(model: RobotModel, params: ModelParams, x, u, dt):
    """Semi-implicit Euler on the quaternion free-flyer state.

    Dynamics are evaluated on the chart re-centered at the current base
    pose (exact, singularity-free); the configuration update is the chart
    retraction `q_integrate` with the updated velocity.
    """
    p, quat, qj, v = split_state(model, x)
    pr = recenter_params(model, params, p, quat)
    q_c = chart_q(model, qj)
    a = dyn.forward_dynamics(model, pr, q_c, v, u)
    v_new = v + dt * a
    p2, quat2, qj2 = q_integrate(model, p, quat, qj, dt * v_new)
    return join_state(p2, quat2, qj2, v_new)


def ff_frame_placement(model: RobotModel, params: ModelParams, x, frame_id):
    """World placement of an operational frame at a free-flyer state."""
    from . import kinematics

    p, quat, qj, _ = split_state(model, x)
    pr = recenter_params(model, params, p, quat)
    return kinematics.frame_placement(model, pr, chart_q(model, qj), frame_id)
