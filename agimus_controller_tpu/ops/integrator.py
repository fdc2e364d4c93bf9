"""State-space integration: the Crocoddyl action-model equivalent.

Replaces `crocoddyl.DifferentialActionModelFreeFwdDynamics` +
`IntegratedActionModelEuler` (reference call sites: `ocp_base_croco.py:184-189`
for the delay-compensation integrate, `ocp/ocp_croco_generic.py:656-748` for
the OCP nodes, `warm_start_shift_previous_solution.py:85-109` for shift
re-integration).

The state is the vector `x = [q; v]` (nx = nq + nv); the control is the joint
torque `u`. Crocoddyl's IAM-Euler uses a *semi-implicit* Euler step:
    a      = fd(q, v, u)
    v_next = v + a * dt
    q_next = q (+) v_next * dt          (Lie-group integrate)
which is reproduced exactly here. Derivatives come from `jax.jacfwd` of the
step — at nx = 14 this is 21 forward tangents of a fully-unrolled fused
dynamics evaluation, which XLA batches cleanly across horizon x scenario dims.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..models.model import ModelParams, RobotModel
from . import dynamics


def state_integrate(model: RobotModel, x, dx):
    """x (+) dx on the state manifold (`StateMultibody.integrate`)."""
    return x + dx


def state_difference(model: RobotModel, x0, x1):
    """x1 (-) x0 tangent difference (`StateMultibody.diff`)."""
    return x1 - x0


def euler_step(model: RobotModel, params: ModelParams, x, u, dt, fext=None):
    """Semi-implicit Euler step of the free forward dynamics."""
    nq = model.nq
    q, v = x[..., :nq], x[..., nq:]
    a = dynamics.forward_dynamics(model, params, q, v, u, fext=fext)
    v_next = v + a * dt
    q_next = q + v_next * dt
    return jnp.concatenate([q_next, v_next], axis=-1)


def euler_step_with_derivatives(model: RobotModel, params: ModelParams, x, u, dt):
    """(x_next, Fx, Fu): the step plus its state/control Jacobians.

    Equivalent of `IntegratedActionModelEuler.calc` + `.calcDiff`
    (crocoddyl's analytical ABA derivatives path, SURVEY.md §2b N3) — here a
    single `jacfwd` over the fused step so XLA shares the primal work.
    """
    step = lambda xx, uu: euler_step(model, params, xx, uu, dt)
    x_next = step(x, u)
    Fx = jax.jacfwd(step, argnums=0)(x, u)
    Fu = jax.jacfwd(step, argnums=1)(x, u)
    return x_next, Fx, Fu
