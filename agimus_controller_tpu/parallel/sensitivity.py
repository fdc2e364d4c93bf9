"""Model-parameter sensitivity sweeps, batched over `ModelParams`.

Reference: the model-sensitivity study
(`agimus_controller_examples/main/model_sensibility/evaluate_model_sensibility.py:9-134`)
perturbs per-link inertia (6), CoM (3) and mass (1) one at a time and
integrates one Euler step per perturbation in a serial python loop. Because
`ModelParams` is a pytree of arrays, the same study here is ONE vmapped call
over a stacked params pytree — and composes with `vmap` over initial states
and with mesh sharding (SURVEY.md §2c: the batch axis subsumes this sweep).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import ModelParams, RobotModel
from ..ops import integrator


def perturbed_params_batch(
    params: ModelParams,
    rel_step: float = 1e-3,
    abs_step: float = 1e-6,
) -> Tuple[ModelParams, list]:
    """Stack one-at-a-time perturbations of (inertia[6], com[3], mass[1]) for
    every body: returns a ModelParams pytree with leading axis
    B = nj * 10 (+1 unperturbed row 0) and the matching labels."""
    # ModelParams leaves are host (numpy) arrays at rest; move to device once
    # so the .at[] functional updates below work uniformly.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    nj = params.mass.shape[0]
    rows = [params]
    labels = ["nominal"]
    iu = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    for j in range(nj):
        for (a, b) in iu:
            dI = params.inertia[j, a, b] * rel_step + abs_step
            inertia = params.inertia.at[j, a, b].add(dI)
            inertia = inertia.at[j, b, a].add(dI if a != b else 0.0)
            rows.append(params._replace(inertia=inertia))
            labels.append(f"body{j}_I{a}{b}")
        for axis in range(3):
            d = params.com[j, axis] * rel_step + abs_step
            rows.append(params._replace(com=params.com.at[j, axis].add(d)))
            labels.append(f"body{j}_com{axis}")
        dm = params.mass[j] * rel_step + abs_step
        rows.append(params._replace(mass=params.mass.at[j].add(dm)))
        labels.append(f"body{j}_mass")
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)
    return stacked, labels


def next_state_sensitivity(
    model: RobotModel,
    params: ModelParams,
    x0,
    u0,
    dt: float = 0.01,
    rel_step: float = 1e-3,
):
    """Finite-difference sensitivity of the next Euler state to each inertial
    parameter: returns (S [P, nx], labels) with S_p = (x+_p - x+_0)/step_p.

    One batched device call replaces the reference's 10*nq serial
    integrations (`evaluate_model_sensibility.py:97-121`)."""
    batch, labels = perturbed_params_batch(params, rel_step=rel_step)
    step = jax.jit(
        jax.vmap(lambda p: integrator.euler_step(model, p, x0, u0, dt))
    )
    xs = step(batch)
    S = (xs[1:] - xs[0][None]) / rel_step
    return np.asarray(S), labels[1:]


def sensitivity_svd(S: np.ndarray):
    """SVD spectrum of the sensitivity matrix (the reference's analysis
    output, `evaluate_model_sensibility.py:122`)."""
    U, s, Vt = np.linalg.svd(S, full_matrices=False)
    return U, s, Vt
