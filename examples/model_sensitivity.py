"""Model-sensitivity sweep demo (reference:
`agimus_controller_examples/main/model_sensibility/evaluate_model_sensibility.py`).

Perturbs every body's inertia/CoM/mass one at a time (10*nq scenarios) and
computes next-state sensitivities in ONE batched device call, then the SVD
spectrum — replacing the reference's serial python loop.

Usage:  python examples/model_sensitivity.py
"""

import numpy as np


def main():
    import jax.numpy as jnp

    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.ops import dynamics
    from agimus_controller_tpu.parallel.sensitivity import (
        next_state_sensitivity,
        sensitivity_svd,
    )

    model, params = load_panda()
    q0 = jnp.asarray(PANDA_Q_READY, jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(7, jnp.float32)])
    u0 = dynamics.generalized_gravity(model, params, q0) + 1.0  # excite

    S, labels = next_state_sensitivity(model, params, x0, u0, dt=0.01)
    _, s, _ = sensitivity_svd(S)
    print(f"{S.shape[0]} perturbation scenarios in one batched call")
    print("singular value spectrum (top 10):")
    for i, sv in enumerate(s[:10]):
        print(f"  sigma_{i} = {sv:.3e}")
    top = np.argsort(np.linalg.norm(S, axis=1))[::-1][:5]
    print("most influential parameters:")
    for i in top:
        print(f"  {labels[i]:18s} |dx+/dp| = {np.linalg.norm(S[i]):.3e}")


if __name__ == "__main__":
    main()
