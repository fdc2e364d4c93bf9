"""Batched scenario sweep: thousands of perturbed MPC solves in parallel
(BASELINE.json config 5: "4096 perturbed-dynamics MPC scenarios").

Perturbs initial states across the batch and solves all OCPs in ONE jitted
program with the batch-native FDDP; shards over every available device.

Usage:  python examples/batch_scenarios.py [--batch 512] [--horizon 50]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.ocp.costs import build_cost_functions
    from agimus_controller_tpu.ocp.spec import (
        CostItem, ProblemSpec, default_references)
    from agimus_controller_tpu.ops import kinematics
    from agimus_controller_tpu.solver.fddp import SolverSettings
    from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp

    model, params = load_panda()
    T = args.horizon
    spec = ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="ctrl_reg", kind="control_grav", weight=1e-3),
            CostItem(name="goal", kind="frame_placement", weight=10.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="goal", kind="frame_placement", weight=100.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T, dt=0.01,
    )
    cf = build_cost_functions(model, params, spec)
    refs = default_references(spec, model)
    q0 = jnp.asarray(PANDA_Q_READY, jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(7, jnp.float32)])
    fid = model.frame_id("panda_hand_tcp")
    R0, p0 = kinematics.frame_placement(model, params, q0, fid)
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    refs["ee_rot:panda_hand_tcp"] = jnp.tile(R0[None], (T + 1, 1, 1))
    refs["ee_trans:panda_hand_tcp"] = jnp.tile(
        (p0 + jnp.asarray([0.1, 0.05, -0.05]))[None], (T + 1, 1))

    B = args.batch
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None]
        + 0.05 * np.concatenate([rng.normal(size=(B, 7)),
                                 rng.normal(size=(B, 7))], axis=1),
        jnp.float32)
    xs0 = jnp.tile(x0s[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((B, T, 7), jnp.float32)

    solve = jax.jit(make_batch_fddp(
        model, params, spec, cf, SolverSettings(max_iters=args.iters)))
    print(f"compiling batch={B} T={T} on {jax.devices()[0].device_kind}...")
    sol = solve(x0s, refs, xs0, us0)
    sol.cost.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol = solve(x0s, refs, xs0, us0)
        sol.cost.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    conv = float(jnp.mean(sol.converged.astype(jnp.float32)))
    print(f"{B} scenario solves in {t*1e3:.1f} ms -> {B/t:.0f} solves/s | "
          f"{100*conv:.0f}% converged | mean iters "
          f"{float(jnp.mean(sol.iters.astype(jnp.float32))):.1f}")


if __name__ == "__main__":
    main()
