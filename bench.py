"""Benchmark: batched Panda MPC solves/s on one chip at T=100.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs ~100 solves/s/robot on CPU (one CSQP solve per
10 ms tick at 100 Hz, BASELINE.md); vs_baseline = our solves/s / 100.
Config matches BASELINE.json config 1: Panda 7-DoF tracking OCP, T=100
horizon, 10 solver iters/tick budget.

Modes (env): BENCH_MODE=batch (default; batch-native component-form solver),
vmap (naive vmapped solver), or latency (small batch, associative-scan
Riccati; reports p50 per-solve latency vs the reference's 10 ms tick budget).
BENCH_BATCH, BENCH_T override sizes.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem
    from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp

    T = int(os.environ.get("BENCH_T", "100"))
    mode = os.environ.get("BENCH_MODE", "batch")
    default_b = {"batch": "4096", "latency": "8"}.get(mode, "256")
    BATCH = int(os.environ.get("BENCH_BATCH", default_b))
    dtype = jnp.float32
    settings = SolverSettings(max_iters=10)

    if mode == "latency":
        from agimus_controller_tpu.models.panda import load_panda
        from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
        from __graft_entry__ import _build_spec

        model, params = load_panda()
        spec, cf, refs, x0 = _build_spec(model, params, T, dtype)
        x0s = jnp.tile(x0[None], (BATCH, 1))
        xs0 = jnp.tile(x0[None, None], (BATCH, T + 1, 1))
        us0 = jnp.zeros((BATCH, T, 7), dtype)
        solver = jax.jit(make_batch_fddp(
            model, params, spec, cf, settings, riccati="pscan"))
        sol = solver(x0s, refs, xs0, us0)
        sol.cost.block_until_ready()
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            sol = solver(x0s, refs, xs0, us0)
            sol.cost.block_until_ready()
            lat.append(time.perf_counter() - t0)
        p50_ms = float(np.median(lat)) * 1e3
        assert bool(jnp.all(jnp.isfinite(sol.us))), "non-finite solver output"
        print(json.dumps({
            "metric": f"panda_mpc_p50_latency_ms_T{T}_B{BATCH}_1chip",
            "value": round(p50_ms, 3),
            "unit": "ms",
            "vs_baseline": round(10.0 / p50_ms, 3),
        }))
        return

    if mode == "batch":
        from agimus_controller_tpu.models.panda import load_panda
        from agimus_controller_tpu.solver.fddp_batch import make_batch_fddp
        from __graft_entry__ import _build_spec

        model, params = load_panda()
        spec, cf, refs, x0 = _build_spec(model, params, T, dtype)
        x0s = jnp.tile(x0[None], (BATCH, 1))
        xs0 = jnp.tile(x0[None, None], (BATCH, T + 1, 1))
        us0 = jnp.zeros((BATCH, T, 7), dtype)
        solver = jax.jit(make_batch_fddp(model, params, spec, cf, settings))
        run = lambda: solver(x0s, refs, xs0, us0)
    else:
        cf, x0s, refs, xs0, us0 = _build_problem(T, dtype, batch=BATCH)
        solver = jax.jit(
            jax.vmap(
                lambda x0, xs, us: solve_fddp(cf, x0, refs, xs, us, settings),
                in_axes=(0, 0, 0),
            )
        )
        run = lambda: solver(x0s, xs0, us0)

    sol = run()
    sol.cost.block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sol = run()
        sol.cost.block_until_ready()
        times.append(time.perf_counter() - t0)
    t_batch = float(np.median(times))
    solves_per_s = BATCH / t_batch

    assert bool(jnp.all(jnp.isfinite(sol.us))), "non-finite solver output"
    print(
        json.dumps(
            {
                "metric": "panda_mpc_solves_per_s_T100_1chip",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
