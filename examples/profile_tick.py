"""Per-stage DEVICE-time profile of the B=1, T=100 SQP tick on the chip.

The axon tunnel adds ~ms-scale per-dispatch overhead, so timing repeated
host-side calls measures the tunnel, not the device (r04's scan-unroll
non-result came from exactly that). Every measurement here wraps its
candidate in an ON-DEVICE `lax.fori_loop` of R repetitions with a data
dependency through the carry: one dispatch, one sync, device time =
(total - overhead) / R.

Run on the TPU: python examples/profile_tick.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from __graft_entry__ import _build_spec
from agimus_controller_tpu.models.panda import load_panda
from agimus_controller_tpu.solver.csqp import CSQPSettings
from agimus_controller_tpu.solver.sqp_batch import make_batch_sqp

T = int(os.environ.get("PROF_T", "100"))
B = int(os.environ.get("PROF_B", "1"))
R = int(os.environ.get("PROF_R", "50"))
dtype = jnp.float32


def timed_loop(name, make_loop):
    """make_loop() -> jitted zero-arg fn running R reps on device."""
    fn = make_loop()
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    print(f"{name:44s} {total / R * 1e3:8.3f} ms/rep  ({total:.3f} s/{R})")


def main():
    model, params = load_panda()
    spec, cf, refs, x0 = _build_spec(model, params, T, dtype)
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7), dtype)

    # --- full solver, fixed iteration counts, chained on device -------
    for iters in (1, 2):
        st = CSQPSettings(max_iters=iters, termination_tolerance=0.0,
                          reg_init=1e-7)
        solver = make_batch_sqp(model, params, spec, cf, st)

        def make_loop(solver=solver):
            def body(i, carry):
                xs, us = carry
                sol = solver(x0s, refs, xs, us)
                return (sol.xs, sol.us)

            return jax.jit(
                lambda: jax.lax.fori_loop(0, R, body, (xs0, us0))[1])

        timed_loop(f"full sqp solve, {iters} iter (device)", make_loop)

    # --- stage derivatives: pallas fused node kernel ------------------
    from agimus_controller_tpu.ops.pallas_costs import make_pallas_stage

    stage_dk = make_pallas_stage(model, params, spec, derivs=True)
    x_flat = jnp.tile(x0[None], (T * B, 1))
    u_flat = jnp.zeros((T * B, 7), dtype)
    dts = jnp.full((T * B,), 0.01, dtype)
    t_idx = jnp.tile(jnp.arange(T, dtype=jnp.int32), B)

    if stage_dk is not None:
        def make_loop():
            def body(i, x):
                out = stage_dk(x, u_flat, dts, t_idx, refs)
                return x + 0.0 * out[0]

            return jax.jit(lambda: jax.lax.fori_loop(0, R, body, x_flat))

        timed_loop("stage derivs pallas (T*B nodes, device)", make_loop)

        stage_vk = make_pallas_stage(model, params, spec, derivs=False)

        def make_loop():
            def body(i, x):
                xn, l = stage_vk(x, u_flat, dts, t_idx, refs)
                return x + 0.0 * xn

            return jax.jit(lambda: jax.lax.fori_loop(0, R, body, x_flat))

        timed_loop("stage values pallas (line-search trial)", make_loop)

    # --- the Riccati factor scan shape (B-minor lanes layout) ---------
    nx, nu = 14, 7
    rng = np.random.default_rng(0)
    Fx_t = jnp.asarray(rng.normal(0, 0.1, (T, nx, nx, B)), dtype)
    Fu_t = jnp.asarray(rng.normal(0, 0.1, (T, nx, nu, B)), dtype)
    lxx_t = jnp.asarray(
        np.tile(np.eye(nx)[None, :, :, None], (T, 1, 1, B)), dtype)

    from agimus_controller_tpu.solver.riccati_components import (
        _chol_lanes,
        _chol_solve_lanes,
        _mm,
        _mm_T1,
    )

    def factor_scan(Fx_t, Fu_t, lxx_t, seed):
        eye_u = jnp.eye(nu, dtype=dtype)[:, :, None]

        def body(Vxx, inp):
            lxxn, Fxn, Fun = inp
            M = _mm(Vxx, Fxn)
            N = _mm(Vxx, Fun)
            Qxx = lxxn + _mm_T1(Fxn, M)
            Qux = _mm_T1(Fun, M)
            Quu = _mm_T1(Fun, N) + 1e-2 * eye_u
            Lr = _chol_lanes(Quu, nu)
            KK = _chol_solve_lanes(Lr, Qux, nu)
            QK = _mm_T1(Qux, KK)
            Vxx2 = Qxx - 0.5 * (QK + jnp.swapaxes(QK, 0, 1))
            return Vxx2, KK[0][0]

        vT = lxx_t[0] + seed
        out, _ = jax.lax.scan(body, vT, (lxx_t, Fx_t, Fu_t), reverse=True)
        return out

    def make_loop():
        def body(i, acc):
            return factor_scan(Fx_t, Fu_t, lxx_t, 0.0 * acc[0, 0]) * 0.0 + acc

        return jax.jit(
            lambda: jax.lax.fori_loop(0, R, body, lxx_t[0] * 0.0))

    timed_loop(f"riccati factor scan T={T} (device)", make_loop)

    # --- line-search trial: one cost_and_gaps-shaped evaluation -------
    # (already covered by 'stage values' above; the full solver deltas
    # bound the remaining glue)


if __name__ == "__main__":
    main()
