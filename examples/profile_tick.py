"""Per-stage device-time profile of the B=1, T=100 SQP tick on the chip.

Times the sub-programs of one SQP iteration separately (each jitted and
chained K times with one final host read, the tunnel-proof protocol of
bench.py): stage derivatives, Riccati factorization, vector sweep, line-
search trial, and the full solver at 1 and 2 iterations. The deltas say
where the ~4.3 ms/iteration actually goes (VERDICT r04 #3: is it the
scan-step overhead the Pallas fusion would remove?).

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
K = int(os.environ.get("PROF_K", "100"))
dtype = jnp.float32


def timed(name, fn, *args, chain_on=None):
    """Compile, then run K times chained on a data dependency; one host
    read at the end (ready events through the tunnel fire at enqueue)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(K):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        acc = leaf if acc is None else acc + 0 * jnp.sum(leaf)
    float(np.asarray(jnp.sum(acc)))
    dt_ms = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:38s} {dt_ms:8.3f} ms")
    return dt_ms


def main():
    model, params = load_panda()
    spec, cf, refs, x0 = _build_spec(model, params, T, dtype)
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7), dtype)

    from agimus_controller_tpu.ops.batched_dynamics import (
        make_batched_step_with_derivs,
    )
    from agimus_controller_tpu.ops.pallas_costs import make_pallas_stage

    # --- full solver at fixed iteration counts ------------------------
    for iters in (1, 2, 3):
        st = CSQPSettings(max_iters=iters, termination_tolerance=0.0,
                          reg_init=1e-7)
        solver = jax.jit(make_batch_sqp(model, params, spec, cf, st))
        timed(f"full sqp solve, {iters} iter", solver, x0s, refs, xs0, us0)

    # --- stage derivatives (the pallas fused node kernel) -------------
    stage_dk = make_pallas_stage(model, params, spec, derivs=True)
    if stage_dk is not None:
        x_flat = jnp.tile(x0[None], (T * B, 1))
        u_flat = jnp.zeros((T * B, 7), dtype)
        dts = jnp.full((T * B,), 0.01, dtype)
        t_idx = jnp.tile(jnp.arange(T, dtype=jnp.int32), B)
        f = jax.jit(lambda x, u, d, t: stage_dk(x, u, d, t, refs))
        timed("stage derivs (pallas, T*B nodes)", f, x_flat, u_flat,
              dts, t_idx)

    step_d = make_batched_step_with_derivs(model, params,
                                           deriv_mode="analytic")
    x_flat = jnp.tile(x0[None], (T * B, 1))
    u_flat = jnp.zeros((T * B, 7), dtype)
    f = jax.jit(lambda x, u: step_d(x, u, 0.01))
    timed("step derivs (analytic, T*B nodes)", f, x_flat, u_flat)

    # --- an isolated T-step scan of the factor-shaped body ------------
    nx, nu = 14, 7
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(0, 0.1, (T, nx, nx, B)), dtype)
    Bm = jnp.asarray(rng.normal(0, 0.1, (T, nx, nu, B)), dtype)
    H = jnp.asarray(
        np.tile(np.eye(nx)[None, :, :, None], (T, 1, 1, B)), dtype)

    def scan_body(Vxx, inp):
        Fx, Fu, lxx = inp
        M = jnp.einsum("ijb,jkb->ikb", Vxx, Fx)
        Qxx = lxx + jnp.einsum("jib,jkb->ikb", Fx, M)
        N = jnp.einsum("ijb,jkb->ikb", Vxx, Fu)
        Quu = jnp.einsum("jib,jkb->ikb", Fu, N) + jnp.eye(
            nu, dtype=dtype)[:, :, None]
        # stand-in for the cholesky solve: one more matmul of same shape
        K_ = jnp.einsum("ijb,jkb->ikb", Quu, jnp.swapaxes(Bm[0], 0, 1)[:nu, :nx])
        Vxx2 = Qxx - jnp.einsum("jib,jkb->ikb", K_, M[:nu])
        return 0.5 * (Vxx2 + jnp.swapaxes(Vxx2, 0, 1)), K_

    def scan_only(A, Bm, H):
        _, Ks = jax.lax.scan(scan_body, H[0], (A, Bm, H), reverse=True)
        return Ks

    timed(f"bare T={T} scan of factor-shaped body",
          jax.jit(scan_only), A, Bm, H)

    # the same math with the T axis unrolled into one batched einsum
    # (no sequential dependency — a lower bound on the pure FLOP cost)
    def flop_floor(A, Bm, H):
        M = jnp.einsum("tijb,tjkb->tikb", H, A)
        N = jnp.einsum("tijb,tjkb->tikb", H, Bm)
        return jnp.einsum("tjib,tjkb->tikb", A, M), N

    timed("same FLOPs, batched over T (floor)", jax.jit(flop_floor),
          A, Bm, H)


if __name__ == "__main__":
    main()
