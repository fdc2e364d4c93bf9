"""Mesh sharding: batched solves across the 8-virtual-device CPU mesh must
match unsharded results (SURVEY.md §4 multi-chip strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_batch_fddp,
    sharded_batch_solver,
)
from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp
from tests.test_solver_fddp import goal_reaching_problem

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers


@pytest.fixture(scope="module")
def panda():
    return load_panda(dtype=np.float64)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_vmap_solver_matches(panda):
    model, params = panda
    T = 6
    spec, cf, refs = goal_reaching_problem(model, params, T=T, dt=0.02)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * np.concatenate(
        [rng.normal(size=(B, 7)), np.zeros((B, 7))], axis=1))
    xs0 = jnp.tile(x0s[:, None], (1, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))
    settings = SolverSettings(max_iters=5)

    mesh = make_mesh()
    solver = sharded_batch_solver(cf, settings, mesh)
    x0s_s, xs0_s, us0_s = shard_batch(mesh, (x0s, xs0, us0))
    sol = solver(x0s_s, refs, xs0_s, us0_s)
    # cross-check scenario 3 against a plain single solve
    ref_sol = solve_fddp(cf, x0s[3], refs, xs0[3], us0[3], settings)
    np.testing.assert_allclose(np.asarray(sol.us[3]), np.asarray(ref_sol.us),
                               atol=1e-9)


def test_sharded_batch_native_fddp(panda):
    model, params = panda
    T = 6
    spec, cf, refs = goal_reaching_problem(model, params, T=T, dt=0.02)
    q0 = jnp.asarray(PANDA_Q_READY)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    refs["xref"] = jnp.tile(x0[None], (T + 1, 1))
    B = 8
    x0s = jnp.tile(x0[None], (B, 1))
    xs0 = jnp.tile(x0[None, None], (B, T + 1, 1))
    us0 = jnp.zeros((B, T, 7))
    mesh = make_mesh()
    solver = sharded_batch_fddp(
        model, params, spec, cf, SolverSettings(max_iters=4), mesh)
    x0s, xs0, us0 = shard_batch(mesh, (x0s, xs0, us0))
    sol = solver(x0s, refs, xs0, us0)
    assert np.all(np.isfinite(np.asarray(sol.us)))
    # identical scenarios must produce identical (replicated) solutions
    np.testing.assert_allclose(np.asarray(sol.us[0]), np.asarray(sol.us[7]),
                               atol=1e-12)
