"""Golden-file regression: pin xs/us/K of one Panda solve across refactors.

Reference pattern: `agimus_controller/tests/test_ocp_croco_base.py:175-204`
solves once and compares states / Riccati gains / feed-forward terms
element-wise against a pickled snapshot, with a commented regeneration hook.
Here the snapshot is an npz under `tests/resources/`; regenerate with

    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

after an INTENTIONAL numerical change (and say why in the commit message).
"""

import os
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers

GOLDEN = pathlib.Path(__file__).parent / "resources" / "golden_panda_T20.npz"


def _solve():
    from __graft_entry__ import _build_problem
    from agimus_controller_tpu.solver.fddp import SolverSettings, solve_fddp

    cf, x0, refs, xs0, us0 = _build_problem(20, jnp.float64)
    sol = solve_fddp(cf, x0, refs, xs0, us0, SolverSettings(max_iters=50))
    return sol


def test_golden_panda_solve():
    sol = _solve()
    assert bool(sol.converged), "golden problem must converge"
    if os.environ.get("GOLDEN_REGEN") or not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            GOLDEN,
            xs=np.asarray(sol.xs),
            us=np.asarray(sol.us),
            K=np.asarray(sol.K),
            cost=np.asarray(sol.cost),
        )
        if not os.environ.get("GOLDEN_REGEN"):
            pytest.fail(
                "golden snapshot was missing; generated it — rerun and "
                "commit tests/resources/golden_panda_T20.npz")
        return
    ref = np.load(GOLDEN)
    # float64 CPU solve: tight element-wise pins (refactors that change the
    # math must consciously regenerate)
    np.testing.assert_allclose(np.asarray(sol.xs), ref["xs"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.us), ref["us"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.K), ref["K"], atol=1e-6)
    np.testing.assert_allclose(float(sol.cost), float(ref["cost"]), rtol=1e-10)
