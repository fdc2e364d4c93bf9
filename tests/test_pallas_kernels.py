"""Pallas fused-kernel math vs the XLA component-form paths.

The pallas kernel BODIES (`dynamics_terms`, `_item_terms_c`) are pure jnp
component functions — on CPU we validate their math directly against
`make_batched_step_with_derivs` / `make_batched_cost_pack` without the
pallas runtime (interpret mode is ~1000x too slow for these op counts).
The full `pallas_call` plumbing (layouts, grids, ref gathering) is
validated on TPU by `test_pallas_call_on_tpu`, and end-to-end by the
latency bench + __graft_entry__ compile check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
from agimus_controller_tpu.ocp.costs import build_cost_functions
from agimus_controller_tpu.ocp.spec import (
    CostItem,
    ProblemSpec,
    default_references,
)
from agimus_controller_tpu.ops.batched_costs import make_batched_cost_pack
from agimus_controller_tpu.ops.batched_dynamics import (
    _StaticModel,
    make_batched_step_with_derivs,
)
from agimus_controller_tpu.ops.pallas_costs import (
    _item_terms_c,
    _ref_layout,
    _slice_layout,
    gather_node_refs,
    make_pallas_stage,
    make_pallas_terminal,
)
from agimus_controller_tpu.ops.pallas_dynamics import dynamics_terms
from tests.test_robot_models import ENV_URDF

pytestmark = pytest.mark.slow  # heavy XLA solver compiles; see pyproject tiers

LANES = 16  # small tile width for CPU math checks


@pytest.fixture(scope="module")
def panda_env():
    return load_panda(
        env_urdf=ENV_URDF,
        collision_pairs=[("panda_link7_capsule", "obstacle_sphere")],
        dtype=np.float32,
    )


def _spec(model, T=4):
    return ProblemSpec(
        running_costs=(
            CostItem(name="state_reg", kind="state", weight=0.1, update=True),
            CostItem(name="ctrl", kind="control", weight=1e-2, update=True),
            CostItem(name="grav", kind="control_grav", weight=1e-3,
                     act_weights=(1.0,) * 7),
            CostItem(name="goal", kind="frame_placement", weight=10.0,
                     update=True, frame="panda_hand_tcp"),
            CostItem(name="coll", kind="collision_distance", weight=2.0,
                     update=True, pair_id=0, activation="quad_exp",
                     act_alpha=1e-2),
        ),
        terminal_costs=(
            CostItem(name="state_reg", kind="state", weight=0.2, update=True),
            CostItem(name="goal", kind="frame_placement", weight=50.0,
                     update=True, frame="panda_hand_tcp"),
        ),
        horizon=T,
        dt=0.02,
    )


def _randomized_refs(spec, model, rng, T):
    refs = default_references(spec, model, dtype=jnp.float32)
    Tn = T + 1
    refs["xref"] = jnp.asarray(rng.normal(size=(Tn, 14)) * 0.2, jnp.float32)
    refs["w_x"] = jnp.asarray(rng.uniform(0.1, 2.0, (Tn, 14)), jnp.float32)
    refs["uref"] = jnp.asarray(rng.normal(size=(Tn, 7)), jnp.float32)
    refs["w_u"] = jnp.asarray(rng.uniform(0.1, 2.0, (Tn, 7)), jnp.float32)
    refs["w_coll"] = jnp.asarray(rng.uniform(0.5, 1.5, (Tn,)), jnp.float32)
    refs["ee_trans:panda_hand_tcp"] = jnp.asarray(
        rng.normal(size=(Tn, 3)) * 0.3 + np.asarray([0.4, 0.0, 0.4]),
        jnp.float32)
    return refs


def test_dynamics_terms_component_math(panda_env):
    """dynamics_terms on (1, L) component tiles == the XLA derivs path."""
    model, params = panda_env
    sm = _StaticModel(model, params)
    rng = np.random.default_rng(0)
    N = LANES
    x = rng.normal(size=(N, 14)).astype(np.float32) * 0.3
    u = rng.normal(size=(N, 7)).astype(np.float32) * 2.0
    dt = np.full((N,), 0.01, np.float32)

    q = [jnp.asarray(x.T[i][None]) for i in range(7)]
    v = [jnp.asarray(x.T[7 + i][None]) for i in range(7)]
    uc = [jnp.asarray(u.T[i][None]) for i in range(7)]
    dtc = jnp.asarray(dt[None])
    xnext, fx, fu = dynamics_terms(sm, q, v, uc, dtc, with_derivs=True)

    step_d = make_batched_step_with_derivs(model, params)
    xn_r, Fx_r, Fu_r = step_d(jnp.asarray(x), jnp.asarray(u), jnp.asarray(dt))
    xn_p = np.stack([np.asarray(c)[0] for c in xnext], 1)
    np.testing.assert_allclose(xn_p, np.asarray(xn_r), atol=2e-5)
    fx_p = np.stack([np.asarray(c * jnp.ones((1, N)))[0] for c in fx], 1)
    np.testing.assert_allclose(
        fx_p.reshape(N, 14, 14), np.asarray(Fx_r), atol=2e-4)
    fu_p = np.stack([np.asarray(c * jnp.ones((1, N)))[0] for c in fu], 1)
    np.testing.assert_allclose(
        fu_p.reshape(N, 14, 7), np.asarray(Fu_r), atol=2e-5)


def test_cost_terms_component_math(panda_env):
    """_item_terms_c accumulation == the XLA cost pack (per node)."""
    model, params = panda_env
    sm = _StaticModel(model, params)
    T = 4
    spec = _spec(model, T)
    rng = np.random.default_rng(1)
    refs = _randomized_refs(spec, model, rng, T)

    N = LANES
    x = (np.concatenate([np.tile(PANDA_Q_READY, (N, 1)), np.zeros((N, 7))], 1)
         + rng.normal(size=(N, 14)) * 0.1).astype(np.float32)
    u = rng.normal(size=(N, 7)).astype(np.float32) * 2.0
    t_idx = jnp.asarray(rng.integers(0, T, size=(N,)), jnp.int32)

    items = tuple(i for i in spec.running_costs if i.active)
    layout = _ref_layout(spec, model, items)
    offsets, total = _slice_layout(layout)
    from agimus_controller_tpu.ops.pallas_costs import _with_geom_defaults
    refs_rows = gather_node_refs(
        layout, _with_geom_defaults(layout, refs, params, jnp.float32),
        t_idx, N, jnp.float32)

    def rget(key, default="raise"):
        if key not in offsets:
            if default == "raise":
                raise KeyError(key)
            return default
        off, ncomp = offsets[key]
        return [refs_rows[off + i][None] for i in range(ncomp)]

    q = [jnp.asarray(x.T[i][None]) for i in range(7)]
    v = [jnp.asarray(x.T[7 + i][None]) for i in range(7)]
    uc = [jnp.asarray(u.T[i][None]) for i in range(7)]
    zero = jnp.zeros_like(q[0])
    acc = {"l": 0.0, "lx": [None] * 14, "lu": [None] * 7,
           "lxx": [None] * 196, "lxu": [None] * 98, "luu": [None] * 49}
    for item in items:
        wgt = float(item.weight)
        if item.kind == "collision_distance" and item.update:
            wgt = wgt * rget("w_coll")[0]
        _item_terms_c(item, model, params, sm, q, v, uc, rget, True, wgt, acc)

    pack, _, _, _ = make_batched_cost_pack(model, params, spec)
    # reference pack per node (vmap over per-node t); dt-scaled there,
    # unscaled in acc -> compare after removing the dt factor
    dts = np.asarray(spec.timesteps(), np.float32)[np.asarray(t_idx)]
    l_r, lx_r, lu_r, lxx_r, lxu_r, luu_r = jax.vmap(
        lambda xx, uu, t: jax.tree_util.tree_map(
            lambda a: a[0], pack(xx[None], uu[None], t, refs))
    )(jnp.asarray(x), jnp.asarray(u), t_idx)

    def as_rows(lst, shape):
        full = [c if c is not None else zero for c in lst]
        arr = np.stack([np.asarray(c * jnp.ones((1, N)))[0] for c in full], 1)
        return arr.reshape((N,) + shape)

    np.testing.assert_allclose(
        np.asarray(acc["l"] * jnp.ones((1, N)))[0] * dts, np.asarray(l_r),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        as_rows(acc["lx"], (14,)) * dts[:, None], np.asarray(lx_r),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        as_rows(acc["lu"], (7,)) * dts[:, None], np.asarray(lu_r),
        rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        as_rows(acc["lxx"], (14, 14)) * dts[:, None, None],
        np.asarray(lxx_r), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        as_rows(acc["lxu"], (14, 7)) * dts[:, None, None],
        np.asarray(lxu_r), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        as_rows(acc["luu"], (7, 7)) * dts[:, None, None],
        np.asarray(luu_r), rtol=1e-3, atol=2e-5)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas_call runs on TPU; math tested above")
def test_pallas_call_on_tpu(panda_env):
    model, params = panda_env
    T, B = 4, 3
    spec = _spec(model, T)
    rng = np.random.default_rng(2)
    refs = _randomized_refs(spec, model, rng, T)
    N = T * B
    x = jnp.asarray(
        np.concatenate([np.tile(PANDA_Q_READY, (N, 1)), np.zeros((N, 7))], 1)
        + rng.normal(size=(N, 14)) * 0.1, jnp.float32)
    u = jnp.asarray(rng.normal(size=(N, 7)) * 2.0, jnp.float32)
    dts = jnp.repeat(jnp.asarray(spec.timesteps(), jnp.float32), B)
    t_idx = jnp.repeat(jnp.arange(T, dtype=jnp.int32), B)

    stage = make_pallas_stage(model, params, spec, derivs=True)
    xn_p, Fx_p, Fu_p, l_p, lx_p, *_ = stage(x, u, dts, t_idx, refs)
    step_d = make_batched_step_with_derivs(model, params)
    xn_r, Fx_r, Fu_r = step_d(x, u, dts)
    np.testing.assert_allclose(np.asarray(xn_p), np.asarray(xn_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Fx_p), np.asarray(Fx_r), atol=2e-4)

    pack, term_pack, _, _ = make_batched_cost_pack(model, params, spec)
    xs_tb = x.reshape(T, B, 14)
    us_tb = u.reshape(T, B, 7)
    l_r = jax.vmap(lambda xx, uu, t: pack(xx, uu, t, refs)[0])(
        xs_tb, us_tb, jnp.arange(T))
    np.testing.assert_allclose(
        np.asarray(l_p.reshape(T, B)), np.asarray(l_r), rtol=2e-4, atol=1e-6)

    term = make_pallas_terminal(model, params, spec, derivs=True)
    l_t, lx_t, lxx_t = term(x[:B], refs)
    l_tr, lx_tr, lxx_tr = term_pack(x[:B], refs)
    np.testing.assert_allclose(np.asarray(l_t), np.asarray(l_tr),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lxx_t), np.asarray(lxx_tr),
                               rtol=1e-3, atol=5e-4)
