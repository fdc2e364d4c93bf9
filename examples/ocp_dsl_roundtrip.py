"""YAML OCP DSL build/update round-trip demo (reference
`agimus_controller_examples/scripts/ocp_generic_tests.py`): parse a shipped
problem-definition YAML into the static spec, show the parsed tree, mutate a
weight the functional way (`dataclasses.replace` — the analog of the
reference's `update()` object mutation), and evaluate one stage cost before
and after to demonstrate that references/weights are runtime inputs.

Usage:  python examples/ocp_dsl_roundtrip.py [definition.yaml]
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np


def main():
    import jax.numpy as jnp

    from agimus_controller_tpu.factory.registry import DEFINITIONS_DIR
    from agimus_controller_tpu.models.panda import PANDA_Q_READY, load_panda
    from agimus_controller_tpu.ocp.costs import build_cost_functions
    from agimus_controller_tpu.ocp.spec import default_references
    from agimus_controller_tpu.ocp.yaml_compiler import load_ocp_spec

    yaml_file = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        DEFINITIONS_DIR / "ocp_goal_reaching.yaml")
    model, params = load_panda()
    T = 10
    spec = load_ocp_spec(yaml_file, model, horizon=T, dt=0.01,
                         default_ee_frame="panda_hand_tcp")

    print(f"parsed {yaml_file.name}:")
    for group, items in (("running", spec.running_costs),
                         ("terminal", spec.terminal_costs)):
        for c in items:
            print(f"  [{group}] {c.name}: kind={c.kind} weight={c.weight} "
                  f"update={c.update} activation={c.activation}")
    for c in spec.constraints:
        print(f"  [constraint] {c.name}: kind={c.kind} "
              f"lower={c.lower} upper={c.upper}")

    # round trip: spec -> dict -> spec (the as_dict demo of the reference)
    as_dict = dataclasses.asdict(spec)
    print(f"\nas_dict round-trip keys: {sorted(as_dict)[:4]} ...")

    # evaluate a stage cost, then "update" a weight — functionally: the
    # static weight via dataclasses.replace, or (the hot path) the runtime
    # weight arrays in refs, with NO recompilation
    cf = build_cost_functions(model, params, spec, dtype=jnp.float32)
    refs = default_references(spec, model, dtype=jnp.float32)
    x = jnp.concatenate([jnp.asarray(PANDA_Q_READY, jnp.float32),
                         jnp.zeros(7, jnp.float32)])
    u = jnp.zeros(7, jnp.float32)
    c0 = float(cf.stage_cost(x, u, 0, refs))

    refs2 = dict(refs)
    if "w_x" in refs2:
        refs2["w_x"] = 10.0 * refs2["w_x"]
    c1 = float(cf.stage_cost(x, u, 0, refs2))
    print(f"\nstage cost @node0: {c0:.6f} -> {c1:.6f} after scaling the "
          "streamed state weights x10 (runtime refs update, no rebuild)")

    target = next((c.name for c in spec.running_costs
                   if c.kind != "control"), spec.running_costs[0].name)
    running2 = tuple(
        dataclasses.replace(c, weight=c.weight * 2.0)
        if c.name == target else c for c in spec.running_costs)
    spec2 = dataclasses.replace(spec, running_costs=running2)
    cf2 = build_cost_functions(model, params, spec2, dtype=jnp.float32)
    c2 = float(cf2.stage_cost(x, u, 0, refs))
    print(f"static-weight rebuild ({target} x2): {c0:.6f} -> {c2:.6f}")
    assert abs(c1 - c0) > 0 or abs(c2 - c0) > 0
    print("\nround trip OK")


if __name__ == "__main__":
    main()
