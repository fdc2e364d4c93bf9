"""OCP layer: static problem specs, cost assembly, YAML DSL compiler.

The reference mutates a Crocoddyl object graph per tick
(`ocp/ocp_croco_generic.py:855-892`); here an OCP is a *static spec* (python
dataclasses, hashable, closed over at trace time) times *runtime arrays*
(references/weights per node), so reference updates are array swaps and the
solve is one jitted function (SURVEY.md §7, guiding translation).
"""

from .spec import (
    CostItem,
    ConstraintItem,
    ProblemSpec,
    default_references,
    make_timesteps,
)
