"""Scenario batching + device-mesh distribution (SURVEY.md §2c).

The reference is a single-process single-robot controller; the batch axis
over scenarios (perturbed initial states, model parameters, weight
schedules) is this engine's primary parallel dimension — `vmap` on one chip,
`shard_map`/NamedSharding over a `jax.sharding.Mesh` across chips/hosts."""

from .distributed import (
    DistributedConfig,
    host_local_to_global,
    initialize_distributed,
    make_global_mesh,
)
from .mesh import batch_solve, make_batch_solver, make_mesh, sharded_batch_solver
