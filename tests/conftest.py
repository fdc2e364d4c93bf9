"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (SURVEY.md §4: multi-host emulation via
``xla_force_host_platform_device_count``). x64 is enabled for tight numeric
validation of the kernels; production code paths stay dtype-polymorphic.
"""

import os

# Hard-force CPU: the environment's sitecustomize registers an `axon` TPU
# backend and exports JAX_PLATFORMS=axon, so setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# parallel LLVM codegen occasionally segfaults on the large solver programs
if "parallel_codegen" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU
# executable serialization hard-aborts (C++ CHECK) on some of the large
# solver programs. The cache is enabled on the TPU side only (bench.py,
# __graft_entry__.py).
