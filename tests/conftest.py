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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the solver programs are large; repeated test
# runs (and driver re-runs) hit the disk cache instead of recompiling
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
