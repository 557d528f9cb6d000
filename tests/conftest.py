"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests don't require TPU hardware (SURVEY.md section 4 implication (4)), and
use a persistent compilation cache so repeated runs are fast."""
import os

# Force CPU even if the ambient environment selects a TPU platform (e.g.
# JAX_PLATFORMS=axon): the suite needs the 8-device virtual mesh, and
# setdefault would silently run single-chip on real hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
