"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 implication (c)).

Must run before jax is imported anywhere; overrides any ambient JAX_PLATFORMS
(e.g. the axon TPU tunnel) — tests are CPU-only by design.

A persistent XLA compilation cache under .jax_cache/ makes repeated test runs
fast (HRNet's ~900-conv graph costs minutes to compile on CPU the first time).
"""

import os

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; jax.config.update("jax_platforms", ...) is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
