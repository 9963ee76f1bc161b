"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 implication (c)).

Must run before jax is imported anywhere; overrides any ambient JAX_PLATFORMS
(e.g. the axon TPU tunnel) — tests are CPU-only by design.

(No persistent compile cache: XLA:CPU AOT entries are machine-feature
sensitive and tracing, not compile, dominates test time anyway.)
"""

import os

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; jax.config.update("jax_platforms", ...) is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
