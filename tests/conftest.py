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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free live compiled executables between test files.

    The suite accumulates hundreds of jitted programs per xdist worker;
    letting them all stay live could deterministically segfault XLA:CPU's
    compiler late in the run (round-3: 'worker segfaulted inside an XLA
    compile in test_trainer', tests passing standalone). Clearing the
    tracing/compilation caches after each module bounds the per-process
    compiled-program population instead of relying on a serial rerun recipe.
    """
    yield
    jax.clear_caches()
