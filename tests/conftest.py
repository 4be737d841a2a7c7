"""Test harness config.

Tests run on CPU with 8 virtual devices so sharding/mesh logic is exercised
without TPU hardware (SURVEY.md §4 takeaway; the driver separately dry-runs
the multi-chip path).  Env vars must be set before jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU: the harness's sitecustomize registers the 'axon' TPU plugin and
# pins jax_platforms=axon programmatically (env vars alone cannot override
# it), so unit tests must repin via jax.config BEFORE any backend
# initializes.  Set RETTO_TEST_TPU=1 to run the suite on the real chip.
if not os.environ.get("RETTO_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: per-op compiles on this CPU cost seconds;
# the cache makes re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
