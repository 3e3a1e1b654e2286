"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (SURVEY.md §4: the reference has no tests; this suite is
the framework's own test pyramid).

Note: in environments where a TPU plugin pins JAX_PLATFORMS, the env var
alone is not enough — jax.config.update after import is authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
