"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding/collective paths execute without TPU hardware (SURVEY.md §4).

Note: the hosted TPU platform plugin ignores the ``JAX_PLATFORMS`` env var,
so we must force CPU through ``jax.config`` before any device is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
