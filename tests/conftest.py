"""Test configuration: force CPU with 8 virtual devices.

The session environment registers a TPU backend ('axon') via sitecustomize and
pins ``jax_platforms`` to it at interpreter start — env vars alone cannot
override that, so we update the jax config directly. Unit tests must run on
host CPU; the 8 virtual devices are the JAX-native "fake backend" for
multi-chip sharding logic (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
