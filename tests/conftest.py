"""Test harness config (SURVEY.md §4.5).

Tests run on CPU with 8 forced virtual devices so the chain-sharded
multi-device paths are exercised without TPU hardware. The CPU forcing must
happen before any jax backend initialization; ``jax.config.update`` is used
because this image's axon TPU plugin overrides the JAX_PLATFORMS env var.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
