"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the same
`shard_map`/`Mesh` code paths as a real pod slice compile and execute
without TPU hardware (SURVEY §4 implication).

The environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the real-TPU tunnel), so env-var tweaks here are too
late — the platform must be overridden through jax.config before the first
backend use.  XLA_FLAGS is still read lazily at CPU-client init, so the
virtual-device count can be set here.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
