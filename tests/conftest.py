"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), per the reference-rebuild test
strategy (SURVEY.md §4e). The session environment force-registers the axon
TPU backend via sitecustomize and ignores JAX_PLATFORMS, so we override
through jax.config *before any device use*."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
