"""Test env: force XLA CPU with 8 virtual devices so sharding tests run
without a TPU pod (SURVEY.md §4 'multi-host tests runnable without a real
pod').

This environment's sitecustomize imports jax at interpreter start and
registers the remote 'axon' TPU backend (JAX_PLATFORMS=axon in the env),
so plain env-var overrides are too late — we must go through
jax.config.update before any backend initialization.  TPU execution is
exercised separately by bench.py and __graft_entry__.entry().
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
