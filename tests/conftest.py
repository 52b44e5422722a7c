"""Test env: force JAX onto plain CPU.

The axon TPU plugin in this image IGNORES the JAX_PLATFORMS env var, so the
platform must be forced through jax.config before any computation.  Multi-device
sharding tests spawn a subprocess with --xla_force_host_platform_device_count=8
instead of setting it here (it slows every other compile)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
