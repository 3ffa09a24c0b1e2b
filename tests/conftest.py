"""Test env: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 'Distributed tests without a pod').

Note: a sitecustomize in this image imports jax at interpreter start with
JAX_PLATFORMS=axon (a remote TPU tunnel), so env vars set here are too
late — use jax.config.update, which is honored until the first backend
initialization."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it
