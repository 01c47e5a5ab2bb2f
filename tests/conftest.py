"""Test configuration: run all tests on a virtual 8-device CPU platform so
multi-chip sharding is exercised without TPU hardware (SURVEY.md section 4)."""

import os

# Force CPU: the image presets JAX_PLATFORMS=axon (the TPU tunnel) and its
# sitecustomize imports jax at interpreter startup, so env edits here are too
# late for jax's flag parsing — mutate the live config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: recompiling the scan-heavy simulator/flow
# programs dominates test wall-clock on small CPU hosts.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
