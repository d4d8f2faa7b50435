"""Test configuration: force JAX onto a virtual 8-device CPU mesh so tests are
hermetic and fast (the launch environment presets JAX_PLATFORMS=axon, which
routes everything through the real TPU tunnel — env overrides alone do not
stick, so set the config explicitly)."""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the device-candidate program unrolls 16
# pyramid levels and costs minutes to compile on CPU; cache it across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/mapper_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
