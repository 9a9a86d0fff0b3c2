"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (the driver benches on the real chip separately).

NOTE: this environment preloads an `axon` TPU PJRT plugin through
sitecustomize which programmatically sets jax_platforms="axon,cpu" — env vars
alone can't override it, so we force the jax config here, before any backend
is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)  # stay float32 like the TPU path
