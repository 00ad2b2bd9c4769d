import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver's bench runs on the real chip).  The
# container's sitecustomize forces JAX_PLATFORMS=axon (a tunneled remote
# TPU with multi-second host<->device latency) — override it before jax
# initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# sitecustomize imports jax at interpreter start, so the env var above may be
# read too late — force the platform through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE = "/root/reference"
