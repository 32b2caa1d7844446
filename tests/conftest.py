"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (sitecustomize) pre-registers itself and sets
# jax_platforms to "axon,cpu"; env vars alone don't undo that, the config
# update does. Tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# CPU XLA lowers f32 matmuls to a fast ~bf16 path by default; tests compare
# against float64/torch references, so force exact f32.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: repeated test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
