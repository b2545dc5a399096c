"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so all distributed behavior
(psum grad reduction, subgrouped SyncBN, all_gather negatives, queue updates)
is exercised without TPU hardware — the JAX equivalent of a fake-collective
backend, which the reference lacks entirely (SURVEY.md §4).

NOTE: this environment bakes ``JAX_PLATFORMS=axon`` (a real TPU tunnel) into
the interpreter via sitecustomize, and jax may already be imported by the
time conftest runs — so we must both overwrite the env var *and* update the
live jax config, before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: XLA-CPU 3D-conv compiles dominate suite time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.device_count() == 8, (
    f"tests need the 8-device CPU mesh, got {jax.devices()}"
)
