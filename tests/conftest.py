"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so all distributed behavior
(psum grad reduction, subgrouped SyncBN, all_gather negatives, queue updates)
is exercised without TPU hardware — the JAX equivalent of a fake-collective
backend, which the reference lacks entirely (SURVEY.md §4).

Must run before any `import jax` in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
