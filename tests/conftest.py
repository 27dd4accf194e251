"""Test configuration: force an 8-device virtual CPU mesh.

The reference gates GPU tests on ``numba.cuda.is_available()``
(tests/test_flash_attention.py:16-21); we instead run everything on CPU with
Pallas interpret mode and an 8-device virtual mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 "for the TPU build").
Benchmarks (bench.py) run compiled on the real chip.

NOTE: in the bench/driver environment a ``sitecustomize.py`` registers the
TPU PJRT plugin and imports jax before pytest starts, so plain
``os.environ["JAX_PLATFORMS"]`` assignment here is too late --
``jax.config.update`` is the reliable switch.
"""

import os

# XLA parses XLA_FLAGS at first backend initialisation, which has not
# happened yet even if jax is already imported.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
