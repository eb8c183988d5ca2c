"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

The axon TPU plugin ignores JAX_PLATFORMS, so we additionally pin
``jax_default_device`` to a host CPU device: unit tests must be hermetic and
fast, and must exercise multi-device sharding on virtual CPU devices. Real-TPU
benchmarking happens in bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:
    pass


def cpu_devices():
    return jax.devices("cpu")
