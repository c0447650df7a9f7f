import os

# 8 virtual CPU devices so sharding logic is exercised without TPU
# hardware. Must be set before jax import.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; force
# all test computation onto the host CPU backend.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Golden-parity tests compare against the reference's double-precision
# arithmetic; enable x64 so complex128 paths are real. Production TPU code
# uses complex64/f32 explicitly and is tested that way too.
jax.config.update("jax_enable_x64", True)


def cpu_devices():
    return jax.devices("cpu")
