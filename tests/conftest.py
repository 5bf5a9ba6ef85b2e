"""Test configuration: run the suite on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (the analogue of
the reference's `mpirun -n k` distributed tests on a laptop), and enable
float64 so operator checks can use the reference's tight f64 tolerance
(1e-12, /root/reference/numba-cpu/test_operators.py:30-33)."""

import os

# Force CPU even when the session env points JAX at a tunneled TPU
# (JAX_PLATFORMS=axon): unit tests must be hermetic and f64-capable.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
