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
# the persistent-cache AOT loader logs a benign machine-feature-string
# mismatch per hit (prefer-no-scatter/gather pseudo-features); real
# failures still surface as Python exceptions
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite is compile-dominated on the
# single-core CI host (~14 min cold), and re-running it is exactly what
# the gate exists for — cached re-runs skip every big compile.  The
# cache keys on HLO + compile options + jax version, so staleness
# cannot produce wrong numbers, only a recompile.
_cache = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
# env vars too, so the demo-CLI subprocess tests inherit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
