"""Test configuration: hermetic CPU runs with a virtual 8-device mesh.

Tests never require TPU hardware; multi-device sharding tests use the
standard JAX fake-mesh trick (XLA_FLAGS host platform device count).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers the TPU PJRT plugin and calls
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var.  Re-override here so tests are hermetic-CPU regardless.
# PCI_TPU_TESTS=1 keeps the TPU backend (for tests/test_pallas_tpu.py).
import jax  # noqa: E402

if not os.environ.get("PCI_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the suite is compile-bound (FlowNet3D and
# ISAPCInet graphs take ~30-120s each to build on CPU); caching makes
# repeat runs ~10x faster.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
