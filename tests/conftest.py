"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA client is created with the
forced host platform; this lets multi-chip sharding tests run on CPU.
"""

import os
import sys

# Force CPU: the environment pre-registers the axon TPU plugin via
# sitecustomize, overriding JAX_PLATFORMS — every eager test op would be a
# network round-trip through the TPU tunnel. jax.config wins over the plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Numerics tests compare against torch fp32; use exact fp32 matmuls/convs
# (production TPU runs use bf16 compute deliberately).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: UNet graphs take ~1 min to compile on CPU;
# cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
