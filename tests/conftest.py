"""Test harness config: force a virtual 8-device CPU mesh.

Must run before jax initializes its backends. Real-TPU behavior is exercised
by bench.py / the driver; unit tests validate math and sharding on CPU.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers an `axon` TPU backend and force-selects
# it via jax.config (overriding the env var), so undo that here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
