"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding is exercised without TPU hardware (the TPU-native analog of a fake
distributed backend — SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The machine's sitecustomize registers the 'axon' TPU-tunnel platform and
# re-pins jax_platforms to it, overriding the env var — pin it back to CPU
# after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end CLI smoke tests (~minutes on CPU)")
