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


def pytest_sessionstart(session):
    """Build the native host-ops extension so test_native_ops exercises the
    C++ path instead of skipping (the reference builds its native op as part
    of setup, reference ``models/ops/setup.py``). Build failures degrade to
    the previous skip behavior."""
    import pathlib
    import subprocess
    import sys

    from snipper_tpu.data import native_ops

    if native_ops.have_native():
        return
    native_dir = pathlib.Path(__file__).resolve().parent.parent / "native"
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=native_dir, check=True, capture_output=True, timeout=600)
        native_ops._ext = None  # re-probe now that the .so exists
    except Exception as e:  # toolchain absent → tests skip as before
        print(f"[conftest] native extension build failed: {e}")
