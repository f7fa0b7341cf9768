"""Test configuration: force an 8-device virtual CPU backend so sharding
tests run anywhere and numerics are deterministic (SURVEY.md section 4).

Note: the environment's sitecustomize may register a remote TPU plugin and
force ``jax_platforms``; we override it back to CPU via jax.config (env vars
alone are not enough)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: fast core subset (kernels/optim/config/ckpt) -- "
        "`pytest -m smoke` keeps the inner loop under ~2 min",
    )
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (subprocess/resume-bit-exactness/"
        "interpret-mode Pallas parity) -- EXCLUDED from the default pass "
        "by pytest.ini's `addopts = -m \"not slow\"`; run them with "
        "`pytest -m slow tests/`, or everything with `pytest -m '' tests/`",
    )
