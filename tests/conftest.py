"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled so solver parity tests are not precision-limited.

Mirrors SURVEY.md §4: multi-host BA is tested without a cluster via
``xla_force_host_platform_device_count=8``.

Note: this environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS=axon pointing at a tunneled TPU, so platform selection must go
through jax.config, not environment variables.  Set AR_SLAM_TEST_TPU=1 to run
the suite against the real chip instead (float32, no virtual mesh).
"""

import os

import jax
import pytest

if not os.environ.get("AR_SLAM_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the full ~30 min suite; CI does)")


def pytest_collection_modifyitems(config, items):
    """Keep the default run under ~10 min on a small box: the heaviest
    integration tests (multihost, stream e2e, oracle recall stress, ...)
    are @pytest.mark.slow and need --runslow or AR_SLAM_SLOW=1."""
    if os.environ.get("AR_SLAM_TEST_TPU"):
        # the chip is f32: tests that pin math against an f64 oracle at
        # 1e-8..1e-15 tolerances are CPU-only by design (the chip run's
        # value is the f32/bf16-sensitive behavior: detection parity, LM
        # recovery, localize, incremental — those carry dtype-aware bounds)
        skip_f64 = pytest.mark.skip(
            reason="f64-precision oracle test: CPU-only by design")
        for item in items:
            if "f64_oracle" in item.keywords:
                item.add_marker(skip_f64)
    if config.getoption("--runslow") or os.environ.get("AR_SLAM_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow or AR_SLAM_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
