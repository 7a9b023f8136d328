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

if not os.environ.get("AR_SLAM_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
