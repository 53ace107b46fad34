"""Test config: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (a tunneled real TPU) and a
sitecustomize hook imports jax at interpreter start, so env vars alone are
captured too late — we must override through jax.config before any backend
is initialized.

Hardware pass: ``SIXDGS_TPU_TESTS=1 pytest -m tpu_hw`` keeps the ambient
(real TPU) platform and runs the ``tpu_hw``-marked kernel tests in
non-interpret mode; without the env var those tests are skipped and
everything runs on CPU.
"""

import os

HW_MODE = os.environ.get("SIXDGS_TPU_TESTS") == "1"

if not HW_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not HW_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu_hw: runs Pallas kernels non-interpret on a real TPU "
        "(enable with SIXDGS_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    skip_hw = pytest.mark.skip(reason="needs SIXDGS_TPU_TESTS=1 + real TPU")
    for item in items:
        if "tpu_hw" in item.keywords and not HW_MODE:
            item.add_marker(skip_hw)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs
