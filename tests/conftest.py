"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (TPU tunnel); requesting cpu-only hangs
its sitecustomize, so instead of overriding the platform we keep the plugin
registered and route all test computation to the CPU backend via
jax.default_device.  Sharding tests build their Mesh from jax.devices('cpu')
explicitly (8 virtual devices via xla_force_host_platform_device_count).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import pytest  # noqa: E402

# Compiled Pallas kernels need a TPU; run them interpreted on the CPU backend.
from affnet_tpu.ops import (pallas_blur, pallas_conv,  # noqa: E402
                            pallas_detect, pallas_patches, pallas_topk,
                            patches)

pallas_blur.INTERPRET = True
pallas_conv.INTERPRET = True
pallas_detect.INTERPRET = True
pallas_patches.INTERPRET = True
pallas_topk.INTERPRET = True
# Detector tests use the XLA gather path (interpret-mode one-hot matmuls at
# full image sizes are far too slow on CPU); the Pallas sampler's equivalence
# is tested directly in tests/test_pallas_patches.py.
patches.USE_PALLAS = False


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _route_to_cpu(request):
    # TPU smoke tests (-m tpu) run on the default (real-chip) device.
    if request.node.get_closest_marker("tpu"):
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiled-kernel smoke tests; need the real chip "
        "(deselected unless -m mentions tpu)")
    config.addinivalue_line(
        "markers", "slow: full-resolution goldens (run by default; "
        "deselect with -m 'not slow' for a quick pass)")


def pytest_collection_modifyitems(config, items):
    # Keep the default suite CPU-only: tpu-marked tests run only when the
    # -m expression opts in (they compile Mosaic kernels on the real chip).
    if "tpu" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="TPU smoke test (run with -m tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def fixtures_dir():
    return os.path.join(os.path.dirname(__file__), "fixtures")
