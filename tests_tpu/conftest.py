"""Real-hardware test tier (VERDICT.md round-1 weak item 1).

Unlike tests/ (which pins JAX to a fake 8-device CPU platform so the suite
runs anywhere), this directory runs the *compiled* Mosaic kernels on the
actual TPU chip and asserts oracle agreement — turning the manual
"RMSE ~3e-8 on hardware" claim into a CI artifact.

Run with:  python -m pytest tests_tpu/ -q        (skips itself off-TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pytest

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _on_tpu():
        return
    skip = pytest.mark.skip(reason="no TPU device present")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_dir():
    d = os.environ.get("RRT_ASSET_DIR", "/root/reference")
    if not os.path.isdir(d):
        pytest.skip("reference asset directory unavailable")
    return d


def rmse(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
