"""Test harness config: force an 8-device virtual CPU platform.

Tests never require the real TPU; sharding tests use the standard JAX trick
of faking an 8-chip mesh on CPU (SURVEY.md 4, "multi-chip without a
cluster"). Must run before jax initializes, hence the env mutation at import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; pin the platform back to host CPU (tests must
# never depend on the one real TPU chip, and the sharding tests need the 8
# fake CPU devices forced above).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the integrator's unrolled wavefront takes
# ~2 min to compile cold on XLA:CPU; cached reruns take seconds.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from refraction_tpu.config import RenderConfig  # noqa: E402
from refraction_tpu.io.primitives import (  # noqa: E402
    make_cube,
    make_gradient_envmap,
    make_icosphere,
)
from refraction_tpu.scene import build_scene  # noqa: E402


@pytest.fixture(scope="session")
def cube_scene():
    scene, meta = build_scene(make_cube(2.0), make_gradient_envmap(), cluster_size=8)
    return scene, meta


@pytest.fixture(scope="session")
def sphere_scene():
    scene, meta = build_scene(
        make_icosphere(subdiv=2, radius=1.2), make_gradient_envmap(), cluster_size=32
    )
    return scene, meta


@pytest.fixture(scope="session")
def small_cfg():
    return RenderConfig(width=64, height=48)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)))
