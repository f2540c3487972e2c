"""Polynomial transcendentals (utils/fastmath.py) vs numpy, plus env-kernel
parity with the XLA miss shader."""

import jax.numpy as jnp
import numpy as np

from refraction_tpu.kernels.envmap_pallas import pallas_env_contribution
from refraction_tpu.ops.backends import xla_env_contribution
from refraction_tpu.utils import fastmath


def test_atan2_accuracy():
    rng = np.random.default_rng(0)
    y = rng.normal(size=20000).astype(np.float32)
    x = rng.normal(size=20000).astype(np.float32)
    got = np.asarray(fastmath.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    assert np.abs(got - ref).max() < 5e-7


def test_atan2_axes():
    pts = np.array(
        [[0, 1], [1, 0], [0, -1], [-1, 0], [1, 1], [-1, -1], [1e-20, -1]],
        np.float32,
    )
    got = np.asarray(fastmath.atan2(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    ref = np.arctan2(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_acos_accuracy():
    x = np.linspace(-1, 1, 20001).astype(np.float32)
    got = np.asarray(fastmath.acos(jnp.asarray(x)))
    ref = np.arccos(x)
    assert np.abs(got - ref).max() < 1e-5  # grows near |x|=1 via sqrt


def test_env_kernel_matches_xla(sphere_scene):
    scene, _ = sphere_scene
    rng = np.random.default_rng(1)
    n = 3000
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    w = np.where(rng.random(n) < 0.7, rng.random(n), 0.0).astype(np.float32)

    ref = np.asarray(xla_env_contribution(scene, jnp.asarray(d), jnp.asarray(w)))
    got = np.asarray(
        pallas_env_contribution(scene, jnp.asarray(d), jnp.asarray(w), interpret=True)
    )
    # Identical texels except directions within float noise of a texel
    # boundary (polynomial atan2 vs libm): allow a tiny fraction to differ.
    same = np.isclose(got, ref, atol=1e-6).all(axis=1)
    assert same.mean() > 0.999, same.mean()
    # dead lanes exactly zero
    assert (got[w == 0] == 0).all()


def test_env_kernel_coherent_block(cube_scene):
    """Coherent (primary-like) directions: the windowed path, exact match."""
    scene, _ = cube_scene
    from refraction_tpu.camera import orbit_camera, generate_rays
    from refraction_tpu.config import RenderConfig

    cfg = RenderConfig(width=64, height=32)
    frame = orbit_camera(0.4, cfg)
    _, d = generate_rays(frame, 64, 32, xp=np)
    w = np.ones(64 * 32, np.float32)
    ref = np.asarray(xla_env_contribution(scene, jnp.asarray(d), jnp.asarray(w)))
    got = np.asarray(
        pallas_env_contribution(scene, jnp.asarray(d), jnp.asarray(w), interpret=True)
    )
    same = np.isclose(got, ref, atol=1e-6).all(axis=1)
    assert same.mean() > 0.999
