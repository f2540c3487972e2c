"""Robustness: degenerate scenes, oversized assets, fallback paths."""

import numpy as np

from conftest import rmse
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.objmesh import MeshData
from refraction_tpu.io.primitives import make_cube, make_gradient_envmap
from refraction_tpu.render import make_renderer, render_frame
from refraction_tpu.camera import generate_rays, orbit_camera
from refraction_tpu.ops.shade import envmap_color
from refraction_tpu.scene import build_scene


def _empty_mesh() -> MeshData:
    return MeshData(
        np.zeros((0, 3, 3), np.float32),
        np.zeros((0, 3, 3), np.float32),
        np.zeros((0, 3, 2), np.float32),
    )


def test_empty_scene_renders_pure_envmap():
    scene, meta = build_scene(_empty_mesh(), make_gradient_envmap(), 8)
    assert meta.num_real_tris == 0
    cfg = RenderConfig(width=64, height=32, backend="xla")
    img = np.asarray(render_frame(scene, cfg, angle=0.3))
    frame = orbit_camera(0.3, cfg)
    _, dirs = generate_rays(frame, cfg.width, cfg.height, xp=np)
    env = envmap_color(dirs, scene.envmap, np).reshape(32, 64, 3)
    assert rmse(img, env) < 1e-6


def test_single_triangle_scene():
    mesh = MeshData(
        np.array([[[0, -1, -1], [0, 1, -1], [0, 0, 1]]], np.float32),
        np.broadcast_to(np.array([-1.0, 0, 0], np.float32), (1, 3, 3)).copy(),
        np.zeros((1, 3, 2), np.float32),
    )
    scene, meta = build_scene(mesh, make_gradient_envmap(), 8)
    cfg = RenderConfig(width=32, height=32, backend="xla")
    img = np.asarray(render_frame(scene, cfg, angle=0.0))
    assert np.isfinite(img).all()


def test_big_envmap_falls_back_to_xla_gather():
    """Envmaps too large for VMEM take the XLA-gather path in the pallas
    env backend; results must match exactly."""
    import jax.numpy as jnp

    from refraction_tpu.kernels.envmap_pallas import pallas_env_contribution
    from refraction_tpu.ops.backends import xla_env_contribution

    big_env = np.random.default_rng(0).random((1024, 2048, 3)).astype(np.float32)
    scene, _ = build_scene(make_cube(2.0), big_env, 8)
    assert scene.env_packed.size * 4 > 8 * 2 ** 20
    rng = np.random.default_rng(1)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    w = rng.random(256).astype(np.float32)
    got = np.asarray(pallas_env_contribution(scene, jnp.asarray(d), jnp.asarray(w)))
    ref = np.asarray(xla_env_contribution(scene, jnp.asarray(d), jnp.asarray(w)))
    np.testing.assert_array_equal(got, ref)


def test_mega_falls_back_for_big_envmap():
    """make_renderer silently degrades from the fused megakernel when the
    scene exceeds VMEM/SMEM budgets (use_mega=True + big env)."""
    big_env = np.zeros((1024, 2048, 3), np.float32)
    big_env[:, :, 0] = 0.5
    scene, _ = build_scene(make_cube(2.0), big_env, 8)
    cfg = RenderConfig(width=64, height=32, backend="xla")
    frame = orbit_camera(0.3, cfg)
    ref = np.asarray(make_renderer(cfg, use_mega=False)(scene, frame))
    got = np.asarray(make_renderer(cfg, use_mega=True)(scene, frame))
    np.testing.assert_allclose(got, ref, atol=2e-6)
