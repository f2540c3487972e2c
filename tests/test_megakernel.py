"""Fused wavefront megakernel vs oracle / modular path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import rmse
from oracle.numpy_tracer import render_oracle
from refraction_tpu.camera import generate_rays, orbit_camera
from refraction_tpu.integrator import render_pixels_mega


def _pad_rays_to_tiles(o, d):
    n = o.shape[0]
    pad = (-n) % 1024
    if pad:
        o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
        d = np.concatenate(
            [d, np.tile(np.array([[0, 1, 0]], np.float32), (pad, 1))])
    return jnp.asarray(o), jnp.asarray(d), n


@pytest.mark.parametrize("scene_fixture,angle", [
    ("cube_scene", 0.3),
    ("sphere_scene", 0.85),
])
def test_mega_matches_oracle(scene_fixture, angle, small_cfg, request):
    scene, _ = request.getfixturevalue(scene_fixture)
    cfg = small_cfg.replace(width=64, height=16)
    frame = orbit_camera(angle, cfg)
    o, d = generate_rays(frame, cfg.width, cfg.height, xp=np)
    oj, dj, n = _pad_rays_to_tiles(o.astype(np.float32), d.astype(np.float32))

    rad = np.asarray(
        render_pixels_mega(scene, oj, dj, cfg, interpret=True)
    )[:n].reshape(cfg.height, cfg.width, 3)
    ref = render_oracle(scene, cfg, angle=angle)
    assert rmse(rad, ref) < 2e-4
    assert np.abs(rad - ref).max() < 5e-3  # env poly atan2 boundary texels


def test_mega_bounce_profiles(sphere_scene, small_cfg):
    scene, _ = sphere_scene
    for mrd, mld in [(1, 0), (2, 1), (5, 2)]:
        cfg = small_cfg.replace(width=64, height=16,
                                max_refract_depth=mrd, max_reflect_depth=mld)
        frame = orbit_camera(0.5, cfg)
        o, d = generate_rays(frame, cfg.width, cfg.height, xp=np)
        oj, dj, n = _pad_rays_to_tiles(o, d)
        rad = np.asarray(
            render_pixels_mega(scene, oj, dj, cfg, interpret=True)
        )[:n].reshape(cfg.height, cfg.width, 3)
        ref = render_oracle(scene, cfg, angle=0.5)
        assert rmse(rad, ref) < 2e-4, (mrd, mld)


def test_mega_stats(cube_scene, small_cfg):
    scene, _ = cube_scene
    cfg = small_cfg.replace(width=64, height=16)
    frame = orbit_camera(0.3, cfg)
    o, d = generate_rays(frame, cfg.width, cfg.height, xp=np)
    oj, dj, n = _pad_rays_to_tiles(o, d)
    rad, stats = render_pixels_mega(
        scene, oj, dj, cfg, interpret=True, collect_stats=True)
    rays = int(stats["rays_traced"])
    assert rays >= n  # all primaries traced
    assert rays <= 19 * oj.shape[0]  # bounded by the tree size
