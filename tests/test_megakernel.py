"""Fused wavefront megakernel vs oracle / modular path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import rmse
from oracle.numpy_tracer import render_oracle
from refraction_tpu.camera import generate_rays, orbit_camera
from refraction_tpu.integrator import render_pixels_mega

# Compile-heavy integration tier: excluded by `-m "not slow"` (fast tier).
pytestmark = pytest.mark.slow


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


def test_reflection_child_liveness_survives_weight_underflow():
    """A reflection child spawned with an underflowed weight (w * R == 0.0)
    must still be ALIVE (explicit l_cull hit mask) — the reference spawns
    the reflection TraceRay on every hit regardless of weight
    (RayTracing.hlsl:110-123). Round-1 inferred liveness from l_wgt > 0,
    which silently killed such rays."""
    import jax.numpy as jnp

    from refraction_tpu.io.primitives import (
        make_gradient_envmap,
        make_icosphere,
    )
    from refraction_tpu.kernels.megakernel import mega_round
    from refraction_tpu.scene import build_scene

    scene, _ = build_scene(
        make_icosphere(1), make_gradient_envmap(16, 32), cluster_size=32)
    n = 16384  # one full 16-tile grid program
    rows = n // 128
    # All rays aimed at the sphere center from +x: every lane hits.
    ox = jnp.full((rows, 128), 3.0, jnp.float32)
    oy = jnp.zeros((rows, 128), jnp.float32)
    oz = jnp.zeros((rows, 128), jnp.float32)
    dx = jnp.full((rows, 128), -1.0, jnp.float32)
    dy = jnp.zeros((rows, 128), jnp.float32)
    dz = jnp.zeros((rows, 128), jnp.float32)
    cull = jnp.ones((rows, 128), jnp.float32)
    # Tiny-but-positive parent weight: w * fres underflows to exactly 0.0
    # in float32 (fres ~ 8e-3 * (1-cos)^5 is ~0 at normal incidence, and
    # 1e-38 * anything < 1 flushes to 0).
    wgt = jnp.full((rows, 128), 1.0e-38, jnp.float32)
    env_flat = scene.env_packed.reshape(-1, 128)
    limits = jnp.asarray([1e-4, 100.0, 1.3, 0.00826446], jnp.float32)
    res = mega_round(
        scene.tri_packed, scene.tri_norm_packed, scene.cluster_bounds,
        scene.sub_bounds, env_flat, limits,
        ox, oy, oz, dx, dy, dz, cull, wgt,
        env_h=16, env_w=32, want_reflect=True, want_children=True,
        interpret=True,
    )
    l_cull, l_wgt = res[14], res[15]
    import numpy as np

    l_cull = np.asarray(l_cull)
    l_wgt = np.asarray(l_wgt)
    # Weight underflowed to zero on (at least) the head-on lanes...
    assert (l_wgt == 0.0).any()
    # ...but every hit lane's reflection child is still alive, same side.
    assert (l_cull == 1.0).all()
