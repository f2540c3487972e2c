"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md 4):
image-sharded rendering must match single-device bit-for-bit, and the
triangle-sharded intersect must match the replicated one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import rmse
from refraction_tpu.parallel.sharding import (
    make_mesh,
    make_mesh2d,
    make_sample_sharded_renderer,
    make_sharded_renderer,
    make_trisharded_intersect,
)
from refraction_tpu.camera import orbit_camera
from refraction_tpu.ops.backends import xla_intersect
from refraction_tpu.render import make_renderer

# Compile-heavy integration tier: excluded by `-m "not slow"` (fast tier).
pytestmark = pytest.mark.slow


def test_eight_fake_devices():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("ndev", [2, 8])
def test_image_sharded_matches_single(sphere_scene, small_cfg, ndev):
    scene, _ = sphere_scene
    cfg = small_cfg.replace(width=40, height=24, backend="xla")
    frame = orbit_camera(0.6, cfg)

    single = np.asarray(make_renderer(cfg)(scene, frame))
    mesh = make_mesh(ndev)
    sharded = np.asarray(make_sharded_renderer(cfg, mesh)(scene, frame))
    # Pixel math is identical, but the single-device path renders in
    # tile-permuted order (render.tile_order) so XLA fuses differently ->
    # ulp-level noise; assert tight agreement, not bit equality.
    np.testing.assert_allclose(single, sharded, rtol=0, atol=2e-6)


def test_interleaved_sharding_matches_contiguous(sphere_scene, small_cfg):
    # Load-balance interleave is a pure unit permutation: per-pixel work
    # is device-independent, so the image matches the contiguous-band
    # assignment up to XLA fusion ulp noise (the reshape/transpose fuses
    # into ray generation differently — same caveat as
    # test_image_sharded_matches_single).
    scene, _ = sphere_scene
    cfg = small_cfg.replace(width=40, height=24, backend="xla")
    frame = orbit_camera(0.6, cfg)
    mesh = make_mesh(8)
    plain = np.asarray(
        make_sharded_renderer(cfg, mesh, interleave=False)(scene, frame))
    inter = np.asarray(
        make_sharded_renderer(cfg, mesh, interleave=True)(scene, frame))
    np.testing.assert_allclose(plain, inter, rtol=0, atol=2e-6)


def test_image_sharded_supersampling(cube_scene, small_cfg):
    scene, _ = cube_scene
    cfg = small_cfg.replace(width=32, height=16, backend="xla", spp=4)
    frame = orbit_camera(0.3, cfg)
    single = np.asarray(make_renderer(cfg)(scene, frame))
    sharded = np.asarray(
        make_sharded_renderer(cfg, make_mesh(8))(scene, frame)
    )
    assert rmse(single, sharded) < 1e-7


@pytest.mark.parametrize("sample_devs", [2, 4])
def test_sample_sharded_matches_single(cube_scene, small_cfg, sample_devs):
    """2-D (samples, pixels) mesh: spp sharded over one axis, the image
    over the other; psum over samples must equal the sequential spp
    accumulation (up to float-add reassociation)."""
    scene, _ = cube_scene
    cfg = small_cfg.replace(width=32, height=16, backend="xla", spp=4)
    frame = orbit_camera(0.3, cfg)
    single = np.asarray(make_renderer(cfg)(scene, frame))
    mesh = make_mesh2d(8, sample_devs=sample_devs)
    assert dict(mesh.shape) == {
        "samples": sample_devs, "pixels": 8 // sample_devs}
    out = np.asarray(make_sample_sharded_renderer(cfg, mesh)(scene, frame))
    assert rmse(single, out) < 1e-6


def test_sample_sharded_rejects_uneven_spp(cube_scene, small_cfg):
    cfg = small_cfg.replace(spp=3)
    with pytest.raises(ValueError, match="spp=3"):
        make_sample_sharded_renderer(cfg, make_mesh2d(8, sample_devs=2))


def test_trisharded_intersect_matches(sphere_scene):
    scene, meta = sphere_scene
    assert meta.num_padded_tris % 8 == 0
    mesh = make_mesh(8)

    rng = np.random.default_rng(7)
    n = 512
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wf = jnp.asarray(rng.random(n) < 0.5)
    al = jnp.ones(n, bool)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(100.0)

    h1, t1, i1, _ = xla_intersect(scene, jnp.asarray(o), jnp.asarray(d), wf, al, tmin, tmax)
    tri = make_trisharded_intersect(mesh)
    h2, t2, i2, _ = jax.jit(
        lambda s, oo, dd, ww: tri(s, oo, dd, ww, al, tmin, tmax)
    )(scene, jnp.asarray(o), jnp.asarray(d), wf)

    h1, t1, i1 = map(np.asarray, (h1, t1, i1))
    h2, t2, i2 = map(np.asarray, (h2, t2, i2))
    assert (h1 == h2).all()
    m = h1
    assert (i1[m] == i2[m]).all()
    np.testing.assert_allclose(t1[m], t2[m], rtol=1e-6)


@pytest.mark.parametrize("w,h", [(128, 64), (96, 64)])
def test_fused_sharded_matches_fused_single(sphere_scene, small_cfg, w, h):
    """The PRODUCTION whole-frame fused kernel under shard_map pixel DP
    (make_fused_sharded_renderer) matches the single-device fused render.
    96x64 exercises the tile-count round-up padding (6 tiles over 8
    devices -> 2 gated pad tiles); 128x64 divides evenly (8 tiles)."""
    from refraction_tpu.kernels.framekernel import render_frame_fused
    from refraction_tpu.parallel.sharding import make_fused_sharded_renderer

    scene, _ = sphere_scene
    cfg = small_cfg.replace(width=w, height=h, backend="xla")
    frame = orbit_camera(0.6, cfg)
    single = np.asarray(render_frame_fused(scene, frame, cfg, interpret=True))
    sharded = np.asarray(
        make_fused_sharded_renderer(cfg, make_mesh(8), interpret=True)(
            scene, frame))
    assert sharded.shape == single.shape
    # Identical per-tile programs on identical data — only the output
    # assembly differs; agreement is to the bit on CPU interpret mode.
    np.testing.assert_allclose(single, sharded, rtol=0, atol=1e-7)


def test_fused_sharded_streamed_big_scene(small_cfg):
    """Streamed-geometry fused kernel UNDER multi-device pixel DP
    (VERDICT round-4 item 6): a >SMEM-budget scene (81,920-tri synthetic
    — the class DXR's size-agnostic AS build covers,
    RefractionDemo.cpp:272-361) renders through
    make_fused_sharded_renderer, which must route every shard onto the
    HBM-record DMA-ring traversal (fits_smem False) and still match the
    single-device streamed render bit-for-bit. Depth 2 keeps the
    interpret-mode cost bounded (~3 min); the streamed+DP combination is
    what's under test, not the bounce tree."""
    from refraction_tpu.io.primitives import (
        make_gradient_envmap, make_icosphere)
    from refraction_tpu.kernels.framekernel import (
        fits_smem, render_frame_fused)
    from refraction_tpu.parallel.sharding import make_fused_sharded_renderer
    from refraction_tpu.scene import build_scene

    scene, meta = build_scene(
        make_icosphere(subdiv=6, radius=1.2), make_gradient_envmap(64, 128),
        cluster_size=512)
    assert meta.num_real_tris == 81920
    assert not fits_smem(scene)  # the sharded renderer must stream
    cfg = small_cfg.replace(width=64, height=48, max_refract_depth=2,
                            backend="xla")
    frame = orbit_camera(0.3, cfg)
    single = np.asarray(render_frame_fused(scene, frame, cfg,
                                           interpret=True))
    sharded = np.asarray(
        make_fused_sharded_renderer(cfg, make_mesh(8), interpret=True)(
            scene, frame))
    assert np.array_equal(single, sharded)


def test_mega_in_shard_map(sphere_scene, small_cfg):
    """The fused megakernel runs under shard_map (the multi-chip config)
    and matches the single-device modular path."""
    import functools

    from jax.sharding import PartitionSpec as P
    from refraction_tpu.camera import generate_rays
    from refraction_tpu.integrator import render_pixels_mega

    scene, _ = sphere_scene
    cfg = small_cfg.replace(width=128, height=64, backend="xla")
    frame = orbit_camera(0.6, cfg)
    single = np.asarray(make_renderer(cfg)(scene, frame))

    mesh = make_mesh(8)
    o, d = generate_rays(frame, cfg.width, cfg.height, xp=np)
    f = jax.jit(jax.shard_map(
        lambda s, oo, dd: render_pixels_mega(s, oo, dd, cfg, interpret=True),
        mesh=mesh, in_specs=(P(), P("pixels"), P("pixels")),
        out_specs=P("pixels"), check_vma=False,
    ))
    rad = np.asarray(f(scene, jnp.asarray(o), jnp.asarray(d)))
    rad = rad.reshape(cfg.height, cfg.width, 3)
    assert rmse(rad, single) < 1e-4
