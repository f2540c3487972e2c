"""Compiled-kernel golden tests on the real TPU chip.

Every test here renders through the *Mosaic-compiled* Pallas kernels (no
``interpret=True``) and asserts agreement with the NumPy oracle — the same
behavioral contract the CPU-tier golden tests pin for the interpret path
(tests/test_golden.py), now enforced on hardware. Covers the reference's
full per-pixel program: RayGen (RayTracing.hlsl:27-40), the ClosestHit
recursion tree (:79-123), and the Miss envmap fetch (:127-137).
"""

import numpy as np
import pytest

from conftest import rmse
from oracle.numpy_tracer import render_oracle
from refraction_tpu.camera import orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.primitives import make_gradient_envmap, make_icosphere
from refraction_tpu.kernels.framekernel import render_frame_fused
from refraction_tpu.scene import build_scene, load_scene, scene_to_device

RMSE_TOL = 1e-4  # VERDICT round-1 weak item 1's asked-for bound


@pytest.fixture(scope="module")
def sphere_scene():
    scene, _ = build_scene(
        make_icosphere(subdiv=2, radius=1.2),
        make_gradient_envmap(64, 128),
        cluster_size=32,
    )
    return scene_to_device(scene)


def _cfg(**kw):
    base = dict(width=96, height=64, backend="pallas", cluster_size=32)
    base.update(kw)
    return RenderConfig(**base)


def test_fused_frame_kernel_matches_oracle(sphere_scene):
    """Whole-frame fused kernel (the production path), compiled."""
    cfg = _cfg(max_refract_depth=5, max_reflect_depth=2)
    img = np.asarray(
        render_frame_fused(sphere_scene, orbit_camera(0.85, cfg), cfg))
    ref = render_oracle(sphere_scene, cfg, angle=0.85)
    assert rmse(img, ref) < RMSE_TOL


def test_fused_streamed_matches_resident(sphere_scene):
    """HBM-record streaming traversal == SMEM-resident traversal, compiled
    (the size-agnostic path must agree exactly with the resident one)."""
    cfg = _cfg(max_refract_depth=4)
    frame = orbit_camera(0.42, cfg)
    res = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                        streamed=False))
    str_ = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                         streamed=True))
    assert np.array_equal(res, str_), (
        f"streamed/resident mismatch: max abs diff "
        f"{np.abs(res - str_).max()}")


def test_shell_asset_matches_oracle(reference_dir):
    """The scene the reference demo actually loads
    (RefractionDemo.cpp:537), on hardware."""
    cfg = RenderConfig(
        width=96, height=64,
        scene_path=f"{reference_dir}/shell.obj",
        backend="pallas", cluster_size=128, max_refract_depth=4,
    )
    scene, _ = load_scene(cfg)
    scene = scene_to_device(scene)
    img = np.asarray(
        render_frame_fused(scene, orbit_camera(0.3, cfg), cfg))
    ref = render_oracle(scene, cfg, angle=0.3)
    assert rmse(img, ref) < RMSE_TOL


def test_ott_streamed_on_hardware(reference_dir):
    """Large-scene regression: ott.obj (12,877 tris) through the streaming
    traversal on the real chip — the round-1 crash cliff (TODO.md round-1:
    XLA fallback faulted the TPU worker past the SMEM budget)."""
    cfg = RenderConfig(
        width=64, height=32,
        scene_path=f"{reference_dir}/ott.obj",
        backend="pallas", cluster_size=128, max_refract_depth=2,
    )
    scene, _ = load_scene(cfg)
    scene = scene_to_device(scene)
    frame = orbit_camera(0.2, cfg)
    img_s = np.asarray(render_frame_fused(scene, frame, cfg, streamed=True))
    assert np.isfinite(img_s).all()
    assert img_s.max() > 0
    # Small res + shallow depth keep the brute-force NumPy oracle (12,877
    # tris on the 1-core test host) to seconds, not minutes.
    ref = render_oracle(scene, cfg, angle=0.2)
    assert rmse(img_s, ref) < RMSE_TOL


def test_modular_intersect_compiled(sphere_scene):
    """Standalone closest-hit kernel vs the XLA brute-force oracle on
    random rays, compiled (tests/test_kernel.py runs this in interpret)."""
    import jax.numpy as jnp

    from refraction_tpu.kernels.intersect_pallas import pallas_intersect
    from refraction_tpu.ops.backends import xla_intersect

    rng = np.random.default_rng(7)
    n = 4096
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (-3.0 * d + 0.1 * rng.normal(size=(n, 3))).astype(np.float32)
    want_front = jnp.asarray(rng.random(n) < 0.5)
    alive = jnp.ones(n, bool)

    hit_p, t_p, i_p, n_p = pallas_intersect(
        sphere_scene, jnp.asarray(o), jnp.asarray(d), want_front, alive,
        1e-4, 100.0)
    hit_x, t_x, i_x, n_x = xla_intersect(
        sphere_scene, jnp.asarray(o), jnp.asarray(d), want_front, alive,
        jnp.float32(1e-4), jnp.float32(100.0))

    hit_p, hit_x = np.asarray(hit_p), np.asarray(hit_x)
    assert (hit_p == hit_x).all()
    np.testing.assert_allclose(
        np.asarray(t_p)[hit_p], np.asarray(t_x)[hit_x], rtol=1e-5, atol=1e-5)
    assert (np.asarray(i_p)[hit_p] == np.asarray(i_x)[hit_x]).all()


def test_instanced_scene_on_hardware():
    """TLAS-with-N-instances (transform baking, scene.Instance) through
    the compiled fused kernel vs the oracle: placed copies must render
    exactly like the merged mesh they bake to (the single-mesh contract
    extended to instancing, RefractionDemo.cpp:325-335)."""
    from refraction_tpu.scene import (
        Instance, build_instanced_scene, instance_transform)

    mesh = make_icosphere(subdiv=1, radius=0.8)
    scene, meta = build_instanced_scene(
        [Instance(mesh),
         Instance(mesh, instance_transform(translate=(0.0, 0.0, -1.9),
                                           scale=0.6)),
         Instance(mesh, instance_transform(translate=(0.0, 0.0, 1.9),
                                           scale=(0.5, 1.1, 0.5),
                                           rotate_y_deg=40.0))],
        make_gradient_envmap(64, 128), cluster_size=32)
    assert meta.num_real_tris == 3 * mesh.num_tris
    scene = scene_to_device(scene)
    cfg = _cfg(max_refract_depth=3, max_reflect_depth=1)
    img = np.asarray(
        render_frame_fused(scene, orbit_camera(0.15, cfg), cfg))
    assert np.isfinite(img).all() and img.max() > 0
    ref = render_oracle(scene, cfg, angle=0.15)
    assert rmse(img, ref) < RMSE_TOL


def test_80k_tri_synthetic_streamed_on_hardware():
    """Size-agnostic traversal at 6.4x ott's triangle count: an 81,920-tri
    icosphere through the streaming path on the real chip, vs the oracle
    (VERDICT round-1 item 2 asked for a >=50k-tri synthetic scene; DXR's
    AS build+traverse never cared about scene size,
    RefractionDemo.cpp:272-361)."""
    scene, meta = build_scene(
        make_icosphere(subdiv=6, radius=1.2),
        make_gradient_envmap(64, 128),
        cluster_size=256,
    )
    assert meta.num_real_tris == 81920
    scene = scene_to_device(scene)
    cfg = _cfg(width=48, height=32, cluster_size=256, max_refract_depth=2,
               max_reflect_depth=1)
    frame = orbit_camera(0.2, cfg)
    img = np.asarray(render_frame_fused(scene, frame, cfg, streamed=True))
    assert np.isfinite(img).all() and img.max() > 0
    ref = render_oracle(scene, cfg, angle=0.2)
    assert rmse(img, ref) < RMSE_TOL


def test_strided_tile_grid_matches_single_compiled(sphere_scene):
    """The multi-device fused path's kernel contract, compiled on ONE
    chip: two tile_stride=2 half-grids (shard bases 0/1, with a gated
    round-up pad tile) must reassemble bit-exactly into the plain
    single-call frame. This is exactly what each shard of
    parallel.sharding.make_fused_sharded_renderer executes on a real
    multi-chip slice (there, base = axis_index)."""
    import jax.numpy as jnp

    from refraction_tpu.kernels.framekernel import (
        build_scalars, frame_call, front_to_back_scene)
    from refraction_tpu.render import sample_offsets

    cfg = _cfg(width=96, height=96, max_refract_depth=3)  # 3x3 = 9 tiles
    frame = orbit_camera(0.5, cfg)
    scene = front_to_back_scene(sphere_scene, frame.origin)
    scal = build_scalars(frame, cfg, sample_offsets(cfg.spp))
    geom = (scene.tri_packed, scene.tri_norm_vmem,
            scene.cluster_bounds, scene.sub_bounds)
    coded = scene.env_codes.shape[0] > 1
    kw = dict(
        width=cfg.width, height=cfg.height, spp=cfg.spp,
        max_refract=cfg.max_refract_depth,
        max_reflect=cfg.max_reflect_depth,
        env_h=scene.envmap.shape[0], env_w=scene.envmap.shape[1],
        cluster_size=scene.tri_packed.shape[0]
        // scene.cluster_bounds.shape[0],
        env_codes=scene.env_codes if coded else None,
        env_lut=scene.env_lut if coded else None,
    )
    env_flat = scene.env_packed.reshape(-1, 128)

    single = frame_call(*geom, env_flat, scal, **kw)
    n_tiles, n_local = 9, 5  # 9 tiles pad to 10 over 2 shards
    parts = []
    for base in (0, 1):
        scal_b = jnp.concatenate(
            [scal, jnp.asarray([float(base)], jnp.float32)])
        parts.append(frame_call(
            *geom, env_flat, scal_b, tile_stride=2,
            n_tiles_local=n_local, n_tiles_real=n_tiles, **kw))
    for c in range(3):
        want = np.asarray(single[c])  # (9*8, 128)
        got = np.zeros((2 * n_local * 8, 128), np.float32)
        for d in (0, 1):
            p = np.asarray(parts[d][c]).reshape(n_local, 8, 128)
            for j in range(n_local):
                got[(j * 2 + d) * 8:(j * 2 + d + 1) * 8] = p[j]
        np.testing.assert_array_equal(got[:n_tiles * 8], want)
        # The round-up pad tile (global id 9, shard 1) is gated off.
        assert (got[n_tiles * 8:] == 0).all()


@pytest.mark.parametrize("name", ["monkey_384x256", "shell_384x256",
                                  "ott_384x256", "monkey_384x256_spp4"])
def test_midres_committed_golden(reference_dir, name):
    """Each production scene at 384x256 (12x8 = 96 tiles) through the
    compiled fused kernel vs a committed oracle artifact
    (tools/make_golden.py).

    The per-test oracle goldens above are 96x64 — small enough that
    tile-grid indexing or env-window-offset bugs at MANY-tile grids
    would only surface in the (unchecked) 1080p bench render. This pins
    multi-tile-scale per-pixel behavior (RayTracing.hlsl:42-64 contract)
    against fixed artifacts whose sha256 guards silent regeneration.
    Coverage (VERDICT r3 item 6): monkey = the headline config; shell =
    the scene the reference actually renders (RefractionDemo.cpp:537) at
    its bounce caps; ott = the stress asset, rendered BOTH resident and
    streamed (HBM record DMA) + coded env + f2b reorder in combination."""
    import hashlib
    import json
    import os
    import os.path as osp
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

    from make_golden import GOLDEN_DIR, SPECS, golden_cfg

    spec = SPECS[name]
    art = osp.join(GOLDEN_DIR, f"{name}.npy")
    meta = json.load(open(osp.join(GOLDEN_DIR, f"{name}.json")))
    digest = hashlib.sha256(open(art, "rb").read()).hexdigest()
    assert digest == meta["sha256"], "golden artifact does not match its hash"
    ref = np.load(art)
    assert ref.shape == (spec["height"], spec["width"], 3)

    def check(img):
        # Robust contract: at most MAX_FLIPS pixels may differ visibly —
        # the documented measure-zero class of closest-hit WINNER FLIPS
        # (equal-t ties under the f2b table reorder + rational-compare
        # rounding vs the oracle's divided form; PARITY.md) — and the
        # image excluding them must meet the per-pixel rmse bar. ott at
        # this angle has 2 such pixels (measured: 0.083 / 0.002 max-
        # channel diff, everything else < 1e-3); a real regression
        # (tile indexing, env window, streaming) moves whole regions,
        # not single pixels.
        # spp>1 goldens: each of the spp samples carries its own
        # independent tie-break class (and its flip magnitude is
        # attenuated ~1/spp by the average) — budget scales with spp.
        # Measured: the spp=4 monkey golden has 7 flip pixels vs the
        # interpret render, max channel diff 0.0027.
        MAX_FLIPS = 8 * spec.get("spp", 1)
        d = np.abs(img - ref).max(axis=2)
        flips = d > 1e-3
        assert int(flips.sum()) <= MAX_FLIPS, (
            f"{int(flips.sum())} pixels differ visibly (> 1e-3)")
        keep = ~flips
        assert rmse(img[keep], ref[keep]) < RMSE_TOL

    cfg = golden_cfg(reference_dir, spec)
    scene, _ = load_scene(cfg)
    scene = scene_to_device(scene)
    frame = orbit_camera(spec["angle"], cfg)
    check(np.asarray(render_frame_fused(scene, frame, cfg)))
    if name == "ott_384x256":
        check(np.asarray(
            render_frame_fused(scene, frame, cfg, streamed=True)))


def test_accumulator_roundtrip_on_device(sphere_scene, tmp_path):
    """Checkpoint/resume of a progressive accumulation (render.
    Accumulator, the --accumulate/--resume CLI path) THROUGH the
    compiled production renderer on the real chip (VERDICT r4 item 4):
    accumulate 2 frames, save, load, add a third — must equal the
    uninterrupted 3-frame accumulation exactly (float64 sums of
    identical device renders)."""
    from refraction_tpu.render import Accumulator, make_renderer

    cfg = _cfg(max_refract_depth=3, max_reflect_depth=1)
    render = make_renderer(cfg)
    frames = [np.asarray(render(sphere_scene, orbit_camera(0.3 + 0.01 * k,
                                                           cfg)))
              for k in range(3)]
    assert all(np.isfinite(f).all() for f in frames)

    full = Accumulator(cfg.height, cfg.width)
    for f in frames:
        full.add(f)

    part = Accumulator(cfg.height, cfg.width)
    part.add(frames[0])
    part.add(frames[1])
    ckpt = str(tmp_path / "acc.npz")
    part.save(ckpt)
    resumed = Accumulator.load(ckpt)
    assert resumed.count == 2
    resumed.add(frames[2])

    assert resumed.count == full.count == 3
    np.testing.assert_array_equal(resumed.image, full.image)


def test_median_ordering_matches_oracle(monkeypatch):
    """RRT_CURVE=median (cascaded kd-style split) through the compiled
    kernel: the ordering changes cluster/subcluster layout and gating
    behavior, so the hardware tier must pin it against the oracle like
    the default ordering."""
    monkeypatch.setenv("RRT_CURVE", "median")
    scene, _ = build_scene(
        make_icosphere(subdiv=2, radius=1.2),
        make_gradient_envmap(64, 128),
        cluster_size=32,
    )
    scene = scene_to_device(scene)
    cfg = _cfg(max_refract_depth=4, max_reflect_depth=2)
    img = np.asarray(
        render_frame_fused(scene, orbit_camera(0.6, cfg), cfg))
    ref = render_oracle(scene, cfg, angle=0.6)
    assert rmse(img, ref) < RMSE_TOL
