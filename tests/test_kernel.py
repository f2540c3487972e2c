"""Pallas kernel (interpret mode) vs the XLA brute-force backend — the key
property test replacing DXR's hardware traversal oracle (SURVEY.md 4)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import rmse
from refraction_tpu.kernels.intersect_pallas import pallas_intersect
from refraction_tpu.ops.backends import xla_intersect


def _random_rays(n, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wf = rng.random(n) < 0.5
    al = rng.random(n) < 0.8
    return o, d, wf, al


@pytest.mark.parametrize("scene_fixture", ["cube_scene", "sphere_scene"])
def test_kernel_matches_xla(scene_fixture, request):
    scene, _ = request.getfixturevalue(scene_fixture)
    o, d, wf, al = _random_rays(1500, seed=1)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(100.0)

    h1, t1, i1, _ = xla_intersect(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(wf),
        jnp.asarray(al), tmin, tmax,
    )
    h2, t2, i2, n2 = pallas_intersect(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(wf),
        jnp.asarray(al), tmin, tmax, interpret=True,
    )
    h1 = np.asarray(h1) & al  # xla backend ignores alive; kernel enforces it
    h2, t2, i2 = map(np.asarray, (h2, t2, i2))
    t1, i1 = np.asarray(t1), np.asarray(i1)

    assert (h1 == h2).all()
    m = h1 & h2
    assert (i1[m] == i2[m]).all()
    np.testing.assert_allclose(t1[m], t2[m], atol=1e-5)


def test_kernel_dead_lanes_never_hit(cube_scene):
    scene, _ = cube_scene
    o, d, wf, _ = _random_rays(1024, seed=2)
    al = np.zeros(1024, bool)
    h, t, i, _ = pallas_intersect(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(wf),
        jnp.asarray(al), jnp.float32(1e-4), jnp.float32(100.0),
        interpret=True,
    )
    assert not np.asarray(h).any()


def test_kernel_nonmultiple_block_padding(sphere_scene):
    """Ray counts that are not multiples of 1024 pad correctly."""
    scene, _ = sphere_scene
    o, d, wf, al = _random_rays(777, seed=3)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(100.0)
    h2, t2, _, _ = pallas_intersect(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(wf),
        jnp.asarray(al), tmin, tmax, interpret=True,
    )
    h1, t1, _, _ = xla_intersect(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(wf),
        jnp.asarray(al), tmin, tmax,
    )
    h1 = np.asarray(h1) & al
    assert h2.shape == (777,)
    assert (np.asarray(h2) == h1).all()


def test_render_pallas_backend_matches_oracle(sphere_scene, small_cfg):
    """Full wavefront render through the pallas (interpret) backend."""
    from oracle.numpy_tracer import render_oracle
    from refraction_tpu.render import render_frame

    scene, _ = sphere_scene
    cfg = small_cfg.replace(width=32, height=24, backend="pallas")
    intersect = functools.partial(pallas_intersect, interpret=True)
    img_j = np.asarray(render_frame(scene, cfg, angle=0.85, intersect_fn=intersect))
    img_o = render_oracle(scene, cfg, angle=0.85)
    assert rmse(img_j, img_o) < 1e-4


def test_norm_vmem_table_layout(sphere_scene):
    """tri_norm_vmem is the channel-major gather-table view of
    tri_norm_packed: channel c of triangle ti at row c*Rn + ti//128,
    lane ti%128 (the deferred winner-normal resolve's contract)."""
    scene, meta = sphere_scene
    packed = np.asarray(scene.tri_norm_packed)
    table = np.asarray(scene.tri_norm_vmem)
    t_pad = packed.shape[0]
    rows_n = table.shape[0] // 9
    assert table.shape[1] == 128 and rows_n % 8 == 0
    for ti in (0, 1, t_pad // 2, t_pad - 1):
        for c in range(9):
            got = table[c * rows_n + ti // 128, ti % 128]
            assert got == packed[ti, c], (ti, c)
    # Padding rows (beyond t_pad) are zero.
    flat0 = table[:rows_n].reshape(-1)
    assert not flat0[t_pad:].any()


def test_auto_cluster_size_table():
    from refraction_tpu.scene import auto_cluster_size

    # Round-4 re-sweep values (see scene.auto_cluster_size docstring).
    assert auto_cluster_size(12) == 1024     # cube
    assert auto_cluster_size(967) == 1024    # monkey (single cluster)
    assert auto_cluster_size(1536) == 128    # shell
    assert auto_cluster_size(12877) == 1024  # ott
    assert auto_cluster_size(81920) == 512   # streamed tier (DMA ring)
    for t in (1, 100, 5000, 100000):
        assert auto_cluster_size(t) % 8 == 0
