"""Fused whole-frame kernel (kernels/framekernel.py) vs the XLA reference
renderer — in-kernel raygen, bounce tree, env shading, spp loop.

Interpret mode on CPU; the same kernel compiles for TPU (covered by the
-m tpu tier in test_tpu_golden.py)."""

import numpy as np
import pytest

from refraction_tpu.camera import orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.primitives import (
    make_cube,
    make_gradient_envmap,
    make_icosphere,
)
from refraction_tpu.kernels.framekernel import render_frame_fused
from refraction_tpu.render import make_renderer
from refraction_tpu.scene import build_scene

# Compile-heavy integration tier: excluded by `-m "not slow"` (fast tier).
pytestmark = pytest.mark.slow


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.fixture(scope="module")
def sphere_scene():
    scene, _ = build_scene(
        make_icosphere(2), make_gradient_envmap(64, 128), cluster_size=32
    )
    return scene


def _xla_image(scene, cfg):
    return make_renderer(cfg, use_mega=False)(scene, orbit_camera(0.3, cfg))


def test_fused_matches_xla_sphere(sphere_scene):
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    ref = _xla_image(sphere_scene, cfg)
    fused = render_frame_fused(
        sphere_scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert fused.shape == (64, 96, 3)
    assert _rmse(ref, fused) < 1e-5


def test_fused_matches_xla_cube():
    scene, _ = build_scene(
        make_cube(), make_gradient_envmap(32, 64), cluster_size=32)
    cfg = RenderConfig(width=64, height=64, max_refract_depth=3,
                       backend="xla")
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(
        scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_fused_spp_loop(sphere_scene):
    """Supersampling runs inside the kernel (BASELINE config 5 regime)."""
    cfg = RenderConfig(width=64, height=64, max_refract_depth=3, spp=4,
                       backend="xla")
    ref = _xla_image(sphere_scene, cfg)
    fused = render_frame_fused(
        sphere_scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_spp_batch_parity(sphere_scene, monkeypatch):
    """RRT_SPP_BATCH (all spp sub-pixel samples of a slot traced as one
    (spp*8, 128) block) must match the sequential per-sample loop: the
    per-lane traversal/shading math is identical (union gating is
    conservative), only the radiance accumulation order differs — so
    near-equality, same tolerance as the other schedule knobs."""
    import refraction_tpu.kernels.framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, spp=4, backend="xla")
    frame = orbit_camera(0.5, cfg)

    monkeypatch.setattr(fk, "_SPP_BATCH", False)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(fk, "_SPP_BATCH", True)
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_fused_no_reflection_slots(sphere_scene):
    """max_reflect_depth=0 collapses the pool to one slot."""
    cfg = RenderConfig(width=64, height=64, max_refract_depth=3,
                       max_reflect_depth=0, backend="xla")
    ref = _xla_image(sphere_scene, cfg)
    fused = render_frame_fused(
        sphere_scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_fused_nonaligned_resolution(sphere_scene):
    """Width/height not multiples of 32 exercise the pad+crop path."""
    cfg = RenderConfig(width=70, height=50, max_refract_depth=2,
                       backend="xla")
    ref = _xla_image(sphere_scene, cfg)
    fused = render_frame_fused(
        sphere_scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert fused.shape == (50, 70, 3)
    assert _rmse(ref, fused) < 1e-5


def test_renderer_routes_fused(sphere_scene, monkeypatch):
    """make_renderer on the pallas backend goes through the fused path."""
    import refraction_tpu.kernels.framekernel as fk

    calls = {}
    orig = fk.frame_call

    def spy(*a, **kw):
        calls["hit"] = True
        kw["interpret"] = True  # CPU test host
        return orig(*a, **kw)

    monkeypatch.setattr(fk, "frame_call", spy)
    cfg = RenderConfig(width=64, height=64, max_refract_depth=2,
                       backend="pallas")
    img = make_renderer(cfg)(sphere_scene, orbit_camera(0.3, cfg))
    assert calls.get("hit")
    cfg_x = RenderConfig(width=64, height=64, max_refract_depth=2,
                         backend="xla")
    ref = _xla_image(sphere_scene, cfg_x)
    ref2 = make_renderer(cfg_x, use_mega=False)(
        sphere_scene, orbit_camera(0.3, cfg_x))
    assert _rmse(img, ref2) < 1e-5


@pytest.mark.parametrize("streamed", [False, True])
def test_slot_batch_bit_parity(sphere_scene, streamed):
    """RRT_SLOT_BATCH=1 (whole w-slot rounds as one (w*8,128) traversal)
    must be BIT-identical to the per-slot rolled loop: union gating only
    adds candidate tests each lane's own predicates reject (overlap,
    improvability, cull side, liveness), so no winner can change."""
    import refraction_tpu.kernels.framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)
    saved = fk._SLOT_BATCH
    try:
        fk._SLOT_BATCH = False
        fk.frame_call.clear_cache()
        a = np.asarray(render_frame_fused(
            sphere_scene, frame, cfg, interpret=True, streamed=streamed))
        fk._SLOT_BATCH = True
        fk.frame_call.clear_cache()
        b = np.asarray(render_frame_fused(
            sphere_scene, frame, cfg, interpret=True, streamed=streamed))
    finally:
        fk._SLOT_BATCH = saved
        fk.frame_call.clear_cache()
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("bits", [16, 8])
def test_subword_bit_parity(sphere_scene, bits, monkeypatch):
    """RRT_SUBWORD<32 (finer subcluster gating words, fresher best_t for
    improvability) must be BIT-identical to the default 32: pruning only
    removes boxes whose entry >= best_t for every lane, and any triangle
    hit inside such a box has t >= entry >= best_t, which the strict
    `t < best` winner test rejects anyway."""
    import refraction_tpu.kernels.framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)
    monkeypatch.delenv("RRT_SUBWORD", raising=False)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setenv("RRT_SUBWORD", str(bits))
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("knob", ["tri2x", "sub2x"])
def test_duplication_instruments_parity(sphere_scene, knob, monkeypatch):
    """The tri2x/sub2x timing instruments repeat idempotent work (the
    strict `<` winner test re-rejects every already-accepted candidate),
    so the hit set — and thus the workload of every later bounce round —
    is unchanged: that is what makes their device-time delta an
    uncontaminated cost attribution (unlike tri1/notri, which change the
    hit set). The comparison is near-equality, not bit-equality: the
    duplicated loop is a different XLA program, and XLA:CPU's
    shape-dependent FMA contraction perturbs results by a couple of ulp
    (measured max 2.4e-7 on this fixture) without flipping any winner."""
    import refraction_tpu.kernels.intersect_pallas as ip

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)
    from refraction_tpu.kernels import framekernel as fk

    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(ip, "_ABLATE", frozenset({knob}))
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


@pytest.mark.parametrize("width", [2, 4])
def test_pair_bit_parity(sphere_scene, monkeypatch, width):
    """RRT_PAIR (multi-visit set-bit iteration: ``width`` gated visits
    per scalar-loop trip, sub level + coded env scan) must be
    near-identical to the one-visit loop: the visit SET and ORDER are
    unchanged (bits are consumed ascending), and the remainder
    duplicate visits are idempotent — the traversal's strict `<` winner
    test re-rejects the just-accepted candidate and the coded env scan
    overwrite-selects the same texel. Near-equality (not bit-equality)
    for the same reason as the duplication instruments: the multi-visit
    loop is a different XLA:CPU program shape."""
    import refraction_tpu.kernels.envmap_pallas as ep
    import refraction_tpu.kernels.intersect_pallas as ip
    from refraction_tpu.kernels import framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)

    monkeypatch.setattr(ip, "_VISIT_W", 1)
    monkeypatch.setattr(ep, "_VISIT_W", 1)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(ip, "_VISIT_W", width)
    monkeypatch.setattr(ep, "_VISIT_W", width)
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_rational_bit_parity(sphere_scene, monkeypatch):
    """RRT_RATIONAL=1 (division-free rational-t MT: winner carried as
    (t_num', |det|), cross-multiplied compares, one resolve divide per
    traversal) must be near-identical to the divided form: the resolved
    t/u/v are bit-identical whenever the same winner is selected, and
    only measure-zero boundary ties can flip one. Exercises both
    production rational paths on this 64x32 depth-3 config — the
    deferred-norms closest hit (every bounce round) and any-hit (last
    round). Near-equality tolerance for the same reason as the
    duplication instruments: a different XLA:CPU program shape contracts
    FMAs differently (ADVICE r3: manually measured max diff 9e-8 on this
    fixture; this test pins it in CI)."""
    import refraction_tpu.kernels.intersect_pallas as ip
    from refraction_tpu.kernels import framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)

    monkeypatch.setattr(ip, "_RATIONAL", False)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(ip, "_RATIONAL", True)
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_fused_streamed_matches_resident(sphere_scene):
    """HBM-record streaming traversal (the size-agnostic path) is
    bit-identical to the SMEM-resident path; also covers DMA issue/wait
    in interpret mode."""
    cfg = RenderConfig(width=64, height=64, max_refract_depth=3,
                       backend="xla")
    frame = orbit_camera(0.3, cfg)
    res = render_frame_fused(sphere_scene, frame, cfg, interpret=True,
                             streamed=False)
    strm = render_frame_fused(sphere_scene, frame, cfg, interpret=True,
                              streamed=True)
    assert np.array_equal(np.asarray(res), np.asarray(strm))


def test_fused_coded_envmap_matches_xla():
    """Code-packed envmap path (<=256 distinct channel values — the
    8-bit-PNG case, e.g. the reference's envmap.png): exact LUT decode
    must match the 3-plane f32 path bit-for-bit (scene.py env_codes)."""
    env = make_gradient_envmap(64, 128)
    # Quantize to an 8-bit-like value set so the code packing engages.
    env = np.round(env * 255.0) / 255.0
    assert np.unique(env).size <= 256
    scene, _ = build_scene(make_icosphere(2), env.astype(np.float32),
                           cluster_size=32)
    assert scene.env_codes.shape[0] > 1  # coded layout selected
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(
        scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_fused_rgbe_envmap_matches_xla():
    """RGBE-coded envmap path (.hdr sources: values exactly representable
    as Radiance RGBE bytes): in-kernel arithmetic decode must match the
    3-plane f32 path bit-for-bit (scene.py RGBE fit; envmap_pallas
    _rgbe_decode)."""
    from refraction_tpu.io.hdr import float_to_rgbe, rgbe_to_float

    env = rgbe_to_float(float_to_rgbe(make_gradient_envmap(64, 128)))
    assert np.unique(env).size > 256  # too many values for the LUT flavor
    scene, _ = build_scene(make_icosphere(2), env.astype(np.float32),
                           cluster_size=32)
    assert scene.env_codes.shape[0] > 1    # coded layout selected
    assert scene.env_lut.shape[0] == 1     # ... the RGBE flavor
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(
        scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_fused_palette_envmap_matches_xla():
    """4-texel palette-packed envmap (<=256 distinct RGB TRIPLES — the
    reference's envmap.png has 135): four 8-bit palette indices per int32
    word + triple-palette decode must match the 3-plane f32 path
    (scene.py palette flavor; envmap_pallas._pal_decode). This quarters
    the env scan's row count — the measured remaining env cost is pure
    per-visit gather/select over code rows."""
    rng = np.random.default_rng(3)
    pal = rng.random((200, 3)).astype(np.float32)
    idx = rng.integers(0, 200, size=(64, 128))
    env = np.ascontiguousarray(pal[idx])
    scene, _ = build_scene(make_icosphere(2), env, cluster_size=32)
    assert scene.env_lut.shape[0] == 6      # palette flavor selected
    assert scene.env_codes.size * 4 >= 64 * 128  # 4 texels per word
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(
        scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5


def test_single_cluster_fast_path(sphere_scene):
    """A single-cluster scene (monkey's auto tier: C == 1) takes
    gated_loop's one-box pl.when fast path at the cluster level; the
    image must match the XLA reference exactly like the multi-cluster
    layout of the same mesh (same visit set: bit 0 <=> region taken)."""
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    one_cluster, _ = build_scene(
        make_icosphere(2), make_gradient_envmap(64, 128), cluster_size=1024)
    assert one_cluster.cluster_bounds.shape[0] == 1
    ref = _xla_image(one_cluster, cfg)
    fused = render_frame_fused(
        one_cluster, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5
    # Same mesh at C=10 (the multi-word path) must produce the same
    # image up to tie-break noise — here exactly, as the meshes coincide.
    multi = render_frame_fused(
        sphere_scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert _rmse(np.asarray(fused), np.asarray(multi)) < 1e-6


def test_env_gate_bit_parity(sphere_scene, monkeypatch):
    """RRT_ENV_GATE (the accumulate scan's any-miss pre-gate, default
    OFF since round 5): the ungated body self-gates through its empty
    gate words — an all-hit block runs zero visits and (coded path)
    accumulates exact zeros — so the image must be bit-identical with
    the gate on or off."""
    import refraction_tpu.kernels.envmap_pallas as ep
    import refraction_tpu.kernels.framekernel as fk

    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.3, cfg)
    fk.frame_call.clear_cache()
    off = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                        interpret=True))
    monkeypatch.setattr(ep, "_ENV_GATE", True)
    fk.frame_call.clear_cache()
    try:
        on = np.asarray(render_frame_fused(sphere_scene, frame, cfg,
                                           interpret=True))
    finally:
        monkeypatch.undo()
        fk.frame_call.clear_cache()
    assert np.array_equal(off, on)


def test_tri_vmem_parity(monkeypatch):
    """RRT_TRI_VMEM (candidate geometry via the per-float broadcast VMEM
    table — off-default, measured neutral on device): same acceptance
    rules and winner selection, but the (1,128)-row broadcast operands
    let the compiler contract muls differently than scalar-broadcast
    SMEM loads, so agreement is ulp-class (measured 1.5e-7 max), not
    bit-exact — the RATIONAL-style tolerance contract."""
    import refraction_tpu.kernels.framekernel as fk

    scene, _ = build_scene(
        make_icosphere(2, radius=1.2), make_gradient_envmap(64, 128),
        cluster_size=1024)
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    frame = orbit_camera(0.3, cfg)
    fk.frame_call.clear_cache()
    base = np.asarray(render_frame_fused(scene, frame, cfg, interpret=True))
    monkeypatch.setattr(fk, "_TRI_VMEM", True)
    fk.frame_call.clear_cache()
    try:
        bc = np.asarray(render_frame_fused(scene, frame, cfg,
                                           interpret=True))
    finally:
        monkeypatch.undo()
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(base, bc, atol=1e-5, rtol=0)


def test_env_dyn_word_window_parity(sphere_scene, monkeypatch):
    """Large-envmap fallback (envmap_pallas._STATIC_ENV_WORDS): when the
    static word count would span too much of the table, the accumulate
    scan switches to a dynamic word window (fori over [min, max] occupied
    word). Same visit set and order (occupied groups, ascending), so the
    output must be bit-identical on both the uncoded 3-plane path and the
    coded path; forcing the threshold to 0 exercises the fallback on the
    small test maps."""
    import refraction_tpu.kernels.envmap_pallas as ep
    import refraction_tpu.kernels.framekernel as fk

    env = make_gradient_envmap(64, 128)
    coded_env = (np.round(env * 255.0) / 255.0).astype(np.float32)
    coded_scene, _ = build_scene(make_icosphere(2), coded_env,
                                 cluster_size=32)
    assert coded_scene.env_codes.shape[0] > 1
    cfg = RenderConfig(width=96, height=64, max_refract_depth=4,
                       backend="xla")
    frame = orbit_camera(0.3, cfg)
    for scene in (sphere_scene, coded_scene):
        fk.frame_call.clear_cache()
        base = np.asarray(render_frame_fused(scene, frame, cfg,
                                             interpret=True))
        monkeypatch.setattr(ep, "_STATIC_ENV_WORDS", 0)
        fk.frame_call.clear_cache()
        try:
            dyn = np.asarray(render_frame_fused(scene, frame, cfg,
                                                interpret=True))
        finally:
            monkeypatch.undo()
            fk.frame_call.clear_cache()
        assert np.array_equal(base, dyn)


@pytest.fixture(scope="module")
def bigcluster_scene():
    """A scene whose clusters span >1 sub gating word (spc = 128 -> 4
    words of 32): the regime where RRT_SEQGATE / RRT_F2B_SUB actually
    change the gating schedule (cluster_size 1024, like monkey/ott's
    auto tier)."""
    scene, _ = build_scene(
        make_icosphere(3, radius=1.2), make_gradient_envmap(64, 128),
        cluster_size=1024)
    assert scene.sub_bounds.shape[0] // scene.cluster_bounds.shape[0] > 32
    return scene


def test_seqgate_bit_parity(bigcluster_scene, monkeypatch):
    """RRT_SEQGATE (sequential sub-word gating: each 32-bit word's gate
    plane reads the register-carried winner state as tightened by the
    previous words' visits, instead of all words reading cluster-entry
    caps) must be near-identical to the all-words-first scan: the visit
    SET can only shrink (fresher improvability bound; accept => gate
    still holds by the rational-margin argument), order is unchanged.
    Near-equality tolerance: different XLA:CPU program shape."""
    import refraction_tpu.kernels.intersect_pallas as ip
    from refraction_tpu.kernels import framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)

    monkeypatch.setattr(fk, "_F2B_SUB", False)  # isolate the word schedule
    monkeypatch.setattr(ip, "_SEQGATE", False)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(bigcluster_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(ip, "_SEQGATE", True)
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(bigcluster_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_fusewords_bit_parity(bigcluster_scene, monkeypatch):
    """RRT_FUSEWORDS (all sub gating words iterated in ONE while loop,
    picking the lowest set bit of the first nonzero word per trip) must
    visit the exact same subclusters in the exact same order as the
    per-word loops — the images should be near-identical (different
    XLA:CPU program shape, same FMA-contraction tolerance as the other
    schedule-knob parity tests)."""
    import refraction_tpu.kernels.intersect_pallas as ip
    from refraction_tpu.kernels import framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       max_reflect_depth=2, backend="xla")
    frame = orbit_camera(0.5, cfg)

    monkeypatch.setattr(ip, "_FUSEWORDS", False)
    fk.frame_call.clear_cache()
    a = np.asarray(render_frame_fused(bigcluster_scene, frame, cfg,
                                      interpret=True))
    monkeypatch.setattr(ip, "_FUSEWORDS", True)
    fk.frame_call.clear_cache()
    try:
        b = np.asarray(render_frame_fused(bigcluster_scene, frame, cfg,
                                          interpret=True))
    finally:
        fk.frame_call.clear_cache()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_f2b_sub_order(bigcluster_scene, monkeypatch):
    """RRT_F2B_SUB (within-cluster front-to-back subcluster ordering):
    permuted tables must stay internally consistent — same triangle
    multiset, sub AABBs actually sorted by camera distance within each
    cluster, records re-packed to match — and the rendered image equals
    the unordered one up to coincident-hit tie-breaks (none here).
    Exercises both the resident and streamed table layouts.

    RRT_F2B_SUB is gated on RRT_SEQGATE (without sequential word gating
    a sub permutation cannot change any gate) and seqgate defaults OFF
    (measured loser) — so the knob pair is forced on here."""
    import refraction_tpu.kernels.framekernel as fk
    import refraction_tpu.kernels.intersect_pallas as ip

    monkeypatch.setattr(ip, "_SEQGATE", True)
    monkeypatch.setattr(fk, "_F2B_SUB", True)
    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       backend="xla")
    frame = orbit_camera(0.7, cfg)

    ordered = fk.front_to_back_scene(bigcluster_scene, frame.origin)
    sb = np.asarray(ordered.sub_bounds)
    C = ordered.cluster_bounds.shape[0]
    spc = sb.shape[0] // C
    centers = 0.5 * (sb[:, :3] + sb[:, 3:])
    d2 = ((centers - np.asarray(frame.origin)) ** 2).sum(axis=1)
    for ci in range(C):
        dd = d2[ci * spc:(ci + 1) * spc]
        assert (np.diff(dd) >= -1e-5).all(), f"cluster {ci} subs not f2b"
    orig = np.asarray(bigcluster_scene.tri_packed)
    perm = np.asarray(ordered.tri_packed)
    assert np.array_equal(
        np.sort(orig.reshape(-1, 9), axis=0),
        np.sort(perm.reshape(-1, 9), axis=0))
    # Record layout consistency: the permuted record must repack the
    # permuted sub bounds + triangle rows in the same [subs | tris] order.
    cs = orig.shape[0] // C
    rec_pad = ordered.cluster_records.shape[0] // C
    rec = np.asarray(ordered.cluster_records).reshape(C, rec_pad)
    assert np.array_equal(rec[:, :spc * 6].reshape(-1, 6), sb)
    assert np.array_equal(
        rec[:, spc * 6:spc * 6 + cs * 9].reshape(-1, 9),
        perm.reshape(-1, 9))

    fk.frame_call.clear_cache()  # earlier tests cached other knob states
    on = render_frame_fused(bigcluster_scene, frame, cfg, interpret=True)
    monkeypatch.setattr(fk, "_F2B_SUB", False)
    fk.frame_call.clear_cache()
    try:
        off = render_frame_fused(bigcluster_scene, frame, cfg,
                                 interpret=True)
    finally:
        fk.frame_call.clear_cache()
    assert _rmse(on, off) < 1e-7


def test_front_to_back_order(sphere_scene, monkeypatch):
    """Per-frame front-to-back cluster ordering (front_to_back_scene):
    the permuted tables must (a) actually sort clusters by camera
    distance, (b) stay internally consistent (winner ids -> normal
    table), so the rendered image is identical to the unordered scan up
    to coincident-hit tie-breaks (none on this fixture)."""
    import refraction_tpu.kernels.framekernel as fk

    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       backend="xla")
    frame = orbit_camera(0.7, cfg)

    ordered = fk.front_to_back_scene(sphere_scene, frame.origin)
    cb = np.asarray(ordered.cluster_bounds)
    centers = 0.5 * (cb[:, :3] + cb[:, 3:])
    d2 = ((centers - np.asarray(frame.origin)) ** 2).sum(axis=1)
    assert (np.diff(d2) >= -1e-6).all(), "clusters not front-to-back"
    # Block-permutation consistency: every permuted triangle row exists
    # in the original table (same multiset).
    orig = np.asarray(sphere_scene.tri_packed)
    perm = np.asarray(ordered.tri_packed)
    assert np.array_equal(
        np.sort(orig.reshape(-1, 9), axis=0), np.sort(perm.reshape(-1, 9),
                                                      axis=0))

    on = render_frame_fused(sphere_scene, frame, cfg, interpret=True)
    monkeypatch.setattr(fk, "_F2B", False)
    off = render_frame_fused(sphere_scene, frame, cfg, interpret=True)
    assert _rmse(on, off) < 1e-7


def test_third_level_supers_match_flat():
    """Coarse third bound level (supers of 32 clusters, auto past 64
    clusters): a 160-cluster scene through the hier scan must match the
    XLA reference, and streamed must equal resident exactly."""
    import refraction_tpu.kernels.framekernel as fk

    scene, _ = build_scene(make_icosphere(3, radius=1.2),
                           make_gradient_envmap(32, 64), cluster_size=8)
    assert scene.cluster_bounds.shape[0] > fk._SUPER_MIN_C
    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       backend="xla")
    frame = orbit_camera(0.3, cfg)
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(scene, frame, cfg, interpret=True)
    assert _rmse(ref, fused) < 1e-5
    streamed = render_frame_fused(scene, frame, cfg, interpret=True,
                                  streamed=True)
    assert np.array_equal(np.asarray(fused), np.asarray(streamed))


@pytest.mark.parametrize("curve", ["median", "hilbert", "morton"])
def test_fused_random_soup_matches_xla(curve, monkeypatch):
    # Property-style robustness: an incoherent random triangle soup (no
    # surface structure, awkward non-multiple count) exercises every
    # RRT_CURVE ordering on degenerate centroid distributions, cluster
    # padding, and window gating with near-useless bounds — the fused
    # kernel must still agree with the XLA wavefront path.
    from refraction_tpu.io.objmesh import MeshData

    monkeypatch.setenv("RRT_CURVE", curve)

    rng = np.random.default_rng(7)
    cent = rng.uniform(-1.5, 1.5, (137, 1, 3))
    tri = (cent + rng.normal(0.0, 0.2, (137, 3, 3))).astype(np.float32)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    mesh = MeshData(
        positions=tri,
        normals=np.repeat(nrm[:, None, :], 3, axis=1).astype(np.float32),
        uvs=np.zeros((137, 3, 2), np.float32),
    )
    scene, meta = build_scene(mesh, make_gradient_envmap(32, 64),
                              cluster_size=32)
    assert meta.num_real_tris == 137
    cfg = RenderConfig(width=64, height=32, max_refract_depth=3,
                       backend="xla")
    ref = _xla_image(scene, cfg)
    fused = render_frame_fused(
        scene, orbit_camera(0.3, cfg), cfg, interpret=True)
    assert np.isfinite(np.asarray(fused)).all()
    assert _rmse(ref, fused) < 1e-5
