"""Generate the committed mid-res oracle goldens (tests_tpu/golden/).

The hardware tier's per-test oracle goldens are 96x64 (oracle cost bounds
them); scale-dependent bugs — tile-grid indexing, env window offsets at
many-tile grids — only bite at larger grids. This renders each SPEC scene
at 384x256 (12x8 = 96 tiles) once through the NumPy oracle on CPU and
commits the radiance + its sha256; tests_tpu/test_tpu_golden.py then pins
the compiled fused kernel against them on the real chip.

Three scenes cover the three production path combinations (VERDICT r3
item 6):
- monkey: resident geometry + palette-coded env (the headline config)
- shell:  the scene the reference actually renders (RefractionDemo.cpp:537)
          at its bounce caps (RayTracing.hlsl:82,110)
- ott:    streamed (HBM record DMA) geometry + coded env + front-to-back
          reorder in combination (the stress asset)

Run (once, or after any deliberate behavioral change):
    JAX_PLATFORMS=cpu python tools/make_golden.py [scene ...]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests_tpu", "golden")

# Configs shared verbatim by the generator and the hardware tests. Keys
# are the artifact stems. cluster_size is pinned (not auto) so the
# artifacts stay stable across auto-tuning changes — the golden pins
# per-pixel behavior, which is cluster-size-independent.
SPECS = {
    "monkey_384x256": dict(
        width=384, height=256, scene="monkey.obj", angle=0.37,
        max_refract_depth=4, max_reflect_depth=2, cluster_size=128),
    "shell_384x256": dict(
        width=384, height=256, scene="shell.obj", angle=0.53,
        max_refract_depth=5, max_reflect_depth=2, cluster_size=128),
    "ott_384x256": dict(
        width=384, height=256, scene="ott.obj", angle=0.53,
        max_refract_depth=5, max_reflect_depth=2, cluster_size=256),
    # Supersampled golden (VERDICT r4 item 4): pins the sample-batched
    # spp path (framekernel RRT_SPP_BATCH — jitter SMEM indexing,
    # (spp*8,128) blocks, per-pixel fold) through compiled Mosaic; the
    # oracle side is the mean of per-sample renders at the same
    # render.sample_offsets jitters.
    "monkey_384x256_spp4": dict(
        width=384, height=256, scene="monkey.obj", angle=0.37, spp=4,
        max_refract_depth=4, max_reflect_depth=2, cluster_size=128),
}
SPEC = SPECS["monkey_384x256"]  # back-compat alias


def golden_cfg(asset_dir: str, spec=None):
    from refraction_tpu.config import RenderConfig

    spec = spec or SPEC
    return RenderConfig(
        width=spec["width"], height=spec["height"],
        scene_path=os.path.join(asset_dir, spec["scene"]),
        envmap_path=os.path.join(asset_dir, "envmap.png"),
        backend="pallas", spp=spec.get("spp", 1),
        max_refract_depth=spec["max_refract_depth"],
        max_reflect_depth=spec["max_reflect_depth"],
        cluster_size=spec["cluster_size"])


def oracle_image(scene, cfg, angle):
    """Oracle render matching the kernel's supersampling contract: the
    mean of per-sample renders at render.sample_offsets' jitters (the
    kernel averages its spp in-kernel with the same offsets)."""
    from oracle.numpy_tracer import render_oracle
    from refraction_tpu.render import sample_offsets

    if cfg.spp == 1:
        return render_oracle(scene, cfg, angle=angle)
    offs = sample_offsets(cfg.spp)
    n = cfg.height * cfg.width
    acc = None
    for s in range(cfg.spp):
        jit_s = np.broadcast_to(offs[s], (n, 2))
        img = render_oracle(scene, cfg, angle=angle,
                            jitter=jit_s).astype(np.float64)
        acc = img if acc is None else acc + img
    return (acc / cfg.spp).astype(np.float32)


def main():
    from refraction_tpu.scene import load_scene

    asset_dir = os.environ.get("RRT_ASSET_DIR", "/root/reference")
    only = set(sys.argv[1:])
    for name, spec in SPECS.items():
        if only and name not in only and spec["scene"] not in only:
            continue
        cfg = golden_cfg(asset_dir, spec)
        scene, meta = load_scene(cfg)
        t0 = time.time()
        img = oracle_image(scene, cfg, spec["angle"]).astype(np.float32)
        dt = time.time() - t0
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        np.save(path, img)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        with open(os.path.join(GOLDEN_DIR, f"{name}.json"), "w") as f:
            json.dump(dict(spec, sha256=digest, tris=meta.num_real_tris,
                           oracle_seconds=round(dt, 1)), f, indent=1)
        print(f"golden: {path} ({img.nbytes / 2**20:.1f} MB, oracle "
              f"{dt:.0f}s, sha256 {digest[:16]}...)")


if __name__ == "__main__":
    main()
