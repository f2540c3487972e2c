"""Generate the committed mid-res oracle golden (tests_tpu/golden/).

The hardware tier's per-pixel goldens are 96x64 (oracle cost bounds
them); scale-dependent bugs — tile-grid indexing, env window offsets at
many-tile grids — only bite at larger grids. This renders monkey.obj at
384x256 (12x8 = 96 tiles) once through the NumPy oracle on CPU and
commits the radiance + its sha256; tests_tpu/test_tpu_golden.py then
pins the compiled fused kernel against it on the real chip.

Run (once, or after any deliberate behavioral change):
    JAX_PLATFORMS=cpu python tools/make_golden.py
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

# One config, shared verbatim by the generator and the hardware test.
SPEC = dict(width=384, height=256, scene="monkey.obj", angle=0.37,
            max_refract_depth=4, max_reflect_depth=2, cluster_size=128)


def golden_cfg(asset_dir: str):
    from refraction_tpu.config import RenderConfig

    return RenderConfig(
        width=SPEC["width"], height=SPEC["height"],
        scene_path=os.path.join(asset_dir, SPEC["scene"]),
        envmap_path=os.path.join(asset_dir, "envmap.png"),
        backend="pallas",
        max_refract_depth=SPEC["max_refract_depth"],
        max_reflect_depth=SPEC["max_reflect_depth"],
        cluster_size=SPEC["cluster_size"])


def main():
    from oracle.numpy_tracer import render_oracle
    from refraction_tpu.scene import load_scene

    asset_dir = os.environ.get("RRT_ASSET_DIR", "/root/reference")
    cfg = golden_cfg(asset_dir)
    scene, meta = load_scene(cfg)
    t0 = time.time()
    img = render_oracle(scene, cfg, angle=SPEC["angle"]).astype(np.float32)
    dt = time.time() - t0
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "monkey_384x256.npy")
    np.save(path, img)
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    with open(os.path.join(GOLDEN_DIR, "monkey_384x256.json"), "w") as f:
        json.dump(dict(SPEC, sha256=digest, tris=meta.num_real_tris,
                       oracle_seconds=round(dt, 1)), f, indent=1)
    print(f"golden: {path} ({img.nbytes / 2**20:.1f} MB, oracle {dt:.0f}s, "
          f"sha256 {digest[:16]}...)")


if __name__ == "__main__":
    main()
