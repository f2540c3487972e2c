#!/usr/bin/env python
"""Cold-compile probe: wall seconds to trace+compile the fused frame
kernel with a FRESH compilation cache (tempdir), for a given scene size.
The large streamed configs are the compile-time stress case (VERDICT r2
item 4: the ~10-min Mosaic compile at C=320 was hidden by .jax_cache).

    python tools/compiletime.py [subdiv] [width height] [bounces]

subdiv 6 -> 81,920 tris (the streamed stress scene of tests_tpu).
Prints one JSON line with compile_s and first-frame device sanity.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

_tmp = tempfile.mkdtemp(prefix="rrt_coldcache_")
jax.config.update("jax_compilation_cache_dir", _tmp)

from refraction_tpu.camera import orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.primitives import make_gradient_envmap, make_icosphere
from refraction_tpu.render import make_renderer
from refraction_tpu.scene import build_scene, scene_to_device


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    scene, meta = build_scene(
        make_icosphere(subdiv=subdiv, radius=1.2),
        make_gradient_envmap(64, 128),
        cluster_size=256,
    )
    scene = scene_to_device(scene)
    cfg = RenderConfig(width=w, height=h, cluster_size=256,
                       max_refract_depth=bounces,
                       max_reflect_depth=min(2, bounces))
    render = make_renderer(cfg)
    frame = orbit_camera(0.1, cfg)

    t0 = time.time()
    out = render(scene, frame)
    out.block_until_ready()
    compile_s = time.time() - t0
    ok = bool(np.isfinite(np.asarray(out)).all())
    print(json.dumps({
        "tris": int(meta.num_real_tris),
        "wxh": f"{w}x{h}",
        "bounces": bounces,
        "compile_s": round(compile_s, 1),
        "finite": ok,
    }))


if __name__ == "__main__":
    # The fresh-cache tempdir can hold large Mosaic artifacts (80k-tri
    # 1080p programs) and bench.py spawns this on every full run — always
    # clean it up (ADVICE r3).
    import shutil

    try:
        main()
    finally:
        shutil.rmtree(_tmp, ignore_errors=True)
