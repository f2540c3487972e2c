#!/usr/bin/env python
"""Device-time probe: pure on-device ms/frame for a scene/config, via a
profiler trace of the fused frame kernel (no host overhead). Usage:

    python tools/devtime.py [scene.obj] [width height] [bounces] [n]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from refraction_tpu.camera import orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.render import make_renderer
from refraction_tpu.scene import load_scene, scene_to_device


def device_ms(render, scene, cfg, n=6):
    import tempfile

    frames = [orbit_camera(0.1 + 0.1 * k, cfg) for k in range(n)]
    render(scene, frames[0]).block_until_ready()  # compile
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            outs = [render(scene, f) for f in frames]
            for o in outs:
                float(jnp.sum(o[0, 0]))
        tr_files = glob.glob(os.path.join(
            td, "plugins", "profile", "*", "*.trace.json.gz"))
        with gzip.open(tr_files[0]) as f:
            tr = json.load(f)
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    durs = sorted(
        e["dur"] / 1e3 for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev_pids
        and "frame_call" in e.get("name", "")
        and not e["name"].startswith("jit_")
    )
    return durs


def main():
    args = sys.argv[1:]
    scene_name = args[0] if args else "monkey.obj"
    w, h = (int(args[1]), int(args[2])) if len(args) > 2 else (1920, 1080)
    bounces = int(args[3]) if len(args) > 3 else 4
    cfg = RenderConfig(
        width=w, height=h,
        scene_path=os.path.join(
            os.environ.get("RRT_ASSET_DIR", "/root/reference"), scene_name),
        max_refract_depth=bounces, backend="auto",
        spp=int(os.environ.get("RRT_SPP", "1")),
        cluster_size=(int(os.environ["RRT_CLUSTER"])
                      if os.environ.get("RRT_CLUSTER") else None),
    )
    scene, meta = load_scene(cfg)
    scene = scene_to_device(scene)
    render = make_renderer(cfg)
    durs = device_ms(render, scene, cfg)
    print(json.dumps({
        "scene": scene_name, "tris": meta.num_real_tris,
        "wxh": f"{w}x{h}", "bounces": bounces,
        "cluster_size": meta.cluster_size,
        "device_ms": [round(d, 2) for d in durs],
        "median_ms": round(durs[len(durs) // 2], 2) if durs else None,
    }))


if __name__ == "__main__":
    main()
