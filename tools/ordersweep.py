#!/usr/bin/env python
"""RRT_CURVE ordering A/B sweep: device-ms medians per scene per ordering,
in ONE process (the knob is read at build_scene time, so rebuilding the
scene per setting reuses the live TPU client and the compile cache —
ordering changes data, not shapes, so no recompiles after the first).

Usage:
    python tools/ordersweep.py [curve ...]        # default: hilbert median
    RRT_SWEEP_BIG=1 python tools/ordersweep.py    # adds the 81,920-tri
                                                  # streamed synthetic scene

Compare MEDIANS; run-to-run noise is ~0.5 ms (see TODO.md protocol notes).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from refraction_tpu.config import RenderConfig
from refraction_tpu.render import make_renderer
from refraction_tpu.scene import build_scene, load_scene, scene_to_device
from tools.devtime import device_ms

SCENES = [
    ("monkey.obj", 1920, 1080, 4),
    ("shell.obj", 1920, 1080, 5),
    ("ott.obj", 1920, 1080, 5),
]


def sweep_scene(scene_name, w, h, bounces, curves):
    cfg = RenderConfig(
        width=w, height=h,
        scene_path=os.path.join(
            os.environ.get("RRT_ASSET_DIR", "/root/reference"), scene_name),
        max_refract_depth=bounces, backend="auto")
    render = make_renderer(cfg)
    for curve in curves:
        os.environ["RRT_CURVE"] = curve
        scene, meta = load_scene(cfg)
        scene = scene_to_device(scene)
        durs = device_ms(render, scene, cfg, n=9)
        print(json.dumps({
            "scene": scene_name, "curve": curve,
            "cluster_size": meta.cluster_size,
            "median_ms": round(durs[len(durs) // 2], 2) if durs else None,
            "device_ms": [round(d, 2) for d in durs],
        }), flush=True)


def sweep_big(curves):
    from refraction_tpu.io.primitives import (make_gradient_envmap,
                                              make_icosphere)

    cfg = RenderConfig(width=1920, height=1080, max_refract_depth=4,
                       backend="auto", cluster_size=256)
    render = make_renderer(cfg)
    mesh = make_icosphere(subdiv=6, radius=1.2)
    env = make_gradient_envmap(64, 128)
    for curve in curves:
        os.environ["RRT_CURVE"] = curve
        scene, meta = build_scene(mesh, env, cluster_size=256)
        scene = scene_to_device(scene)
        durs = device_ms(render, scene, cfg, n=9)
        print(json.dumps({
            "scene": f"icosphere{meta.num_real_tris}", "curve": curve,
            "median_ms": round(durs[len(durs) // 2], 2) if durs else None,
            "device_ms": [round(d, 2) for d in durs],
        }), flush=True)


def main():
    curves = sys.argv[1:] or ["hilbert", "median"]
    for scene_name, w, h, bounces in SCENES:
        sweep_scene(scene_name, w, h, bounces, curves)
    if os.environ.get("RRT_SWEEP_BIG"):
        sweep_big(curves)


if __name__ == "__main__":
    main()
