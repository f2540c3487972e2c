#!/usr/bin/env python
"""RRT_SLOT_BATCH device A/B: per-slot vs batched-slot bounce rounds,
device-ms medians per scene, one process (the knob is a module global in
kernels.framekernel; flipping it + clearing frame_call's jit cache
recompiles in place — the TPU client and compile cache stay live).

    python tools/slotsweep.py                 # monkey/shell/ott at 1080p
    RRT_SWEEP_BIG=1 python tools/slotsweep.py # adds the 81,920-tri scene
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

import refraction_tpu.kernels.framekernel as fk
from refraction_tpu.config import RenderConfig
from refraction_tpu.render import make_renderer
from refraction_tpu.scene import build_scene, load_scene, scene_to_device
from tools.devtime import device_ms

SCENES = [
    ("monkey.obj", 1920, 1080, 4),
    ("shell.obj", 1920, 1080, 5),
    ("ott.obj", 1920, 1080, 5),
]


def measure(scene, cfg, batch: bool):
    if fk._SLOT_BATCH != batch:
        fk._SLOT_BATCH = batch
        fk.frame_call.clear_cache()
    render = make_renderer(cfg)
    durs = device_ms(render, scene, cfg, n=9)
    return durs


def report(name, cfg, scene):
    for batch in (False, True):
        durs = measure(scene, cfg, batch)
        print(json.dumps({
            "scene": name, "slot_batch": batch,
            "median_ms": round(durs[len(durs) // 2], 2) if durs else None,
            "device_ms": [round(d, 2) for d in durs],
        }), flush=True)


def main():
    for scene_name, w, h, bounces in SCENES:
        cfg = RenderConfig(
            width=w, height=h,
            scene_path=os.path.join(
                os.environ.get("RRT_ASSET_DIR", "/root/reference"),
                scene_name),
            max_refract_depth=bounces, backend="auto")
        scene, _ = load_scene(cfg)
        report(scene_name, cfg, scene_to_device(scene))

    if os.environ.get("RRT_SWEEP_BIG"):
        from refraction_tpu.io.primitives import (
            make_gradient_envmap, make_icosphere)

        scene, meta = build_scene(
            make_icosphere(subdiv=6, radius=1.2),
            make_gradient_envmap(480, 640))
        cfg = RenderConfig(width=1920, height=1080, backend="auto",
                           cluster_size=meta.cluster_size,
                           max_refract_depth=4)
        report("icosphere81920", cfg, scene_to_device(scene))


if __name__ == "__main__":
    main()
