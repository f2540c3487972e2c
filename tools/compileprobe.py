#!/usr/bin/env python
"""Cold-compile attribution probe (VERDICT round-4 item 1): time the
first render call of several configs with a FRESH persistent cache and
cleared in-memory caches, separating trace(lower) wall time from
backend compile wall time. In-process (the tunneled dev TPU is
single-client; subprocesses hang behind this process's client).

Usage: python tools/compileprobe.py [probe names...]
Probes: monkey1024 monkey256 shell128 ott1024 strm80k
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from refraction_tpu.camera import orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.primitives import make_gradient_envmap, make_icosphere
from refraction_tpu.scene import build_scene, load_scene, scene_to_device

ASSETS = os.environ.get("RRT_ASSET_DIR", "/root/reference")


def probe(name, cfg, scene):
    """Fresh-cache compile timing for one (cfg, scene) pair."""
    from refraction_tpu.kernels.framekernel import build_scalars, fused_radiance
    from refraction_tpu.render import sample_offsets

    tmp = tempfile.mkdtemp(prefix="rrt_probe_")
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", tmp)
    jax.clear_caches()
    try:
        offsets = sample_offsets(cfg.spp)
        scalars = build_scalars(orbit_camera(0.1, cfg), cfg, offsets)
        fn = jax.jit(lambda s, sc: fused_radiance(s, sc, cfg))
        t0 = time.time()
        lowered = fn.lower(scene, scalars)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        compiled(scene, scalars).block_until_ready()
        t_run = time.time() - t0
        out = {"probe": name, "lower_s": round(t_lower, 1),
               "compile_s": round(t_compile, 1),
               "first_run_s": round(t_run, 1),
               "tris": int(scene.tri_packed.shape[0]),
               "clusters": int(scene.cluster_bounds.shape[0])}
        print(json.dumps(out), flush=True)
        return out
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        shutil.rmtree(tmp, ignore_errors=True)


def make(name):
    if name == "monkey1024" or name == "monkey256" or name == "monkey128":
        cs = int(name[len("monkey"):])
        cfg = RenderConfig(width=1920, height=1080,
                           scene_path=os.path.join(ASSETS, "monkey.obj"),
                           max_refract_depth=4, cluster_size=cs)
        scene, _ = load_scene(cfg)
        return cfg, scene_to_device(scene)
    if name == "shell128":
        cfg = RenderConfig(width=1024, height=768,
                           scene_path=os.path.join(ASSETS, "shell.obj"),
                           max_refract_depth=5, cluster_size=128)
        scene, _ = load_scene(cfg)
        return cfg, scene_to_device(scene)
    if name == "ott1024":
        cfg = RenderConfig(width=1920, height=1080,
                           scene_path=os.path.join(ASSETS, "ott.obj"),
                           max_refract_depth=5, cluster_size=1024)
        scene, _ = load_scene(cfg)
        return cfg, scene_to_device(scene)
    if name == "strm80k":
        scene, _ = build_scene(make_icosphere(subdiv=6, radius=1.2),
                               make_gradient_envmap(64, 128),
                               cluster_size=256)
        cfg = RenderConfig(width=1920, height=1080, cluster_size=256,
                           max_refract_depth=4, max_reflect_depth=2)
        return cfg, scene_to_device(scene)
    raise SystemExit(f"unknown probe {name}")


def main():
    names = sys.argv[1:] or ["monkey1024", "monkey256", "strm80k"]
    for name in names:
        cfg, scene = make(name)
        probe(name, cfg, scene)


if __name__ == "__main__":
    main()
