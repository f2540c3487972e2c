#!/usr/bin/env python
"""Per-scene knob auto-tuner: sweep the traversal layout knobs on the
real device and report the fastest configuration as one JSON line.

The built-in defaults (scene.auto_cluster_size, the RRT_SUPER=32
threshold, the RRT_ENV_PATH=auto policy) were chosen from device sweeps
over the reference assets; a production scene with a different shape
(very deep instancing, skewed aspect, unusual envmap size) may prefer
different knobs. This tool measures — pure device-ms medians via the
profiler, no host noise — and prints the winner, ready to export:

    python tools/autotune.py scene.obj [width height] [bounces]
    RRT_TUNE_CLUSTERS=128,256,512 python tools/autotune.py ott.obj

Knobs swept (each axis independently against the current best — a full
cross product would square the compile count for second-order gains the
reference-asset sweeps measured as noise):

- cluster size  (RRT_TUNE_CLUSTERS, default '64,128,256,512' filtered
  to sizes the scene supports)
- ordering      (RRT_TUNE_CURVES, default 'median,hilbert')
- env miss path (tile / accumulate / auto)

Each measurement reuses the live TPU client and the persistent compile
cache; only shape-changing knobs (cluster size) recompile.
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
from refraction_tpu.scene import SUB_TRIS, load_scene, scene_to_device
from tools.devtime import device_ms


def _measure(cfg, n=7):
    """Median on-device ms for one knob setting (env knobs are read at
    import/trace time by the kernel modules, so the scene and renderer
    are rebuilt per call)."""
    scene, meta = load_scene(cfg)
    scene = scene_to_device(scene)
    render = make_renderer(cfg)
    durs = device_ms(render, scene, cfg, n=n)
    return (durs[len(durs) // 2] if durs else float("inf")), meta


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 1
    scene_name = args[0]
    w, h = (int(args[1]), int(args[2])) if len(args) > 2 else (1920, 1080)
    bounces = int(args[3]) if len(args) > 3 else 4
    path = scene_name
    if not os.path.exists(path):
        path = os.path.join(
            os.environ.get("RRT_ASSET_DIR", "/root/reference"), scene_name)

    def cfg_for(cluster):
        return RenderConfig(width=w, height=h, scene_path=path,
                            max_refract_depth=bounces, backend="auto",
                            cluster_size=cluster)

    trials = []

    def run(label, cluster, curve, env_path):
        os.environ["RRT_CURVE"] = curve
        if env_path is None:
            os.environ.pop("RRT_ENV_PATH", None)
        else:
            os.environ["RRT_ENV_PATH"] = env_path
        # RRT_ENV_PATH is read at kernels.framekernel import; patch the
        # module global so one process can sweep it. The env path is not
        # part of frame_call's jit key (same shapes/statics), so drop its
        # cache or the sweep would re-time the cached executable.
        import refraction_tpu.kernels.framekernel as fk

        if fk._ENV_PATH != (env_path or "auto"):
            fk._ENV_PATH = env_path or "auto"
            fk.frame_call.clear_cache()
        ms, meta = _measure(cfg_for(cluster))
        rec = {"knobs": {"cluster_size": meta.cluster_size, "curve": curve,
                         "env_path": env_path or "auto"},
               "median_ms": round(ms, 2)}
        trials.append(rec)
        print(json.dumps({"trial": label, **rec}), file=sys.stderr,
              flush=True)
        return ms

    # Axis 1: cluster size at the default ordering/env policy.
    _, meta0 = _measure(cfg_for(None), n=1)
    n_tris = meta0.num_real_tris
    sizes = [int(s) for s in os.environ.get(
        "RRT_TUNE_CLUSTERS", "64,128,256,512").split(",")]
    sizes = [s for s in sizes
             if s % SUB_TRIS == 0 and s <= max(n_tris, SUB_TRIS)]
    best = {"cluster_size": None, "curve": "median", "env_path": None}
    best_ms = float("inf")
    for s in sizes:
        ms = run(f"cluster={s}", s, best["curve"], best["env_path"])
        if ms < best_ms:
            best_ms, best["cluster_size"] = ms, s

    # Axis 2: ordering at the winning cluster size.
    for curve in os.environ.get("RRT_TUNE_CURVES",
                                "median,hilbert").split(","):
        if curve == best["curve"]:
            continue
        ms = run(f"curve={curve}", best["cluster_size"], curve,
                 best["env_path"])
        if ms < best_ms:
            best_ms, best["curve"] = ms, curve

    # Axis 3: env miss path.
    for ep in ("tile", "accumulate"):
        ms = run(f"env={ep}", best["cluster_size"], best["curve"], ep)
        if ms < best_ms:
            best_ms, best["env_path"] = ms, ep

    print(json.dumps({
        "scene": scene_name, "tris": n_tris, "wxh": f"{w}x{h}",
        "bounces": bounces, "best_median_ms": round(best_ms, 2),
        "best": {"RRT_CLUSTER": best["cluster_size"],
                 "RRT_CURVE": best["curve"],
                 "RRT_ENV_PATH": best["env_path"] or "auto"},
        "trials": trials,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
