#!/usr/bin/env python
"""RRT_TILE image-tile-aspect sweep: device-ms medians per scene per tile
shape (32x32 / 16x64 / 8x128 by default).

Unlike RRT_CURVE (data-only), the tile shape is baked into module
constants and kernel index math at import time, so every setting runs in
a fresh SUBPROCESS (tools/devtime.py). Shapes change the Mosaic program:
the first run per shape pays a cold compile (cached after).

Why sweep this: the envmap window scan's row count is set by a tile's
VERTICAL angular span (flat texel rows f = iy*W + ix), so short-wide
tiles shrink the miss-shading scan; square tiles minimize the frustum
diameter the cluster gates key on. Output is bit-identical across shapes
(pure retiling permutation) — this is a pure speed knob.

Usage:
    python tools/tilesweep.py [HxW ...]     # default: 32x32 16x64 8x128
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENES = [
    ("monkey.obj", "1920", "1080", "4"),
    ("shell.obj", "1920", "1080", "5"),
    ("ott.obj", "1920", "1080", "5"),
]


def main():
    shapes = sys.argv[1:] or ["32x32", "16x64", "8x128"]
    for scene in SCENES:
        for shape in shapes:
            env = dict(os.environ, RRT_TILE=shape)
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "tools", "devtime.py"),
                 *scene],
                env=env, capture_output=True, text=True, timeout=1800)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                d = json.loads(line)
                print(json.dumps({"tile": shape, **d}), flush=True)
            except json.JSONDecodeError:
                print(json.dumps({
                    "tile": shape, "scene": scene[0], "error": True,
                    "stdout": r.stdout[-400:], "stderr": r.stderr[-400:],
                }), flush=True)


if __name__ == "__main__":
    main()
