"""Image-tile shape knob shared by the tiling helpers and the kernels.

One kernel block is always 1024 rays — an (8, 128) VPU tile — but the
*image* footprint those 1024 rays cover is a free parameter: the default
32x32 square (round-1 reasoning: tightest frustum diameter for the
cluster gates) versus wider/shorter rectangles (16x64, 8x128), which
halve/quarter a primary tile's VERTICAL angular span. The envmap window
scan (kernels/envmap_pallas.py) scans flat rows ``f = iy*W + ix`` between
a tile's min/max texel rows, and that window height is set almost
entirely by the iy (vertical) span — so shorter tiles shrink the scan
while widening the traversal frustum. Which effect wins is scene-
dependent and must be measured on device (tools/tilesweep.py).

Measured (monkey 1080p 4-bounce, v5e device medians): 32x32 17.3 ms,
16x64 18.2, 8x128 21.0 — the square default's tighter frustum beats the
env-window savings (the primary window is already only ~2.2 scan groups
per tile), so 32x32 stands; the knob remains for atypical scenes
(sky-dominated frames, very tall envmaps).

``RRT_TILE`` is "HxW" (e.g. ``RRT_TILE=16x64``); H*W must equal 1024 so
one tile stays one kernel block. Output is bit-identical across shapes:
tiling is a pure permutation that ``untile_order`` inverts, and per-lane
ray math never depends on tile membership (only the scanned-window /
visited-cluster sets change, which are value-neutral).
"""

from __future__ import annotations

import os

BLOCK_RAYS = 1024


def tile_shape() -> tuple[int, int]:
    spec = os.environ.get("RRT_TILE", "32x32")
    try:
        h, w = (int(v) for v in spec.lower().split("x"))
    except ValueError:
        raise ValueError(f"RRT_TILE={spec!r}: expected 'HxW', e.g. 16x64")
    if h * w != BLOCK_RAYS or h < 1 or w < 1:
        raise ValueError(
            f"RRT_TILE={spec!r}: H*W must be {BLOCK_RAYS} (one (8,128) "
            "kernel block per image tile)")
    return h, w
