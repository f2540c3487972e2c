"""Frame rendering: camera -> wavefront integrator -> image.

TPU-native equivalent of `RefractionDemo::drawFrame` (RefractionDemo.cpp:557-612)
minus the D3D plumbing: per frame, only the 4x4 unprojection matrix and the
3-vector camera origin cross the host->device boundary; ray generation,
tracing, shading and (optional) supersample accumulation all run inside one
jitted program. No per-frame sync is required (the reference stalls the
pipeline every frame, RefractionDemo.cpp:611 — SURVEY.md 2.4 point 2).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from refraction_tpu.camera import CameraFrame, generate_rays, orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.integrator import render_pixels
from refraction_tpu.ops.backends import get_backend
from refraction_tpu.scene import Scene


def sample_offsets(spp: int) -> np.ndarray:
    """Deterministic stratified sub-pixel offsets, (spp, 2) in [0,1).

    spp=1 reproduces the reference's pixel centers (RayTracing.hlsl:29).
    Square spp uses a k x k grid (BASELINE config 5: 4x supersampling =
    2x2); otherwise the first spp cells of the next square grid.
    """
    if spp == 1:
        return np.array([[0.5, 0.5]], np.float32)
    k = math.ceil(math.sqrt(spp))
    cells = [((i + 0.5) / k, (j + 0.5) / k) for j in range(k) for i in range(k)]
    return np.asarray(cells[:spp], np.float32)


def make_renderer(
    cfg: RenderConfig,
    intersect_fn: Callable | None = None,
) -> Callable[[Scene, CameraFrame], jnp.ndarray]:
    """Build a jitted (scene, frame) -> (H, W, 3) renderer for ``cfg``."""
    if intersect_fn is None:
        intersect_fn = get_backend(cfg.backend, cfg.cluster_size)
    offsets = sample_offsets(cfg.spp)
    inv_spp = np.float32(1.0 / cfg.spp)

    @jax.jit
    def _render(scene: Scene, proj_inv: jnp.ndarray, origin: jnp.ndarray):
        acc = jnp.zeros((cfg.height * cfg.width, 3), jnp.float32)
        for s in range(cfg.spp):
            frame = CameraFrame(origin=origin, proj_inv=proj_inv)
            jitter = jnp.broadcast_to(
                jnp.asarray(offsets[s]), (cfg.height * cfg.width, 2)
            )
            o, d = generate_rays(
                frame, cfg.width, cfg.height,
                jitter=None if cfg.spp == 1 else jitter, xp=jnp,
            )
            acc = acc + render_pixels(scene, o, d, cfg, intersect_fn)
        return (acc * inv_spp).reshape(cfg.height, cfg.width, 3)

    def render(scene: Scene, frame: CameraFrame) -> jnp.ndarray:
        return _render(
            scene,
            jnp.asarray(frame.proj_inv, jnp.float32),
            jnp.asarray(frame.origin, jnp.float32),
        )

    return render


def render_frame(
    scene: Scene,
    cfg: RenderConfig,
    angle: float = 0.01,
    frame: CameraFrame | None = None,
    intersect_fn: Callable | None = None,
) -> jnp.ndarray:
    """One-shot render (compiles on first use per (cfg, backend))."""
    if frame is None:
        frame = orbit_camera(angle, cfg)
    return make_renderer(cfg, intersect_fn)(scene, frame)


def rays_per_frame(cfg: RenderConfig) -> int:
    """Upper bound on traced rays per frame: sum of wavefront widths
    (the dense-slot count; the Mrays/s metric in bench.py divides actual
    *alive* lane-rounds instead — see utils/stats.py)."""
    n = cfg.width * cfg.height * cfg.spp
    total = 0
    w = 1
    for count in range(cfg.max_refract_depth + 1):
        total += w
        if count < cfg.max_reflect_depth:
            w *= 2
    return n * total


class Accumulator:
    """Progressive accumulation state (checkpoint/resume-able).

    The reference is stateless per frame except the orbit angle
    (RefractionDemo.cpp:555); for offline supersampled renders we keep an
    explicit (sum, count) state that can be saved/loaded mid-render
    (SURVEY.md 5, checkpoint/resume)."""

    def __init__(self, height: int, width: int):
        self.sum = np.zeros((height, width, 3), np.float64)
        self.count = 0

    def add(self, img: np.ndarray) -> None:
        self.sum += np.asarray(img, np.float64)
        self.count += 1

    @property
    def image(self) -> np.ndarray:
        return (self.sum / max(self.count, 1)).astype(np.float32)

    def save(self, path: str) -> None:
        np.savez(path, sum=self.sum, count=self.count)

    @classmethod
    def load(cls, path: str) -> "Accumulator":
        z = np.load(path)
        acc = cls(z["sum"].shape[0], z["sum"].shape[1])
        acc.sum = z["sum"]
        acc.count = int(z["count"])
        return acc
