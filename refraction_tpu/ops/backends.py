"""Intersection backends for the wavefront integrator.

Both implement the IntersectFn contract (integrator.py):
  (scene, origins, dirs, want_front, alive, tmin, tmax) -> (hit, t, tri_idx)

- ``xla_intersect``: pure-jnp brute force, tiled over rays with ``lax.map``
  so the fused Möller–Trumbore chain never materializes more than a
  (chunk, T) slab. Runs everywhere (CPU/TPU); the correctness baseline.
- the Pallas kernel backend lives in kernels/intersect_pallas.py and is
  selected via `get_backend('pallas')`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from refraction_tpu.ops.intersect import intersect_closest
from refraction_tpu.scene import Scene


def _pad_to(x, n, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    shape = (pad,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])


def xla_intersect(
    scene: Scene,
    origins,
    dirs,
    want_front,
    alive,
    tmin,
    tmax,
    chunk: int = 8192,
    ray_mask=None,
):
    """Brute-force closest hit, ray-tiled. alive is accepted but unused
    (dense evaluation; masking happens in the integrator).

    ``ray_mask`` ((N,) int32): DXR's per-TraceRay InstanceInclusionMask
    (RayTracing.hlsl:60) — a triangle is testable by a ray iff
    ``scene.tri_mask & ray_mask != 0``. None (the reference's constant
    0xff against all-visible instances) skips the test entirely."""
    del alive
    n = origins.shape[0]
    c = min(chunk, n)
    n_pad = ((n + c - 1) // c) * c

    o = _pad_to(origins, n_pad).reshape(-1, c, 3)
    d = _pad_to(dirs, n_pad, fill=1).reshape(-1, c, 3)
    wf = _pad_to(want_front, n_pad).reshape(-1, c)
    if ray_mask is not None:
        rm = _pad_to(jnp.asarray(ray_mask, jnp.int32), n_pad).reshape(-1, c)
        args = (o, d, wf, rm)
    else:
        args = (o, d, wf)

    def body(args):
        oo, dd, ww = args[0], args[1], args[2]
        return intersect_closest(
            oo, dd, scene.tri_a, scene.tri_e1, scene.tri_e2, tmin, tmax, ww,
            jnp,
            tri_mask=scene.tri_mask if ray_mask is not None else None,
            ray_mask=args[3] if ray_mask is not None else None,
        )

    hit, t, idx = jax.lax.map(body, args)
    return (
        hit.reshape(-1)[:n],
        t.reshape(-1)[:n],
        idx.reshape(-1)[:n],
        None,
    )


def xla_env_contribution(scene: Scene, dirs, weight):
    """Weighted miss contribution via plain-XLA gather (runs everywhere)."""
    from refraction_tpu.ops.shade import envmap_color

    env = envmap_color(dirs, scene.envmap, jnp)
    return jnp.where(weight[:, None] > 0, weight[:, None] * env, 0.0)


class Backend:
    """An intersect + env-shading implementation pair."""

    def __init__(self, name, intersect, env_contribution):
        self.name = name
        self.intersect = intersect
        self.env_contribution = env_contribution


def get_backend(name: str, cluster_size: int = 32,
                interpret: bool = False) -> Backend:
    """Resolve 'xla' | 'pallas' | 'auto' to a Backend."""
    del cluster_size
    if name == "auto":
        name = "pallas" if jax.default_backend() == "tpu" else "xla"
    if name == "xla":
        return Backend("xla", xla_intersect, xla_env_contribution)
    if name == "pallas":
        from refraction_tpu.kernels.envmap_pallas import pallas_env_contribution
        from refraction_tpu.kernels.intersect_pallas import pallas_intersect

        return Backend(
            "pallas",
            partial(pallas_intersect, interpret=interpret),
            partial(pallas_env_contribution, interpret=interpret),
        )
    raise ValueError(f"unknown intersect backend: {name}")
