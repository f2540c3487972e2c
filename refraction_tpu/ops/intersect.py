"""Möller–Trumbore closest-hit intersection, backend-generic (numpy / jnp).

This is the software replacement for DXR's hardware ``TraceRay`` BVH
traversal + triangle test (RayTracing.hlsl:60,106,121 — invisible in the
reference, provided by the driver). It doubles as the correctness oracle the
Pallas kernels are diffed against (SURVEY.md 4, property tests).

Facing / culling semantics (derived in SURVEY.md 1 + RayGen/ClosestHit flag
usage): with CCW-outward winding (Blender-exported fixtures), a hit is
*front-facing* iff ``dot(D, cross(e1, e2)) < 0``, which in Möller–Trumbore
terms is ``det = dot(e1, cross(D, e2)) > 0``. Rays with ``want_front`` cull
back faces (RAY_FLAG_CULL_BACK_FACING_TRIANGLES) and vice versa; the
integrator passes ``want_front = payload.outside`` (RayTracing.hlsl:60,106,121).

Ties (two triangles at exactly the same t) break to the lowest triangle
index in every backend (argmin-first), making results deterministic.
"""

from __future__ import annotations


def _cross(a, b, xp):
    return xp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def intersect_brute(origins, dirs, tri_a, tri_e1, tri_e2, tmin, tmax,
                    want_front, xp):
    """All-pairs closest hit.

    origins/dirs: (N, 3); tri_*: (T, 3); want_front: (N,) bool.
    Returns (hit (N,), t (N,), tri_idx (N,), u (N,), v (N,)).
    Memory: materializes (N, T) intermediates — chunk N at call sites.
    """
    f32 = xp.float32
    big = f32(3.0e38)

    d = dirs[:, None, :]                      # (N, 1, 3)
    pvec = _cross(d, tri_e2[None], xp)        # (N, T, 3)
    det = xp.sum(tri_e1[None] * pvec, axis=-1)
    accept = xp.where(want_front[:, None], det > 0, det < 0)

    safe_det = xp.where(det == 0, f32(1.0), det)
    inv_det = f32(1.0) / safe_det
    tvec = origins[:, None, :] - tri_a[None]
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = _cross(tvec, tri_e1[None], xp)
    v = xp.sum(d * qvec, axis=-1) * inv_det
    t = xp.sum(tri_e2[None] * qvec, axis=-1) * inv_det

    hit = (
        accept
        & (det != 0)
        & (u >= 0)
        & (v >= 0)
        & (u + v <= 1)
        & (t >= tmin)
        & (t <= tmax)
    )
    t_sel = xp.where(hit, t, big)
    idx = xp.argmin(t_sel, axis=1).astype(xp.int32)
    n = origins.shape[0]
    ar = xp.arange(n)
    t_best = t_sel[ar, idx]
    hit_any = t_best < big
    return hit_any, t_best, idx, u[ar, idx], v[ar, idx]


def intersect_closest(origins, dirs, tri_a, tri_e1, tri_e2, tmin, tmax,
                      want_front, xp, tri_mask=None, ray_mask=None):
    """Closest hit returning only (hit, t, tri_idx).

    Same math and acceptance rules as `intersect_brute`, but the only
    reductions over the triangle axis are min/argmin — on the XLA path this
    lets the whole Möller–Trumbore chain fuse into the reduction without
    materializing (N, T) attribute buffers. Barycentrics for the winning
    triangle are recomputed afterwards by `recompute_uv` (a per-ray gather).

    ``tri_mask`` ((T,) int) + ``ray_mask`` ((N,) int): DXR instance
    visibility — triangle j is testable by ray i iff
    ``tri_mask[j] & ray_mask[i] != 0`` (TraceRay's
    InstanceInclusionMask AND the instance's InstanceMask,
    RayTracing.hlsl:60). None/None skips the test.
    """
    f32 = xp.float32
    big = f32(3.0e38)

    d = dirs[:, None, :]
    pvec = _cross(d, tri_e2[None], xp)
    det = xp.sum(tri_e1[None] * pvec, axis=-1)
    accept = xp.where(want_front[:, None], det > 0, det < 0)
    if tri_mask is not None and ray_mask is not None:
        accept = accept & (
            (tri_mask[None, :] & ray_mask[:, None]) != 0)

    safe_det = xp.where(det == 0, f32(1.0), det)
    inv_det = f32(1.0) / safe_det
    tvec = origins[:, None, :] - tri_a[None]
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = _cross(tvec, tri_e1[None], xp)
    v = xp.sum(d * qvec, axis=-1) * inv_det
    t = xp.sum(tri_e2[None] * qvec, axis=-1) * inv_det

    hit = (
        accept & (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t >= tmin) & (t <= tmax)
    )
    t_sel = xp.where(hit, t, big)
    idx = xp.argmin(t_sel, axis=1).astype(xp.int32)
    t_best = xp.min(t_sel, axis=1)
    return t_best < big, t_best, idx


def recompute_uv(origins, dirs, tri_a, tri_e1, tri_e2, idx, xp):
    """Barycentrics (u, v) of each ray against its chosen triangle.

    One gathered triangle per ray; values match what `intersect_brute`
    reports for the same (ray, tri) pair up to float reassociation.
    """
    f32 = xp.float32
    a = tri_a[idx]
    e1 = tri_e1[idx]
    e2 = tri_e2[idx]
    pvec = _cross(dirs, e2, xp)
    det = xp.sum(e1 * pvec, axis=-1)
    inv_det = f32(1.0) / xp.where(det == 0, f32(1.0), det)
    tvec = origins - a
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = _cross(tvec, e1, xp)
    v = xp.sum(dirs * qvec, axis=-1) * inv_det
    return u, v


def closest_hit_chunked(origins, dirs, scene, tmin, tmax, want_front, xp,
                        chunk: int = 65536):
    """Brute force in ray chunks to bound the (chunk, T) intermediates.

    numpy path only (the jax path jits `intersect_brute` inside lax.map or
    uses the Pallas kernel); keeps the oracle usable at full resolutions.
    """
    import numpy as np

    n = origins.shape[0]
    hit = np.zeros(n, bool)
    t = np.zeros(n, np.float32)
    idx = np.zeros(n, np.int32)
    u = np.zeros(n, np.float32)
    v = np.zeros(n, np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        h_, t_, i_, u_, v_ = intersect_brute(
            origins[s:e], dirs[s:e], scene.tri_a, scene.tri_e1, scene.tri_e2,
            tmin, tmax, want_front[s:e], xp,
        )
        hit[s:e], t[s:e], idx[s:e], u[s:e], v[s:e] = h_, t_, i_, u_, v_
    return hit, t, idx, u, v
