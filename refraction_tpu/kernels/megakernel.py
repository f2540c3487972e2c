"""Fused wavefront megakernel: traverse + shade + envmap in one pass.

One Pallas call per bounce round does everything the reference's DXR
runtime + HLSL shaders do per TraceRay level (SURVEY.md 3.3):

  closest-hit traversal (intersect_pallas.traverse_tile)
    -> miss: weighted equirect envmap radiance (envmap_pallas window scan)
    -> hit:  interpolated normal, nonstandard-Schlick Fresnel, GLSL
             refraction with TIR (RayTracing.hlsl:66-123), producing the
             refraction child in-place and the reflection child's
             direction/weight for the integrator to append.

Between rounds the ray state never leaves the (rows, 128) SoA tile layout,
so the integrator is reduced to concatenations and a radiance
accumulation — no XLA elementwise glue, reshapes, or gathers at wavefront
widths. The inside/outside payload bit and liveness share one operand:
cull = +1 outside, -1 inside, 0 dead (N' = N * cull, eta selected by its
sign, children's cull derived by flip/copy, facing test det*cull > 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from refraction_tpu.kernels.envmap_pallas import env_window_tile
from refraction_tpu.kernels.intersect_pallas import (
    BLOCK_RAYS,
    GROUP,
    _LANE,
    _SUB,
    traverse_tile,
)

# limits_sm layout: [tmin, tmax, ior, fresnel_r0]
_N_LIMITS = 4


def _mega_kernel(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm, env_ref,
                 ox, oy, oz, dx, dy, dz, cull, wgt,
                 rad_r, rad_g, rad_b,
                 hx, hy, hz, fx, fy, fz, f_cull, f_wgt,
                 lx, ly, lz, l_cull, l_wgt,
                 best_t, best_i, best_nx, best_ny, best_nz,
                 cluster_size: int, env_h: int, env_w: int,
                 env_rows: int, want_reflect: bool = True,
                 want_children: bool = True):
    tmin = limits_sm[0]
    tmax = limits_sm[1]
    ior = limits_sm[2]
    r0 = limits_sm[3]
    num_clusters = cluster_sm.shape[0] // 6

    def tile(g, _):
        rows = pl.ds(g * _SUB, _SUB)
        cu = cull[rows, :]

        # Tile-level liveness gate: one roll-tree any() decides whether the
        # whole traversal + shading body runs. In late wavefront rounds
        # ~90% of tiles are fully dead and cost only this test + zeroing.
        acu = jnp.abs(cu)
        for s in (64, 32, 16, 8, 4, 2, 1):
            acu = jnp.maximum(acu, pltpu.roll(acu, s, axis=1))
        for s in (4, 2, 1):
            acu = jnp.maximum(acu, pltpu.roll(acu, s, axis=0))
        any_alive = acu[0, 0] > 0.0

        zero = jnp.zeros((_SUB, _LANE), jnp.float32)

        @pl.when(jnp.logical_not(any_alive))
        def _():
            refs = [rad_r, rad_g, rad_b]
            if want_children:
                refs += [hx, hy, hz, fx, fy, fz, f_cull, f_wgt]
                if want_reflect:
                    refs += [lx, ly, lz, l_cull, l_wgt]
            for ref in refs:
                ref[rows, :] = zero

        @pl.when(any_alive)
        def _():
            _live_tile(g, rows, cu)

        return 0

    def _live_tile(g, rows, cu):
        o_x, o_y, o_z = ox[rows, :], oy[rows, :], oz[rows, :]
        d_x, d_y, d_z = dx[rows, :], dy[rows, :], dz[rows, :]
        w = wgt[rows, :]
        alive = cu != 0.0

        traverse_tile(tmin, tmax, num_clusters, cluster_size,
                      tri_sm, norm_sm, cluster_sm, subs_sm,
                      o_x, o_y, o_z, d_x, d_y, d_z, cu,
                      best_t, best_i, best_nx, best_ny, best_nz)

        t = best_t[:]
        hit = (t < tmax) & alive
        miss = alive & ~hit

        # ---- Miss: weighted envmap radiance (RayTracing.hlsl:127-137) ----
        zero = jnp.zeros((_SUB, _LANE), jnp.float32)
        miss_w = jnp.where(miss, w, 0.0)

        def write_rad(r, g_, b):
            rad_r[rows, :] = r
            rad_g[rows, :] = g_
            rad_b[rows, :] = b

        # Gate the window scan on any-miss (roll-max as cheap any()).
        any_miss = miss_w
        for s in (64, 32, 16, 8, 4, 2, 1):
            any_miss = jnp.maximum(any_miss, pltpu.roll(any_miss, s, axis=1))
        for s in (4, 2, 1):
            any_miss = jnp.maximum(any_miss, pltpu.roll(any_miss, s, axis=0))

        write_rad(zero, zero, zero)

        @pl.when(any_miss[0, 0] > 0.0)
        def _():
            er, eg, eb = env_window_tile(
                d_x, d_y, d_z, miss_w > 0.0, env_ref, env_h, env_w, env_rows
            )
            write_rad(miss_w * er, miss_w * eg, miss_w * eb)

        # ---- Hit shading (RayTracing.hlsl:79-123) ------------------------
        if not want_children:
            return  # final round: hits at the depth cap contribute black
        # Interpolated shading normal, flipped to the ray's side via the
        # cull sign: N' = normalize(n) * cull  (cull=+1 outside, -1 inside).
        nx_, ny_, nz_ = best_nx[:], best_ny[:], best_nz[:]
        nlen2 = nx_ * nx_ + ny_ * ny_ + nz_ * nz_
        inv_nlen = jax.lax.rsqrt(jnp.maximum(nlen2, jnp.float32(1e-30))) * cu
        npx = nx_ * inv_nlen
        npy = ny_ * inv_nlen
        npz = nz_ * inv_nlen

        dot_dn = d_x * npx + d_y * npy + d_z * npz
        base = 1.0 - dot_dn
        b2 = base * base
        fres = (r0 * (1.0 - r0)) * b2 * b2 * base

        # Hit point (child ray origin; RayTracing.hlsl:88).
        hpx = o_x + t * d_x
        hpy = o_y + t * d_y
        hpz = o_z + t * d_z
        hx[rows, :] = jnp.where(hit, hpx, o_x)
        hy[rows, :] = jnp.where(hit, hpy, o_y)
        hz[rows, :] = jnp.where(hit, hpz, o_z)

        # Refraction (RayTracing.hlsl:70-76,95-108): eta by side.
        eta = jnp.where(cu > 0.0, 1.0 / ior, ior)
        k = 1.0 - eta * eta * (1.0 - dot_dn * dot_dn)
        refr_ok = k >= 0.0
        coef = eta * dot_dn + jnp.sqrt(jnp.maximum(k, 0.0))
        rx = eta * d_x - coef * npx
        ry = eta * d_y - coef * npy
        rz = eta * d_z - coef * npz
        rinv = jax.lax.rsqrt(
            jnp.maximum(rx * rx + ry * ry + rz * rz, jnp.float32(1e-30))
        )
        f_alive = hit & refr_ok
        fx[rows, :] = jnp.where(f_alive, rx * rinv, 0.0)
        fy[rows, :] = jnp.where(f_alive, ry * rinv, 1.0)
        fz[rows, :] = jnp.where(f_alive, rz * rinv, 0.0)
        # child flips inside<->outside: cull sign negates; dead lanes -> 0
        f_cull[rows, :] = jnp.where(f_alive, -cu, 0.0)
        f_wgt[rows, :] = jnp.where(f_alive, w * (1.0 - fres), 0.0)

        if want_reflect:
            # Reflection (RayTracing.hlsl:66-68,110-123): same side.
            sx = d_x - 2.0 * dot_dn * npx
            sy = d_y - 2.0 * dot_dn * npy
            sz = d_z - 2.0 * dot_dn * npz
            sinv = jax.lax.rsqrt(
                jnp.maximum(sx * sx + sy * sy + sz * sz, jnp.float32(1e-30))
            )
            lx[rows, :] = jnp.where(hit, sx * sinv, 0.0)
            ly[rows, :] = jnp.where(hit, sy * sinv, 1.0)
            lz[rows, :] = jnp.where(hit, sz * sinv, 0.0)
            # Explicit liveness: the reflection child is alive iff the
            # parent HIT (even under TIR, RayTracing.hlsl:110), keeping
            # the parent's side — never inferred from the weight, which
            # can underflow to 0 while the ray is alive.
            l_cull[rows, :] = jnp.where(hit, cu, 0.0)
            l_wgt[rows, :] = jnp.where(hit, w * fres, 0.0)

        return 0

    jax.lax.fori_loop(0, GROUP, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("env_h", "env_w", "want_reflect", "want_children",
                     "interpret"),
)
def mega_round(tri_packed, tri_norm_packed, cluster_bounds, sub_bounds,
               env_flat, limits, ox, oy, oz, dx, dy, dz, cull, wgt,
               env_h, env_w, want_reflect=True, want_children=True,
               interpret=False):
    """One wavefront bounce round over SoA (rows, 128) ray state.

    Returns (rad_rgb x3, [hit_p x3, refr x3, refr_cull, refr_wgt,
    [refl x3, refl_cull, refl_wgt]]) — all (rows, 128). With
    want_children=False (the final round, where hits contribute black)
    only radiance is produced. refl_cull is the reflection child's
    explicit liveness+side (spawned on every hit, RayTracing.hlsl:110)."""
    rows = ox.shape[0]
    grid = rows // (_SUB * GROUP)
    cluster_size = tri_packed.shape[0] // cluster_bounds.shape[0]
    env_rows = env_flat.shape[0] // 3

    spec = pl.BlockSpec((_SUB * GROUP, _LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)
    if not want_children:
        n_out = 3
        kern = _mega_kernel_missonly
    elif want_reflect:
        n_out = 16
        kern = _mega_kernel
    else:
        n_out = 11
        kern = _mega_kernel_norefl
    out_shape = tuple([f32] * n_out)

    res = pl.pallas_call(
        functools.partial(
            kern,
            cluster_size=cluster_size, env_h=env_h, env_w=env_w,
            env_rows=env_rows,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # limits (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tris flat
            pl.BlockSpec(memory_space=pltpu.SMEM),   # normals flat
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clusters flat
            pl.BlockSpec(memory_space=pltpu.SMEM),   # subclusters flat
            pl.BlockSpec(memory_space=pltpu.VMEM),   # env (3R, 128)
            spec, spec, spec, spec, spec, spec, spec, spec,
        ],
        out_specs=(spec,) * n_out,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.int32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(
        limits, tri_packed.reshape(-1), tri_norm_packed.reshape(-1),
        cluster_bounds.reshape(-1), sub_bounds.reshape(-1), env_flat,
        ox, oy, oz, dx, dy, dz, cull, wgt,
    )
    return res


def _mega_kernel_norefl(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm,
                        env_ref, ox, oy, oz, dx, dy, dz, cull, wgt,
                        rad_r, rad_g, rad_b,
                        hx, hy, hz, fx, fy, fz, f_cull, f_wgt,
                        best_t, best_i, best_nx, best_ny, best_nz,
                        cluster_size, env_h, env_w, env_rows):
    _mega_kernel(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm, env_ref,
                 ox, oy, oz, dx, dy, dz, cull, wgt,
                 rad_r, rad_g, rad_b,
                 hx, hy, hz, fx, fy, fz, f_cull, f_wgt,
                 None, None, None, None, None,
                 best_t, best_i, best_nx, best_ny, best_nz,
                 cluster_size=cluster_size, env_h=env_h, env_w=env_w,
                 env_rows=env_rows, want_reflect=False)


def _mega_kernel_missonly(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm,
                          env_ref, ox, oy, oz, dx, dy, dz, cull, wgt,
                          rad_r, rad_g, rad_b,
                          best_t, best_i, best_nx, best_ny, best_nz,
                          cluster_size, env_h, env_w, env_rows):
    _mega_kernel(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm, env_ref,
                 ox, oy, oz, dx, dy, dz, cull, wgt,
                 rad_r, rad_g, rad_b,
                 None, None, None, None, None, None, None, None,
                 None, None, None, None, None,
                 best_t, best_i, best_nx, best_ny, best_nz,
                 cluster_size=cluster_size, env_h=env_h, env_w=env_w,
                 env_rows=env_rows, want_reflect=False,
                 want_children=False)
