#!/usr/bin/env python
"""Microbench: VPU Möller-Trumbore 8-tri sub-visit vs an MXU Woop-batch
formulation (dev tool; decides whether an RRT_WOOP kernel path is worth
building).

The candidate idea: a sub visit tests 8 triangles against the tile's
1024 rays. Per-triangle Woop transforms (world -> unit-triangle space)
make the transformed ray coords a LINEAR map of [o, 1, d]: one f32
matmul  (48, 8) @ (8, 1024) -> (48, 1024)  computes o'/d' xyz for all
8 tris at once on the MXU, leaving an elementwise epilogue
(t = -o'z/d'z, u = o'x + t d'x, v = o'y + t d'y, accept tests), a packed
(t|tri) roll-tree min over the 8 sublanes, payload selection, and a
(1,1024) -> (8,128) relayout back into ray-plane space.

Both kernels run V sub-visits per tile over the same ray planes with a
register-carried winner, mimicking kernels/intersect_pallas.tri_body
(defer-norms flavor: winner is (t, i, u, v)). Prints per-visit ns for
each and the ratio. Usage: python tools/mxu_mt_bench.py [V] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

_LANE = 128
R = 8
TMIN = 1e-3
BIG = 1e30


def _vpu_kernel(tri_ref, ox, oy, oz, dx, dy, dz, cu, out_t, out_i, *, V):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    c = cu[:]

    def tri_body(ti, tb, best):
        a0 = tri_ref[tb + 0]
        a1 = tri_ref[tb + 1]
        a2 = tri_ref[tb + 2]
        e10 = tri_ref[tb + 3]
        e11 = tri_ref[tb + 4]
        e12 = tri_ref[tb + 5]
        e20 = tri_ref[tb + 6]
        e21 = tri_ref[tb + 7]
        e22 = tri_ref[tb + 8]
        px = d_y * e22 - d_z * e21
        py = d_z * e20 - d_x * e22
        pz = d_x * e21 - d_y * e20
        det = e10 * px + e11 * py + e12 * pz
        accept = det * c > 0.0
        tvx = o_x - a0
        tvy = o_y - a1
        tvz = o_z - a2
        u_num = tvx * px + tvy * py + tvz * pz
        qx = tvy * e12 - tvz * e11
        qy = tvz * e10 - tvx * e12
        qz = tvx * e11 - tvy * e10
        v_num = d_x * qx + d_y * qy + d_z * qz
        t_num = e20 * qx + e21 * qy + e22 * qz
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        t = t_num * inv_det
        cond = (accept & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t >= TMIN))
        bt, bi, bu, bv = best
        upd = cond & (t < bt)
        return (jnp.where(upd, t, bt), jnp.where(upd, ti, bi),
                jnp.where(upd, u, bu), jnp.where(upd, v, bv))

    def visit(s, best):
        for k in range(8):
            best = tri_body(s * 8 + k, (s % 64) * 72 + k * 9, best)
        return best

    best = (jnp.full((R, _LANE), BIG), jnp.zeros((R, _LANE), jnp.int32),
            jnp.zeros((R, _LANE)), jnp.zeros((R, _LANE)))
    best = jax.lax.fori_loop(0, V, visit, best)
    out_t[:] = best[0]
    out_i[:] = best[1]


def _mxu_kernel(w_ref, rhs_ref, cu_ref, out_t, out_i, *, V):
    rhs = rhs_ref[:]          # (8, 1024): [ox oy oz 1 dx dy dz 0] rows
    cu = cu_ref[:]            # (8, 1024): cull sign per ray (lane layout)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 8 * _LANE), 0)

    def visit(s, best):
        lhs = w_ref[pl.ds((s % 64) * 48, 48), :]          # (48, 8)
        out = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        ox_, oy_, oz_ = out[0:8], out[8:16], out[16:24]
        dx_, dy_, dz_ = out[24:32], out[32:40], out[40:48]
        inv = 1.0 / dz_
        t = -oz_ * inv
        u = ox_ + t * dx_
        v = oy_ + t * dy_
        cond = ((dz_ * cu > 0.0) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0) & (t >= TMIN))
        tt = jnp.where(cond, t, BIG)
        # Packed (t | sublane) lexicographic min over the 8 tri sublanes
        # (t >= 0 so the f32 bit pattern is order-preserving; 3 mantissa
        # LSBs carry the tri-in-sub index).
        key = jnp.bitwise_or(
            jnp.bitwise_and(pltpu.bitcast(tt, jnp.int32), jnp.int32(~7)),
            sub_iota)
        for step in (4, 2, 1):
            key = jnp.minimum(key, pltpu.roll(key, step, axis=0))
        win = jnp.bitwise_and(key, jnp.int32(7))          # all sublanes ==
        sel = sub_iota == win
        zt = jnp.where(sel, tt, 0.0)
        zu = jnp.where(sel, u, 0.0)
        zv = jnp.where(sel, v, 0.0)
        for step in (4, 2, 1):
            zt = zt + pltpu.roll(zt, step, axis=0)
            zu = zu + pltpu.roll(zu, step, axis=0)
            zv = zv + pltpu.roll(zv, step, axis=0)
        # Relayout lane-space (any one sublane row, all equal) -> (8,128)
        # ray planes.
        rt = zt[0:1, :].reshape(R, _LANE)
        ru = zu[0:1, :].reshape(R, _LANE)
        rv = zv[0:1, :].reshape(R, _LANE)
        ri = (s * 8 + win)[0:1, :].reshape(R, _LANE)
        bt, bi, bu, bv = best
        upd = rt < bt
        return (jnp.where(upd, rt, bt), jnp.where(upd, ri, bi),
                jnp.where(upd, ru, bu), jnp.where(upd, rv, bv))

    best = (jnp.full((R, _LANE), BIG), jnp.zeros((R, _LANE), jnp.int32),
            jnp.zeros((R, _LANE)), jnp.zeros((R, _LANE)))
    best = jax.lax.fori_loop(0, V, visit, best)
    out_t[:] = best[0]
    out_i[:] = best[1]


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    V2 = V * 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rng = np.random.default_rng(0)

    tris = rng.normal(size=(64, 8, 3, 3)).astype(np.float32)
    a = tris[:, :, 0]
    e1 = tris[:, :, 1] - tris[:, :, 0]
    e2 = tris[:, :, 2] - tris[:, :, 0]
    tri_flat = np.concatenate([a, e1, e2], axis=-1).reshape(64 * 8 * 9)

    # Woop transforms: T = inv([e1 e2 n]) with n = cross(e2, e1) so that
    # d'_z = det_MT / |n|^2 (same culling sign as MT's det).
    n = np.cross(e2, e1)
    M = np.stack([e1, e2, n], axis=-1)            # (64, 8, 3, 3) columns
    Minv = np.linalg.inv(M)                       # (64, 8, 3, 3)
    b = -np.einsum("csij,csj->csi", Minv, a)      # translate a -> origin
    # LHS rows per sub: 6 outputs x 8 tris; K = [ox oy oz 1 dx dy dz 0].
    W = np.zeros((64, 48, 8), np.float32)
    for c in range(64):
        for s in range(8):
            for ax in range(3):                   # o'_x/y/z rows
                W[c, 0 + ax * 8 + s, 0:3] = Minv[c, s, ax]
                W[c, 0 + ax * 8 + s, 3] = b[c, s, ax]
                W[c, 24 + ax * 8 + s, 4:7] = Minv[c, s, ax]  # d'_x/y/z
    W = W.reshape(64 * 48, 8)

    o = rng.normal(size=(3, R, _LANE)).astype(np.float32) * 0.1
    d = rng.normal(size=(3, R, _LANE)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    cu = np.ones((R, _LANE), np.float32)

    rhs = np.zeros((8, R * _LANE), np.float32)
    for k in range(3):
        rhs[k] = o[k].reshape(-1)
        rhs[4 + k] = d[k].reshape(-1)
    rhs[3] = 1.0
    cu_wide = np.broadcast_to(cu.reshape(1, -1), (R, R * _LANE)).copy()

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )
    import functools
    def make(kern, gs, v):
        return jax.jit(pl.pallas_call(
            functools.partial(kern, V=v),
            grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((R, _LANE), jnp.float32),
                       jax.ShapeDtypeStruct((R, _LANE), jnp.int32)],
        ))
    vpu = make(_vpu_kernel, grid, V)
    vpu2 = make(_vpu_kernel, grid, V2)
    mxu_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )
    mxu = make(_mxu_kernel, mxu_grid, V)
    mxu2 = make(_mxu_kernel, mxu_grid, V2)

    args_v = (jnp.asarray(tri_flat),) + tuple(
        jnp.asarray(x) for x in (*o, *d, cu))
    args_m = (jnp.asarray(W), jnp.asarray(rhs), jnp.asarray(cu_wide))

    tv, tm = vpu, mxu
    rv = tv(*args_v)
    rm = tm(*args_m)
    jax.block_until_ready((rv, rm, vpu2(*args_v), mxu2(*args_m)))

    # Parity sanity: same winner t (Woop vs MT rounding differs; loose).
    vt, vi = np.asarray(rv[0]), np.asarray(rv[1])
    mt_, mi = np.asarray(rm[0]), np.asarray(rm[1])
    hit = vt < 1e29
    print(f"hits vpu={hit.mean():.3f} mxu={(mt_ < 1e29).mean():.3f} "
          f"t match={np.isclose(vt[hit], mt_[hit], rtol=1e-3).mean():.4f} "
          f"i match={(vi[hit] == mi[hit]).mean():.4f}")

    def med_ms(fn, args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] * 1e3

    # Per-call (relay/dispatch) overhead dominates absolute times here;
    # the per-visit cost is the SLOPE between V and 4V.
    for name, f1, f2, args in (("vpu", vpu, vpu2, args_v),
                               ("mxu", mxu, mxu2, args_m)):
        m1, m2 = med_ms(f1, args), med_ms(f2, args)
        print(f"{name}: slope {(m2 - m1) * 1e6 / (V2 - V):8.1f} ns/visit  "
              f"(V={V}: {m1:.3f} ms, V={V2}: {m2:.3f} ms)")


if __name__ == "__main__":
    main()
