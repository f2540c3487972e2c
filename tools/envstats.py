#!/usr/bin/env python
"""Env-scan visit statistics: current per-(round,slot) scheme vs a
DEFERRED per-slot resolve (dev tool).

A miss kills its lane (framekernel._slot_body: f_alive = hit & refr_ok),
and slots are never respawned after the reflect-spawn rounds, so each
slot-lane misses AT MOST ONCE per sample. That makes env shading
deferrable: write pending (dir, weight) planes at miss time and resolve
once per slot after the last round. This tool quantifies what that saves,
on the exact bounce tree (numpy ground-truth MT), in scanned env ROWS —
the measured unit of env cost (TODO.md: envnoscan == noenv, i.e. ALL env
time is per-row gather/select visits):

  current:  primary round -> env_window_tile (full window, _SCAN_ROWS
            rows per group); secondary rounds -> env_window_accumulate
            (occupied 8-row groups only), per live (round, slot).
  deferred: ONE env_window_accumulate per slot over the union of its
            miss directions from all rounds (primary included).

Usage: python tools/envstats.py [scene.obj] [bounces] [tile_stride]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from refraction_tpu.camera import CameraFrame, generate_rays, orbit_camera
from refraction_tpu.config import REF_PI_ENVMAP, RenderConfig
from refraction_tpu.scene import load_scene
from refraction_tpu.utils.tileshape import tile_shape
from tools.ottstats import mt_closest

TILE_H, TILE_W = tile_shape()
_LANE = 128
_SCAN = 16  # env_window_tile _SCAN_ROWS
_SUB = 8    # env_window_accumulate group rows


def env_groups(d, env_h, env_w, packed4=True):
    """Occupied 8-row groups + [q_lo,q_hi] window of miss dirs d (N,3)."""
    theta = env_w * (np.arctan2(d[:, 0], d[:, 2]) / REF_PI_ENVMAP + 1) / 2
    phi = env_h * (np.arccos(np.clip(d[:, 1], -1, 1)) / REF_PI_ENVMAP)
    ix = np.clip(theta.astype(np.int32), 0, env_w - 1)
    iy = np.clip(phi.astype(np.int32), 0, env_h - 1)
    f = iy * env_w + ix
    fw = f >> 2 if packed4 else f
    q = fw // _LANE
    return q


def main():
    args = sys.argv[1:]
    scene_name = args[0] if args else "monkey.obj"
    bounces = int(args[1]) if len(args) > 1 else 4
    stride = int(args[2]) if len(args) > 2 else 16
    cfg = RenderConfig(
        width=1920, height=1080,
        scene_path=os.path.join(
            os.environ.get("RRT_ASSET_DIR", "/root/reference"), scene_name),
        max_refract_depth=bounces, backend="auto")
    scene, meta = load_scene(cfg)
    env_h, env_w = scene.envmap.shape[0], scene.envmap.shape[1]
    tri_a = np.asarray(scene.tri_a)
    tri_e1 = np.asarray(scene.tri_e1)
    tri_e2 = np.asarray(scene.tri_e2)
    tn = np.asarray(scene.tri_norm)
    ior, r0 = np.float32(cfg.ior), np.float32(cfg.fresnel_r0)

    frame = orbit_camera(0.1, cfg)
    o_all, d_all = generate_rays(
        CameraFrame(origin=np.asarray(frame.origin, np.float32),
                    proj_inv=np.asarray(frame.proj_inv, np.float32)),
        cfg.width, cfg.height, xp=np)
    o_all = o_all.reshape(cfg.height, cfg.width, 3)
    d_all = d_all.reshape(cfg.height, cfg.width, 3)

    tiles_x = cfg.width // TILE_W
    tiles_y = cfg.height // TILE_H
    tile_ids = list(range(0, tiles_x * tiles_y, stride))
    n_slots = 2 ** min(cfg.max_reflect_depth, bounces)

    rows_cur = 0       # scanned env rows, current scheme
    rows_def = 0       # scanned env rows, deferred scheme
    calls_cur = 0
    calls_def = 0
    vis_cur = 0
    vis_def = 0

    for tid in tile_ids:
        ty, tx = tid // tiles_x, tid % tiles_x
        o0 = o_all[ty * TILE_H:(ty + 1) * TILE_H,
                   tx * TILE_W:(tx + 1) * TILE_W].reshape(-1, 3)
        d0 = d_all[ty * TILE_H:(ty + 1) * TILE_H,
                   tx * TILE_W:(tx + 1) * TILE_W].reshape(-1, 3)
        N = o0.shape[0]
        po = np.zeros((n_slots * N, 3), np.float32)
        pd = np.zeros((n_slots * N, 3), np.float32)
        pc = np.zeros((n_slots * N,), np.float32)
        pw = np.zeros((n_slots * N,), np.float32)
        po[:N], pd[:N], pc[:N], pw[:N] = o0, d0, 1.0, 1.0

        pend = [[] for _ in range(n_slots)]  # deferred miss q's per slot

        w_slots = 1
        for count in range(bounces + 1):
            is_last = count == bounces
            tmin = cfg.primary_tmin if count == 0 else cfg.secondary_tmin
            tmax = cfg.primary_tmax if count == 0 else cfg.secondary_tmax
            spawn_reflect = (not is_last) and count < cfg.max_reflect_depth

            bt = np.full(n_slots * N, tmax, np.float32)
            bi = np.zeros(n_slots * N, np.int64)
            bu = np.zeros(n_slots * N, np.float32)
            bv = np.zeros(n_slots * N, np.float32)
            any_live = False
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                alive = pc[seg] != 0.0
                if not alive.any():
                    continue
                any_live = True
                t_, i_, u_, v_ = mt_closest(
                    po[seg][alive], pd[seg][alive], pc[seg][alive],
                    tri_a, tri_e1, tri_e2, tmin, tmax)
                for arr, val in ((bt, t_), (bi, i_), (bu, u_), (bv, v_)):
                    tmp = arr[seg]
                    tmp[alive] = val
                    arr[seg] = tmp

                # env accounting for this (round, slot)
                hit = (bt[seg] < tmax) & alive
                miss = alive & ~hit
                if miss.any():
                    q = env_groups(pd[seg][miss], env_h, env_w)
                    calls_cur += 1
                    if count == 0:
                        # env_window_tile: every _SCAN-row group in window
                        g = (q.max() // _SCAN - q.min() // _SCAN + 1)
                        rows_cur += int(g) * _SCAN
                        vis_cur += int(g)
                    else:
                        occ = np.unique(q // _SUB)
                        rows_cur += len(occ) * _SUB
                        vis_cur += len(occ)
                    pend[sl].append(q)

            if not any_live or is_last:
                break

            # children (exact _slot_body semantics)
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                o_, d_, cu, w_ = po[seg], pd[seg], pc[seg], pw[seg]
                alive = cu != 0.0
                t_ = bt[seg]
                hit = (t_ < tmax) & alive
                tri = bi[seg]
                a_n, b_n, c_n = tn[tri, 0], tn[tri, 1], tn[tri, 2]
                nsh = a_n + bu[seg][:, None] * (b_n - a_n) \
                    + bv[seg][:, None] * (c_n - a_n)
                nsh /= np.maximum(np.linalg.norm(nsh, axis=1, keepdims=True),
                                  1e-30)
                npr = nsh * np.sign(cu)[:, None]
                dot = np.einsum("nk,nk->n", d_, npr)
                fres = (r0 * (1 - r0)) * (1.0 - dot) ** 5
                hp = o_ + t_[:, None] * d_
                eta = np.where(cu > 0, 1.0 / ior, ior)
                k = 1.0 - eta * eta * (1.0 - dot * dot)
                ok = k >= 0
                coef = eta * dot + np.sqrt(np.maximum(k, 0))
                rd = eta[:, None] * d_ - coef[:, None] * npr
                rd /= np.maximum(np.linalg.norm(rd, axis=1, keepdims=True),
                                 1e-30)
                f_alive = hit & ok
                if spawn_reflect:
                    seg2 = slice((sl + w_slots) * N, (sl + w_slots + 1) * N)
                    sd = d_ - 2 * dot[:, None] * npr
                    sd /= np.maximum(
                        np.linalg.norm(sd, axis=1, keepdims=True), 1e-30)
                    po[seg2] = hp
                    pd[seg2] = np.where(hit[:, None], sd, 0)
                    pc[seg2] = np.where(hit, cu, 0)
                    pw[seg2] = np.where(hit, w_ * fres, 0)
                po[seg] = hp
                pd[seg] = np.where(f_alive[:, None], rd, 0)
                pc[seg] = np.where(f_alive, -cu, 0)
                pw[seg] = np.where(f_alive, w_ * (1 - fres), 0)
            if spawn_reflect:
                w_slots *= 2

        # deferred: one occupancy-gated resolve per slot over the union
        for sl in range(n_slots):
            if not pend[sl]:
                continue
            q = np.concatenate(pend[sl])
            occ = np.unique(q // _SUB)
            calls_def += 1
            rows_def += len(occ) * _SUB
            vis_def += len(occ)

    nt = len(tile_ids)
    print(f"# {scene_name} {bounces}-bounce, {nt} sampled tiles "
          f"(stride {stride}), env {env_w}x{env_h}")
    print(f"current:  calls={calls_cur} visits={vis_cur} "
          f"scanned_rows={rows_cur}")
    print(f"deferred: calls={calls_def} visits={vis_def} "
          f"scanned_rows={rows_def}")
    print(f"row ratio deferred/current: {rows_def / max(rows_cur, 1):.3f}")


if __name__ == "__main__":
    main()
