#!/usr/bin/env python
"""Visit-volume statistics for the fused kernel's bounce tree (dev tool).

Simulates the exact slot-round structure of kernels/framekernel.py on a
strided sample of image tiles (numpy brute-force MT for ground truth) and
reports, per bounce round: live lanes, live 128-lane rows, and gated
subcluster-visit counts under several hypothetical execution layouts:

  tile   — what the kernel does today: per live slot, the union over the
           whole (8,128) tile of (cluster gate AND sub gate AND
           entry < lane cap) visits.
  rowpk  — row-packed: live 128-lane rows from ALL slots of the round
           packed 8-to-a-tile (in slot/row order), unions per packed tile.
  octpk  — lane-compacted: all live lanes of the round sorted by direction
           octant, packed 1024-to-a-tile, unions per packed tile.

Each visit costs ~8 MT tests over a full tile regardless of layout, so the
visit-count ratio IS the triangle-cost ratio. Usage:

    python tools/ottstats.py [scene.obj] [bounces] [tile_stride]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from refraction_tpu.camera import CameraFrame, generate_rays, orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.scene import SUB_TRIS, load_scene
from refraction_tpu.utils.tileshape import tile_shape

TILE_H, TILE_W = tile_shape()
_LANE = 128
_SUB = 8


def mt_closest(o, d, cull, tri_a, tri_e1, tri_e2, tmin, tmax):
    """Brute-force Möller-Trumbore closest hit: (N,) best t / index / (u,v)."""
    n = o.shape[0]
    best_t = np.full(n, tmax, np.float32)
    best_i = np.zeros(n, np.int64)
    best_u = np.zeros(n, np.float32)
    best_v = np.zeros(n, np.float32)
    T = tri_a.shape[0]
    for c0 in range(0, T, 2048):
        a = tri_a[c0:c0 + 2048]
        e1 = tri_e1[c0:c0 + 2048]
        e2 = tri_e2[c0:c0 + 2048]
        p = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("ntk,tk->nt", p, e1)
        tv = o[:, None, :] - a[None, :, :]
        u = np.einsum("ntk,ntk->nt", tv, p)
        q = np.cross(tv, e1[None, :, :])
        v = np.einsum("ntk,nk->nt", q, d)
        tt = np.einsum("ntk,tk->nt", q, e2)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            u = u * inv
            v = v * inv
            tt = tt * inv
        ok = ((det * cull[:, None] > 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1.0) & (tt >= tmin) & (tt < best_t[:, None]))
        tt = np.where(ok, tt, np.float32(np.inf))
        j = np.argmin(tt, axis=1)
        r = np.arange(n)
        upd = ok[r, j]
        best_t = np.where(upd, tt[r, j], best_t)
        best_i = np.where(upd, c0 + j, best_i)
        best_u = np.where(upd, u[r, j], best_u)
        best_v = np.where(upd, v[r, j], best_v)
    return best_t, best_i, best_u, best_v


def slab_overlap(o, d, lo, hi, tmin, cap):
    """(N_rays, N_box) conservative slab overlap with per-lane t cap."""
    eps = np.float32(1e-30)
    mag = np.maximum(np.abs(d), eps)
    inv = np.where(d < 0, -1.0 / mag, 1.0 / mag)
    a = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    b = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    enter = np.maximum(np.minimum(a, b).max(axis=2), tmin)
    leave = np.minimum(np.maximum(a, b).min(axis=2), cap[:, None])
    return (enter <= leave) & (enter < cap[:, None])


def visits_for(o, d, alive, caps, cb, sb, spc, tmin):
    """Gated (cluster, subcluster) visit counts for one ray group."""
    if not alive.any():
        return 0, 0
    oo, dd, cc = o[alive], d[alive], caps[alive]
    cmask = slab_overlap(oo, dd, cb[:, :3], cb[:, 3:], tmin, cc).any(axis=0)
    vis = 0
    for ci in np.nonzero(cmask)[0]:
        s = sb[ci * spc:(ci + 1) * spc]
        vis += int(slab_overlap(oo, dd, s[:, :3], s[:, 3:], tmin, cc)
                   .any(axis=0).sum())
    return int(cmask.sum()), vis


def sub_hit_t(o, d, cull, tri_a, tri_e1, tri_e2, tmin, tmax):
    """(N, T/8) best accepted hit t per ray per 8-tri subcluster
    (+inf where a sub holds no accepted hit for that ray)."""
    n, T = o.shape[0], tri_a.shape[0]
    out = np.full((n, T // SUB_TRIS), np.inf, np.float32)
    for c0 in range(0, T, 2048):
        a = tri_a[c0:c0 + 2048]
        e1 = tri_e1[c0:c0 + 2048]
        e2 = tri_e2[c0:c0 + 2048]
        p = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("ntk,tk->nt", p, e1)
        tv = o[:, None, :] - a[None, :, :]
        u = np.einsum("ntk,ntk->nt", tv, p)
        q = np.cross(tv, e1[None, :, :])
        v = np.einsum("ntk,nk->nt", q, d)
        tt = np.einsum("ntk,tk->nt", q, e2)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            u = u * inv
            v = v * inv
            tt = tt * inv
        ok = ((det * cull[:, None] > 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1.0) & (tt >= tmin) & (tt < tmax))
        tt = np.where(ok, tt, np.float32(np.inf))
        sl = slice(c0 // SUB_TRIS, (c0 + a.shape[0]) // SUB_TRIS)
        out[:, sl] = np.minimum(
            out[:, sl], tt.reshape(n, -1, SUB_TRIS).min(axis=2))
    return out


def kern_visits_seq(o, d, t_sub, cb, sb, spc, tmin, tmax, order,
                    sub_f2b=False, origin=None):
    """Emulate SEQUENTIAL sub-word gating: within a visited cluster the
    32-bit sub gating words are computed one at a time, each reading the
    caps as tightened by the PREVIOUS words' visits (the kernel today
    issues all of a cluster's sub words with cluster-entry caps — the
    unrolled n_groups<=4 path). ``sub_f2b`` additionally orders each
    cluster's subs front-to-back (per-frame argsort of sub-center
    distance from ``origin``) before wording them, so the near words
    tighten the caps the far words are gated with."""
    n = o.shape[0]
    caps = np.full(n, tmax, np.float32)
    c_vis = s_vis = 0
    for w0 in range(0, len(order), 32):
        word = order[w0:w0 + 32]
        bits = slab_overlap(o, d, cb[word, :3], cb[word, 3:], tmin,
                            caps).any(axis=0)
        for k in np.nonzero(bits)[0]:
            ci = word[k]
            c_vis += 1
            subs = np.arange(ci * spc, (ci + 1) * spc)
            if sub_f2b:
                sc = 0.5 * (sb[subs, :3] + sb[subs, 3:])
                subs = subs[np.argsort(
                    ((sc - origin[None, :]) ** 2).sum(axis=1))]
            for s0 in range(0, spc, 32):
                sw = subs[s0:s0 + 32]
                sbits = slab_overlap(o, d, sb[sw, :3], sb[sw, 3:], tmin,
                                     caps).any(axis=0)
                s_vis += int(sbits.sum())
                for si in sw[sbits]:
                    caps = np.minimum(caps, t_sub[:, si])
    return c_vis, s_vis


def cluster_hit_t(o, d, cull, tri_a, tri_e1, tri_e2, cs, tmin, tmax):
    """(N, C) best hit t per ray per cluster (tmax where none)."""
    n, C = o.shape[0], tri_a.shape[0] // cs
    out = np.full((n, C), tmax, np.float32)
    for ci in range(C):
        s = slice(ci * cs, (ci + 1) * cs)
        t, _, _, _ = mt_closest(o, d, cull, tri_a[s], tri_e1[s], tri_e2[s],
                                tmin, tmax)
        out[:, ci] = t
    return out


def kern_visits(o, d, cull, alive, t_lc, cb, sb, spc, tmin, tmax, order,
                seed_cl=None, word_stats=None):
    """Emulate the KERNEL's cap evolution: clusters visited in ``order``
    (the per-frame f2b table permutation) with word-granular (32) gate
    bits computed from the caps at word start; each visited cluster's
    sub word gated with the caps at cluster-visit time; caps tighten
    after each visited cluster by its ground-truth per-lane hit t.
    Returns (cluster_visits, sub_visits). ``seed_cl`` (per-lane parent
    cluster ids, -1 = none) prepends a seed phase visiting the union of
    parent clusters to tighten caps before the scan.

    ``word_stats`` (a 3-slot int array) accumulates, per visited
    cluster, hypothetical WORD-BOX pre-gate counters for the sub scan:
    [0] += sub words total, [1] += words whose 32-sub UNION box gates on
    (the words whose 32 slab tests a pre-gate would still run), [2] +=
    words with >=1 actual sub gate bit (the lower bound any conservative
    pre-gate can reach). Degenerate far-point pad boxes (lo == hi ==
    +BIG, scene.py cluster padding) are excluded from unions."""
    if not alive.any():
        return 0, 0
    oo, dd, cc = o[alive], d[alive], cull[alive]
    tl = t_lc[alive]
    caps = np.full(oo.shape[0], tmax, np.float32)
    c_vis = s_vis = 0

    def sub_visits_of(ci, caps):
        s = sb[ci * spc:(ci + 1) * spc]
        ov = slab_overlap(oo, dd, s[:, :3], s[:, 3:], tmin, caps).any(axis=0)
        if word_stats is not None and spc % 32 == 0:
            for w0 in range(0, spc, 32):
                sw = s[w0:w0 + 32]
                real = sw[:, 0] < 1e29  # exclude degenerate far-point pads
                word_stats[0] += 1
                if real.any():
                    lo = sw[real, :3].min(axis=0)[None]
                    hi = sw[real, 3:].max(axis=0)[None]
                    if bool(slab_overlap(oo, dd, lo, hi, tmin, caps)
                            .any()):
                        word_stats[1] += 1
                word_stats[2] += int(ov[w0:w0 + 32].any())
        return int(ov.sum())

    if seed_cl is not None:
        for ci in np.unique(seed_cl[alive]):
            if ci < 0:
                continue
            c_vis += 1
            s_vis += sub_visits_of(ci, caps)
            caps = np.minimum(caps, tl[:, ci])

    for w0 in range(0, len(order), 32):
        word = order[w0:w0 + 32]
        bits = slab_overlap(oo, dd, cb[word, :3], cb[word, 3:], tmin,
                            caps).any(axis=0)
        for k in np.nonzero(bits)[0]:
            ci = word[k]
            c_vis += 1
            s_vis += sub_visits_of(ci, caps)
            caps = np.minimum(caps, tl[:, ci])
    return c_vis, s_vis


def sub_bounds_at(tri_packed, g):
    """(T/g, 6) AABBs of g-triangle groups in table (cluster) order."""
    tp = tri_packed.reshape(-1, 9)
    a = tp[:, 0:3]
    corners = np.stack([a, a + tp[:, 3:6], a + tp[:, 6:9]], axis=1)
    lo = corners.min(axis=1).reshape(-1, g, 3).min(axis=1)
    hi = corners.max(axis=1).reshape(-1, g, 3).max(axis=1)
    return np.concatenate([lo, hi], axis=1)


def main():
    args = sys.argv[1:]
    scene_name = args[0] if args else "ott.obj"
    bounces = int(args[1]) if len(args) > 1 else 5
    stride = int(args[2]) if len(args) > 2 else 64
    cfg = RenderConfig(
        width=1920, height=1080,
        scene_path=os.path.join(
            os.environ.get("RRT_ASSET_DIR", "/root/reference"), scene_name),
        max_refract_depth=bounces, backend="auto")
    scene, meta = load_scene(cfg)
    cb = np.asarray(scene.cluster_bounds)
    sb = np.asarray(scene.sub_bounds)
    spc = sb.shape[0] // cb.shape[0]
    tp = np.asarray(scene.tri_packed)
    cs = tp.shape[0] // cb.shape[0]
    alt = {g: (sub_bounds_at(tp, g), cs // g) for g in (4, 16)}
    tri_a = np.asarray(scene.tri_a)
    tri_e1 = np.asarray(scene.tri_e1)
    tri_e2 = np.asarray(scene.tri_e2)
    tn = np.asarray(scene.tri_norm)

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
    ior, r0 = np.float32(cfg.ior), np.float32(cfg.fresnel_r0)

    # state per tile: pools of (n_slots*1024) rays
    tot = {k: np.zeros((bounces + 1,), np.int64)
           for k in ("live", "rows", "slots", "v_tile", "v_rowpk", "v_octpk",
                     "tiles_live", "c_vis", "v_sub4", "v_sub16", "v_nocap",
                     "v_kern", "c_kern", "v_seed", "c_seed",
                     "v_seqw", "v_f2bs", "w_tot", "w_on", "w_bits")}
    # Per-frame front-to-back cluster order (framekernel.front_to_back_
    # scene): ascending center distance from the camera origin.
    centers = 0.5 * (cb[:, :3] + cb[:, 3:])
    f2b = np.argsort(
        ((centers - np.asarray(frame.origin)[None, :3]) ** 2).sum(axis=1))

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
        ppar = np.full((n_slots * N,), -1, np.int64)  # parent cluster

        w_slots = 1
        for count in range(bounces + 1):
            is_last = count == bounces
            tmin = cfg.primary_tmin if count == 0 else cfg.secondary_tmin
            tmax = cfg.primary_tmax if count == 0 else cfg.secondary_tmax
            spawn_reflect = (not is_last) and count < cfg.max_reflect_depth

            # --- measure this round over live slots -------------------
            live_rows_all = []   # (slot, row) pairs with any live lane
            live_lane_idx = []   # global pool indices of live lanes
            any_live = False
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                alive = pc[seg] != 0.0
                if not alive.any():
                    continue
                any_live = True
                tot["slots"][count] += 1
                tot["live"][count] += int(alive.sum())
                rows = alive.reshape(-1, _LANE).any(axis=1)
                tot["rows"][count] += int(rows.sum())
                for ri in np.nonzero(rows)[0]:
                    live_rows_all.append((sl, ri))
                live_lane_idx.append(sl * N + np.nonzero(alive)[0])

            if not any_live:
                break
            tot["tiles_live"][count] += 1

            # ground-truth hits for caps + children
            bt = np.full(n_slots * N, tmax, np.float32)
            bi = np.zeros(n_slots * N, np.int64)
            bu = np.zeros(n_slots * N, np.float32)
            bv = np.zeros(n_slots * N, np.float32)
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                alive = pc[seg] != 0.0
                if not alive.any():
                    continue
                t_, i_, u_, v_ = mt_closest(
                    po[seg][alive], pd[seg][alive], pc[seg][alive],
                    tri_a, tri_e1, tri_e2, tmin, tmax)
                for arr, val in ((bt, t_), (bi, i_), (bu, u_), (bv, v_)):
                    tmp = arr[seg]
                    tmp[alive] = val
                    arr[seg] = tmp

            # visit counts: per-slot tiles (today) + alt sub granularity
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                alive = pc[seg] != 0.0
                cv, sv = visits_for(
                    po[seg], pd[seg], alive, bt[seg], cb, sb, spc, tmin)
                tot["c_vis"][count] += cv
                tot["v_tile"][count] += sv
                # No-improvability bound (caps = tmax): the real kernel's
                # word-granular gating sits between v_nocap (no pruning)
                # and v_tile (perfect per-lane caps known at scan start).
                # The v_nocap/v_tile gap bounds what better in-scan
                # capping (seeded best_t, finer words) could ever win.
                tot["v_nocap"][count] += visits_for(
                    po[seg], pd[seg], alive,
                    np.full_like(bt[seg], tmax), cb, sb, spc, tmin)[1]
                # Kernel-reality emulation: word-granular caps evolving
                # in f2b visit order (v_kern) — the real visit count is
                # THIS, not v_tile (perfect caps) — plus a parent-
                # cluster cap-seeding variant (v_seed).
                oo = po[seg][alive]
                dd_ = pd[seg][alive]
                cc = pc[seg][alive]
                ones = np.ones(int(alive.sum()), bool)
                tlc = cluster_hit_t(oo, dd_, cc, tri_a, tri_e1, tri_e2,
                                    cs, tmin, tmax)
                ws = np.zeros(3, np.int64)
                ck, vk = kern_visits(oo, dd_, cc, ones, tlc, cb, sb, spc,
                                     tmin, tmax, f2b, word_stats=ws)
                tot["c_kern"][count] += ck
                tot["v_kern"][count] += vk
                tot["w_tot"][count] += int(ws[0])
                tot["w_on"][count] += int(ws[1])
                tot["w_bits"][count] += int(ws[2])
                cs_, vs_ = kern_visits(oo, dd_, cc, ones, tlc, cb, sb,
                                       spc, tmin, tmax, f2b,
                                       seed_cl=ppar[seg][alive])
                tot["c_seed"][count] += cs_
                tot["v_seed"][count] += vs_
                if oo.shape[0] == 0:
                    continue
                tsub = sub_hit_t(oo, dd_, cc, tri_a, tri_e1, tri_e2,
                                 tmin, tmax)
                cam_o = np.asarray(frame.origin, np.float32)[:3]
                tot["v_seqw"][count] += kern_visits_seq(
                    oo, dd_, tsub, cb, sb, spc, tmin, tmax, f2b)[1]
                tot["v_f2bs"][count] += kern_visits_seq(
                    oo, dd_, tsub, cb, sb, spc, tmin, tmax, f2b,
                    sub_f2b=True, origin=cam_o)[1]
                for g, (sbg, spcg) in alt.items():
                    tot[f"v_sub{g}"][count] += visits_for(
                        po[seg], pd[seg], alive, bt[seg], cb, sbg, spcg,
                        tmin)[1]

            # row-packed: live rows from all slots, 8 per packed tile
            for g0 in range(0, len(live_rows_all), _SUB):
                sel = live_rows_all[g0:g0 + _SUB]
                idx = np.concatenate([
                    sl * N + ri * _LANE + np.arange(_LANE)
                    for sl, ri in sel])
                alive = pc[idx] != 0.0
                tot["v_rowpk"][count] += visits_for(
                    po[idx], pd[idx], alive, bt[idx], cb, sb, spc, tmin)[1]

            # octant lane-packed
            if live_lane_idx:
                idx = np.concatenate(live_lane_idx)
                dd = pd[idx]
                octant = ((dd[:, 0] > 0).astype(int)
                          + 2 * (dd[:, 1] > 0).astype(int)
                          + 4 * (dd[:, 2] > 0).astype(int))
                idx = idx[np.argsort(octant, kind="stable")]
                for g0 in range(0, len(idx), N):
                    gsel = idx[g0:g0 + N]
                    alive = np.ones(len(gsel), bool)
                    tot["v_octpk"][count] += visits_for(
                        po[gsel], pd[gsel], alive, bt[gsel], cb, sb, spc,
                        tmin)[1]

            if is_last:
                break

            # --- children (exact _slot_body semantics) ----------------
            for sl in range(w_slots):
                seg = slice(sl * N, (sl + 1) * N)
                o_, d_, cu, w_ = po[seg], pd[seg], pc[seg], pw[seg]
                alive = cu != 0.0
                t_ = bt[seg]
                hit = (t_ < tmax) & alive
                tri = bi[seg]
                a_n = tn[tri, 0]
                b_n = tn[tri, 1]
                c_n = tn[tri, 2]
                nsh = a_n + bu[seg][:, None] * (b_n - a_n) \
                    + bv[seg][:, None] * (c_n - a_n)
                nl = np.linalg.norm(nsh, axis=1, keepdims=True)
                nsh = nsh / np.maximum(nl, 1e-30)
                npr = nsh * np.sign(cu)[:, None]
                dot = np.einsum("nk,nk->n", d_, npr)
                base = 1.0 - dot
                fres = (r0 * (1 - r0)) * base ** 5
                hp = o_ + t_[:, None] * d_
                eta = np.where(cu > 0, 1.0 / ior, ior)
                k = 1.0 - eta * eta * (1.0 - dot * dot)
                ok = k >= 0
                coef = eta * dot + np.sqrt(np.maximum(k, 0))
                rd = eta[:, None] * d_ - coef[:, None] * npr
                rl = np.linalg.norm(rd, axis=1, keepdims=True)
                rd = rd / np.maximum(rl, 1e-30)
                f_alive = hit & ok
                if spawn_reflect:
                    seg2 = slice((sl + w_slots) * N, (sl + w_slots + 1) * N)
                    sd = d_ - 2 * dot[:, None] * npr
                    sl_ = np.linalg.norm(sd, axis=1, keepdims=True)
                    sd = sd / np.maximum(sl_, 1e-30)
                    po[seg2] = hp
                    pd[seg2] = np.where(hit[:, None], sd, 0)
                    pc[seg2] = np.where(hit, cu, 0)
                    pw[seg2] = np.where(hit, w_ * fres, 0)
                    ppar[seg2] = np.where(hit, tri // cs, -1)
                po[seg] = hp
                pd[seg] = np.where(f_alive[:, None], rd, 0)
                pc[seg] = np.where(f_alive, -cu, 0)
                pw[seg] = np.where(f_alive, w_ * (1 - fres), 0)
                ppar[seg] = np.where(f_alive, tri // cs, -1)
            if spawn_reflect:
                w_slots *= 2

    nt = len(tile_ids)
    print(f"# {scene_name} {bounces}-bounce, {nt} sampled tiles "
          f"(stride {stride}), cluster_size={meta.cluster_size}, "
          f"C={cb.shape[0]}, spc={spc}")
    print(f"{'cnt':>3} {'tiles':>5} {'slots':>5} {'live':>7} {'rows':>5} "
          f"{'c_vis':>6} {'v_tile':>7} {'v_rowpk':>7} {'v_octpk':>7} "
          f"{'v_sub4':>7} {'v_sub16':>7} {'v_nocap':>7} "
          f"{'c_kern':>6} {'v_kern':>7} {'c_seed':>6} {'v_seed':>7} "
          f"{'v_seqw':>7} {'v_f2bs':>7}")
    for c in range(bounces + 1):
        print(f"{c:>3} {tot['tiles_live'][c]:>5} {tot['slots'][c]:>5} "
              f"{tot['live'][c]:>7} {tot['rows'][c]:>5} "
              f"{tot['c_vis'][c]:>6} "
              f"{tot['v_tile'][c]:>7} {tot['v_rowpk'][c]:>7} "
              f"{tot['v_octpk'][c]:>7} {tot['v_sub4'][c]:>7} "
              f"{tot['v_sub16'][c]:>7} {tot['v_nocap'][c]:>7} "
              f"{tot['c_kern'][c]:>6} {tot['v_kern'][c]:>7} "
              f"{tot['c_seed'][c]:>6} {tot['v_seed'][c]:>7} "
              f"{tot['v_seqw'][c]:>7} {tot['v_f2bs'][c]:>7}")
    for k in ("c_vis", "v_tile", "v_rowpk", "v_octpk", "v_sub4", "v_sub16",
              "v_nocap", "c_kern", "v_kern", "c_seed", "v_seed",
              "v_seqw", "v_f2bs"):
        print(f"total {k}: {int(tot[k].sum())}")
    # tri tests per layout (the vector-cost proxy)
    print(f"tri tests: sub8={8 * int(tot['v_tile'].sum())} "
          f"sub4={4 * int(tot['v_sub4'].sum())} "
          f"sub16={16 * int(tot['v_sub16'].sum())}")
    # Word-box pre-gate EV (v_kern schedule): a word whose 32-sub union
    # box gates OFF could skip its whole 32-slab gate plane; w_on/w_tot
    # is the fraction of planes a pre-gate still runs, w_bits/w_tot the
    # floor any conservative pre-gate can reach.
    wt, won, wb = (int(tot[k].sum()) for k in ("w_tot", "w_on", "w_bits"))
    if wt:
        print(f"word pregate: words={wt} box_on={won} ({won / wt:.2f}) "
              f"anybit={wb} ({wb / wt:.2f})")
        per = " ".join(
            f"{c}:{tot['w_on'][c]}/{tot['w_tot'][c]}"
            for c in range(bounces + 1) if tot['w_tot'][c])
        print(f"word pregate per round (on/tot): {per}")


if __name__ == "__main__":
    main()
