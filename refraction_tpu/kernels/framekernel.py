"""Whole-frame fused kernel: ONE Pallas call per frame.

The TPU-native equivalent of the reference's single ``DispatchRays`` per
frame (RefractionDemo.cpp:589-594): camera ray generation
(RayTracing.hlsl:27-40), the full bounded bounce *tree* (ClosestHit
recursion, RayTracing.hlsl:79-123), and envmap miss shading
(RayTracing.hlsl:127-137) all execute inside one kernel; only the final
per-pixel radiance is written to HBM.

Why this beats the round-per-call wavefront (integrator.render_pixels_mega):
the level-synchronous wavefront materializes every bounce round's ray state
in HBM — at 1080p that is ~31M ray slots/frame of which ~90% are dead, and
profiling shows the dead slots' DMA + gate + zero-write floor costs ~25 ms
of a 58 ms frame, plus ~13 ms of host dispatch/concat glue. Here the ray
tree of one 32x32 image tile (1024 pixels) lives entirely in VMEM scratch:

- slot s of a ``(n_slots*8, 128)`` pool holds the tile's ray front at the
  current depth; a refraction child overwrites its parent's slot, a
  reflection child lands at ``slot + width`` (the same static-shape
  flattening as integrator.py, but per-tile and on-chip);
- per-slot liveness is one roll-tree ``any()`` — a tile whose rays all
  died pays ~a dozen vector ops per remaining round instead of an HBM
  round-trip (wavefront compaction by construction);
- supersampling (spp) loops *inside* the kernel, so extra samples cost
  zero extra dispatches or HBM traffic (BASELINE config 5).

Traversal and envmap lookup reuse the exact tile primitives of the modular
kernels (intersect_pallas.traverse_tile, envmap_pallas.env_window_tile), so
oracle parity is inherited.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from refraction_tpu.kernels.envmap_pallas import (
    env_window_accumulate, env_window_addr, env_window_scan,
    env_window_tile)
from refraction_tpu.kernels.intersect_pallas import (
    _ABLATE, _LANE, _SUB, traverse_tile)

# Miss-shading path knob: "tile" = windowed full scan, "accumulate" =
# occupancy-gated scan, "auto" (default) picks per scene — small scenes
# have coherent miss windows where the plain scan's lower per-group cost
# wins (monkey 24.3 vs 25.6 ms); large scenes scatter refracted misses
# across the map and the gating pays for itself (ott 76.2 vs 78.1 ms).
_ENV_PATH = os.environ.get("RRT_ENV_PATH", "auto")

# Batched-slot rounds (RRT_SLOT_BATCH=1): trace a whole w-slot bounce
# round as ONE (w*8, 128) traversal instead of a rolled per-slot loop.
# The per-box gate reductions, per-visit scalar trips, and (streaming)
# cluster-record DMAs are paid once per round instead of once per live
# slot; the cost is that every visited candidate runs vector math over
# all w slots' rows even when some slots are dead (per-lane predicates
# make the results bit-identical either way — a dead or non-overlapping
# lane can never accept a candidate). Wins when >=2 slots are live with
# overlapping cluster visits (deep dielectric trees); measured per scene
# before flipping any default.
_SLOT_BATCH = os.environ.get("RRT_SLOT_BATCH", "0") != "0"

# Sample-batched bounce rounds (RRT_SPP_BATCH, default on): at spp > 1
# every slot's row block widens to (spp*8, 128) — all spp sub-pixel
# samples of a slot trace as ONE traversal. Unlike slot batching (whose
# slots are directionally DIVERGENT, so union gating explodes candidate
# volume), the spp samples of a pixel tile are jittered by <1 pixel:
# their gate sets are ~identical, so the per-box gate reductions, scalar
# visit trips, env window reductions and record DMAs are paid once per
# round instead of once per sample at ~zero extra candidate volume.
# Requires power-of-two spp (the liveness roll tree) and is mutually
# exclusive with RRT_SLOT_BATCH.
_SPP_BATCH = os.environ.get("RRT_SPP_BATCH", "1") != "0"

# Candidate geometry via a (T*9, 128) per-float broadcast VMEM table
# (RRT_TRI_VMEM): one aligned (SUB_TRIS*9, 128) vector load per sub
# visit replaces SUB_TRIS*9 scalar SMEM loads per visit — moves the
# candidate-data traffic off the scalar port. Only engages for resident
# scenes whose table fits RRT_TRI_VMEM_BUDGET bytes of VMEM (the table
# is 512 bytes/float: monkey's 1024-tri tier is 4.7 MB; ott's 13k-tri
# tier at 61 MB is far past it). The table is derived per frame from
# the (already f2b-permuted) tri_packed, so winner ids are unchanged.
_TRI_VMEM = os.environ.get("RRT_TRI_VMEM", "0") != "0"
_TRI_VMEM_BUDGET = int(os.environ.get("RRT_TRI_VMEM_BUDGET",
                                      str(6 * 2 ** 20)))

from refraction_tpu.utils.tileshape import tile_shape

TILE_H, TILE_W = tile_shape()

# scalars_sm layout (raygen + shading constants; jitter offsets follow):
# [0:9]   proj_inv rows 0..2 of columns (0, 1, 3)  (camera.py:126-130)
# [9:12]  camera origin xyz
# [12:16] tmin_primary, tmax_primary, tmin_secondary, tmax_secondary
# [16]    ior
# [17]    fresnel_r0
# [18:18+2*spp] per-sample sub-pixel jitter (x, y) pairs
_N_BASE_SCALARS = 18


def _frame_kernel(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm, env_ref,
                  out_r, out_g, out_b,
                  p_ox, p_oy, p_oz, p_dx, p_dy, p_dz, p_cull, p_wgt,
                  rad_r, rad_g, rad_b,
                  best_t, best_i, best_nx, best_ny, best_nz,
                  flags_sm,
                  *, cluster_size: int, env_h: int, env_w: int, env_rows: int,
                  width: int, height: int, tiles_x: int, group: int,
                  spp: int, max_refract: int, max_reflect: int,
                  n_slots: int, stream=None, n_supers: int = 0,
                  tile_stride: int = 1, n_tiles_real: int = 0,
                  tri_bc=None):
    # Under the hier (third bound level) layout, cluster_sm holds
    # [supers | padded clusters]; derive the true count from the shape.
    if n_supers > 1:
        num_clusters = (cluster_sm.shape[0] // 6 - n_supers)
    else:
        num_clusters = cluster_sm.shape[0] // 6
    i = pl.program_id(0)
    f32 = jnp.float32
    inv_spp = f32(1.0 / spp)
    # Slot row-block height: spp*8 under sample batching, else 8.
    batch_spp = (_SPP_BATCH and spp > 1 and (spp & (spp - 1)) == 0
                 and not _SLOT_BATCH)
    SR = spp * _SUB if batch_spp else _SUB

    tmin_p = scalars_sm[12]
    tmax_p = scalars_sm[13]
    tmin_s = scalars_sm[14]
    tmax_s = scalars_sm[15]
    ior = scalars_sm[16]
    r0 = scalars_sm[17]

    # Within-tile pixel coords: flat slot idx = sublane*128 + lane maps to
    # (py, px) = (idx // TILE_W, idx % TILE_W) — the layout render.tile_order
    # produces, so output blocks untile exactly like the wavefront path.
    idx = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0) * _LANE
           + jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1))
    py_l = idx // TILE_W
    px_l = idx % TILE_W

    def tile(g, _):
        # Multi-device pixel DP (parallel/sharding.make_fused_sharded_
        # renderer): shard d of S renders global tiles d, d+S, d+2S, ...
        # (round-robin over the frame so every chip gets a uniform slice
        # of the object's bounce tree). tile_stride == 1 is the
        # single-device layout; the shard base rides at the tail of the
        # scalar vector so the kernel arity is unchanged.
        if tile_stride == 1:
            tile_id = i * group + g
        else:
            base = scalars_sm[_N_BASE_SCALARS + 2 * spp].astype(jnp.int32)
            tile_id = (i * group + g) * tile_stride + base
        ty = tile_id // tiles_x
        tx = tile_id - ty * tiles_x
        gx0 = (tx * TILE_W + px_l).astype(f32)
        gy0 = (ty * TILE_H + py_l).astype(f32)

        rad_r[:] = jnp.zeros((_SUB, _LANE), f32)
        rad_g[:] = jnp.zeros((_SUB, _LANE), f32)
        rad_b[:] = jnp.zeros((_SUB, _LANE), f32)

        def do_samples():
            if spp == 1 or batch_spp:
                _sample(gx0, gy0, 0)
            else:
                # Rolled (not unrolled): a 4x statically-unrolled sample
                # loop measured 104 ms device for spp=4 monkey vs
                # 4 x 18.5 ms expected — program-size blowup hurts
                # Mosaic's scheduling. Jitter offsets index SMEM by the
                # traced sample id.
                def sample_body(s, _):
                    _sample(gx0, gy0, s)
                    return 0

                jax.lax.fori_loop(0, spp, sample_body, 0)

        if n_tiles_real:
            # Sharded grids pad the global tile count to a multiple of
            # the device count; pad tiles keep their zero radiance.
            @pl.when(tile_id < n_tiles_real)
            def _():
                do_samples()
        else:
            do_samples()

        rows = pl.ds(g * _SUB, _SUB)
        out_r[rows, :] = rad_r[:] * inv_spp
        out_g[rows, :] = rad_g[:] * inv_spp
        out_b[rows, :] = rad_b[:] * inv_spp
        return 0

    def _sample(gx0, gy0, s):
        # --- Ray generation (camera.py:98-135 / RayTracing.hlsl:27-40) ---
        def _ray_dirs(s_):
            jx = scalars_sm[_N_BASE_SCALARS + 2 * s_]
            jy = scalars_sm[_N_BASE_SCALARS + 2 * s_ + 1]
            sx = (gx0 + jx) / f32(width) * f32(2.0) - f32(1.0)
            sy = -((gy0 + jy) / f32(height) * f32(2.0) - f32(1.0))
            rx = scalars_sm[0] * sx + scalars_sm[1] * sy + scalars_sm[2]
            ry = scalars_sm[3] * sx + scalars_sm[4] * sy + scalars_sm[5]
            rz = scalars_sm[6] * sx + scalars_sm[7] * sy + scalars_sm[8]
            # no w-divide (RayTracing.hlsl:39)
            inv_len = f32(1.0) / jnp.sqrt(rx * rx + ry * ry + rz * rz)
            return rx * inv_len, ry * inv_len, rz * inv_len

        if batch_spp:
            # All spp samples' primaries fill slot 0's (spp*8, 128)
            # block — sample b at rows [b*8, (b+1)*8).
            for s_ in range(spp):
                dx_, dy_, dz_ = _ray_dirs(s_)
                p_dx[s_ * _SUB:(s_ + 1) * _SUB, :] = dx_
                p_dy[s_ * _SUB:(s_ + 1) * _SUB, :] = dy_
                p_dz[s_ * _SUB:(s_ + 1) * _SUB, :] = dz_
        else:
            dx_, dy_, dz_ = _ray_dirs(s)
            p_dx[0:_SUB, :] = dx_
            p_dy[0:_SUB, :] = dy_
            p_dz[0:_SUB, :] = dz_
        p_ox[0:SR, :] = jnp.broadcast_to(scalars_sm[9], (SR, _LANE))
        p_oy[0:SR, :] = jnp.broadcast_to(scalars_sm[10], (SR, _LANE))
        p_oz[0:SR, :] = jnp.broadcast_to(scalars_sm[11], (SR, _LANE))
        p_cull[0:SR, :] = jnp.ones((SR, _LANE), f32)
        p_wgt[0:SR, :] = jnp.ones((SR, _LANE), f32)
        if n_slots > 1:
            # Children slots start dead so the packed flags pass (below)
            # can always derive liveness from the whole pool.
            p_cull[SR:n_slots * SR, :] = jnp.zeros(
                ((n_slots - 1) * SR, _LANE), f32)

        # --- Bounce tree (integrator.py widths). Rounds 0..max_reflect
        # are statically unrolled (their slot width / env path / spawn
        # behavior differ); the MIDDLE rounds — counts in
        # [max_reflect, max_refract), where the front is a stable
        # 2^max_reflect slots wide, nothing spawns, and tmin/tmax are the
        # secondary constants — are textually IDENTICAL, so they run as
        # ONE rolled fori_loop body. That cuts the Mosaic program by the
        # three-or-so duplicated traversal+env+shading bodies (cold
        # compiles were ~7-10 min at 1080p; program size, not grid size,
        # was the driver — same effect as rolling the spp and slot
        # loops).
        #
        # Scalar-stall discipline (each vector->scalar reduction + branch
        # stalls the in-order core ~0.6 us, and they — not vector math —
        # set the per-tile floor): per bounce round there are exactly TWO
        # roll-tree reductions for a live tile (the packed all-slot
        # liveness flags, and the env row window inside env_window_tile's
        # batched call), and a tile whose rays all died skips the round on
        # scalar flag reads alone.
        def round_work(primary, w_slots, tmin, tmax, is_last, spawn_reflect):
            if not is_last:
                # Per-round any-hit-possible accumulator (slot bodies OR
                # in their traversal's `possible` scalar): when NO slot
                # of the round could have hit anything — the common case
                # for tiles whose frusta miss the scene — the packed
                # liveness reduction (a ~0.6 us vector->scalar drain) is
                # replaced by n_slots scalar zero-writes.
                flags_sm[n_slots] = 0
            if w_slots == 1:
                _slot_round(jnp.int32(0), w_slots, tmin, tmax, is_last,
                            spawn_reflect, alive_known=primary,
                            primary=primary)
            elif _SLOT_BATCH:
                _batched_body(w_slots, tmin, tmax, is_last, spawn_reflect)
            else:
                # Rolled (not unrolled) slot loop: one traversal body
                # per ROUND instead of one per slot — the statically
                # unrolled variant tripled program size and degraded
                # Mosaic's scheduling (same effect as the spp loop:
                # 104 -> 74.7 ms at spp=4 when rolled).
                def sl_body(sl, _):
                    _slot_round(sl, w_slots, tmin, tmax, is_last,
                                spawn_reflect, alive_known=False,
                                primary=primary)
                    return 0

                jax.lax.fori_loop(0, w_slots, sl_body, 0)
            if not is_last:
                @pl.when(flags_sm[n_slots] != 0)
                def _():
                    _flags_pass()

                @pl.when(flags_sm[n_slots] == 0)
                def _():
                    # No slot could have hit: every child was written
                    # dead (or its slot never lived), so all flags are
                    # zero by construction — write them directly.
                    for sl in range(n_slots):
                        flags_sm[sl] = 0

        def gated_round(primary, w_slots, tmin, tmax, is_last,
                        spawn_reflect):
            live = flags_sm[0]
            for sl in range(1, w_slots):
                live = live | flags_sm[sl]

            @pl.when(live != 0)
            def _():
                round_work(primary, w_slots, tmin, tmax, is_last,
                           spawn_reflect)

        w_slots = 1
        # Middle-round span: [max(max_reflect, 1), max_refract) — every
        # count there is secondary (tmin/tmax, env path, liveness gating
        # all count-independent), nothing spawns, and the front is a
        # stable width, so the rounds are textually identical and roll
        # into one fori body when there are >= 2 of them.
        mid_lo = max(min(max_reflect, max_refract), 1)
        roll_mid = max_refract - mid_lo >= 2
        for count in range(max_refract + 1):
            is_last = count == max_refract
            tmin = tmin_p if count == 0 else tmin_s
            tmax = tmax_p if count == 0 else tmax_s
            spawn_reflect = (not is_last) and count < max_reflect

            if roll_mid and mid_lo <= count < max_refract:
                if count == mid_lo:
                    def mid_body(c, _, w_slots=w_slots):
                        gated_round(False, w_slots, tmin_s, tmax_s,
                                    False, False)
                        return 0

                    jax.lax.fori_loop(mid_lo, max_refract, mid_body, 0)
                # later middle counts: already covered by the fori
            elif count == 0:
                round_work(True, w_slots, tmin, tmax, is_last,
                           spawn_reflect)
            else:
                gated_round(False, w_slots, tmin, tmax, is_last,
                            spawn_reflect)

            if spawn_reflect:
                w_slots *= 2

    def _flags_pass():
        # All slots' liveness in ONE reduction: tag each live lane with
        # its slot's bit, OR-reduce the whole pool, unpack to SMEM flags.
        cull_all = p_cull[0:n_slots * SR, :]
        row_slot = jax.lax.broadcasted_iota(
            jnp.int32, (n_slots * SR, _LANE), 0) // SR
        bits = jnp.where(cull_all != 0.0,
                         jnp.left_shift(jnp.int32(1), row_slot),
                         jnp.int32(0))
        for s in (64, 32, 16, 8, 4, 2, 1):
            bits = bits | pltpu.roll(bits, s, axis=1)
        st = n_slots * SR // 2
        while st >= 1:
            bits = bits | pltpu.roll(bits, st, axis=0)
            st //= 2
        word = bits[0, 0]
        for sl in range(n_slots):
            flags_sm[sl] = (word >> sl) & 1

    def _slot_round(slot, w_slots, tmin, tmax, is_last, spawn_reflect,
                    alive_known, primary):
        if alive_known:
            _slot_body(slot, w_slots, tmin, tmax, is_last, spawn_reflect,
                       primary)
            return

        @pl.when(flags_sm[slot] != 0)
        def _():
            _slot_body(slot, w_slots, tmin, tmax, is_last, spawn_reflect,
                       primary)

    def _slot_body(slot, w_slots, tmin, tmax, is_last, spawn_reflect,
                   primary):
        r = pl.ds(slot * SR, SR)  # slot may be traced (rolled loop)
        cu = p_cull[r, :]
        o_x, o_y, o_z = p_ox[r, :], p_oy[r, :], p_oz[r, :]
        d_x, d_y, d_z = p_dx[r, :], p_dy[r, :], p_dz[r, :]
        w = p_wgt[r, :]
        alive = cu != 0.0

        # Speculative primary env hoist: on the primary round the env
        # row window over ALL alive lanes is computed (and its roll
        # trees + scalar extracts ISSUED) before the traversal, so the
        # window drain overlaps the traversal's gate-plane vector work.
        # When the traversal then proves no lane could hit (possible ==
        # 0 — the majority of tiles when the object is small on screen)
        # the miss set IS the alive set and the scan below reuses this
        # window, skipping the post-traversal window drain entirely.
        env_tile = (_ENV_PATH == "tile"
                    or (_ENV_PATH == "auto" and primary))
        pre_env = primary and env_tile and "noenv" not in _ABLATE
        if pre_env:
            pq, pr_, psh, plo, phi = env_window_addr(
                d_x, d_y, d_z, alive, env_ref, env_h, env_w)

        # The depth-cap round only needs the hit/miss decision (hits
        # contribute black — RayTracing.hlsl:82): any-hit mode skips
        # winner index/normal tracking and self-drains.
        possible = traverse_tile(
            tmin, tmax, num_clusters, cluster_size,
            tri_sm, None, cluster_sm, subs_sm,
            o_x, o_y, o_z, d_x, d_y, d_z, cu,
            best_t, best_i, best_nx, best_ny, best_nz,
            any_hit=is_last, stream=stream, norm_vmem=norm_vmem,
            num_supers=n_supers, tri_bcast=tri_bc)

        t = best_t[0:SR, :]
        hit = (t < tmax) & alive
        miss = alive & ~hit

        # Miss shading (RayTracing.hlsl:127-137). The occupancy-gated
        # scan's window is empty when no lane misses, so it self-gates —
        # no any-miss reduction needed. Per-slot (not batched across
        # slots): a batched (32,128) scan over the UNION window of four
        # diverged slots measured ~10 ms/frame slower.
        miss_w = jnp.where(miss, w, 0.0)

        def _fold(v):
            # Sample-batched: fold the (spp*8, 128) block into the
            # per-pixel (8, 128) accumulator, ascending.
            out = v[0:_SUB, :]
            for b in range(1, SR // _SUB):
                out = out + v[b * _SUB:(b + 1) * _SUB, :]
            return out

        def _env_add(er, eg, eb):
            rad_r[:] = rad_r[:] + _fold(miss_w * er)
            rad_g[:] = rad_g[:] + _fold(miss_w * eg)
            rad_b[:] = rad_b[:] + _fold(miss_w * eb)

        # "auto": primary misses (count 0) are angularly coherent — the
        # plain windowed scan's lower per-group cost wins; refracted
        # misses (count > 0) scatter across the map — occupancy gating
        # collapses the wide window to the occupied groups.
        if "noenv" not in _ABLATE:
            if pre_env:
                @pl.when(possible == 0)
                def _env_premiss():
                    # Every alive lane missed: reuse the hoisted window.
                    _env_add(*env_window_scan(
                        pq, pr_, psh, plo, phi, alive, env_ref, env_rows))

                @pl.when(possible != 0)
                def _env_hit_tile():
                    _env_add(*env_window_tile(
                        d_x, d_y, d_z, miss_w > 0.0, env_ref,
                        env_h, env_w, env_rows))
            elif env_tile:
                _env_add(*env_window_tile(
                    d_x, d_y, d_z, miss_w > 0.0, env_ref,
                    env_h, env_w, env_rows))
            else:
                env_window_accumulate(
                    d_x, d_y, d_z, miss_w, env_ref, env_h, env_w, env_rows,
                    rad_r, rad_g, rad_b)

        if is_last:
            return  # hits at the depth cap contribute black (hlsl:82)

        flags_sm[n_slots] = flags_sm[n_slots] | jnp.where(
            possible != 0, jnp.int32(1), jnp.int32(0))

        # Children die by default (two unconditional vector zero-stores
        # — cheaper than a second pl.when region); the shade branch
        # overwrites them when a hit is possible. The loaded cu/w/d_*
        # values above predate these stores, so the shade math is
        # unaffected.
        z = jnp.zeros((SR, _LANE), jnp.float32)
        p_cull[pl.ds(slot * SR, SR), :] = z
        if spawn_reflect:
            p_cull[pl.ds((slot + w_slots) * SR, SR), :] = z

        @pl.when(possible != 0)
        def _shade_and_spawn():
            # Hit shading (RayTracing.hlsl:79-123) — identical math to
            # megakernel._mega_kernel, but children stay in the VMEM pool.
            nx_ = best_nx[0:SR, :]
            ny_ = best_ny[0:SR, :]
            nz_ = best_nz[0:SR, :]
            nlen2 = nx_ * nx_ + ny_ * ny_ + nz_ * nz_
            inv_nlen = jax.lax.rsqrt(jnp.maximum(nlen2, jnp.float32(1e-30))) * cu
            npx = nx_ * inv_nlen
            npy = ny_ * inv_nlen
            npz = nz_ * inv_nlen

            dot_dn = d_x * npx + d_y * npy + d_z * npz
            base = 1.0 - dot_dn
            b2 = base * base
            fres = (r0 * (1.0 - r0)) * b2 * b2 * base

            hpx = jnp.where(hit, o_x + t * d_x, o_x)
            hpy = jnp.where(hit, o_y + t * d_y, o_y)
            hpz = jnp.where(hit, o_z + t * d_z, o_z)

            # Refraction child in place (hlsl:70-76,95-108).
            eta = jnp.where(cu > 0.0, 1.0 / ior, ior)
            k = 1.0 - eta * eta * (1.0 - dot_dn * dot_dn)
            refr_ok = k >= 0.0
            coef = eta * dot_dn + jnp.sqrt(jnp.maximum(k, 0.0))
            rx = eta * d_x - coef * npx
            ry = eta * d_y - coef * npy
            rz = eta * d_z - coef * npz
            rinv = jax.lax.rsqrt(
                jnp.maximum(rx * rx + ry * ry + rz * rz, jnp.float32(1e-30)))
            f_alive = hit & refr_ok

            r = pl.ds(slot * SR, SR)
            p_ox[r, :] = hpx
            p_oy[r, :] = hpy
            p_oz[r, :] = hpz
            p_dx[r, :] = jnp.where(f_alive, rx * rinv, 0.0)
            p_dy[r, :] = jnp.where(f_alive, ry * rinv, 1.0)
            p_dz[r, :] = jnp.where(f_alive, rz * rinv, 0.0)
            p_cull[r, :] = jnp.where(f_alive, -cu, 0.0)
            p_wgt[r, :] = jnp.where(f_alive, w * (1.0 - fres), 0.0)

            if spawn_reflect:
                # Reflection child at slot + width (hlsl:66-68,110-123),
                # spawned on EVERY hit (even under TIR), keeping the parent's
                # side; liveness is the explicit hit mask.
                r2 = pl.ds((slot + w_slots) * SR, SR)
                sx_ = d_x - 2.0 * dot_dn * npx
                sy_ = d_y - 2.0 * dot_dn * npy
                sz_ = d_z - 2.0 * dot_dn * npz
                sinv = jax.lax.rsqrt(
                    jnp.maximum(sx_ * sx_ + sy_ * sy_ + sz_ * sz_,
                                jnp.float32(1e-30)))
                p_ox[r2, :] = hpx
                p_oy[r2, :] = hpy
                p_oz[r2, :] = hpz
                p_dx[r2, :] = jnp.where(hit, sx_ * sinv, 0.0)
                p_dy[r2, :] = jnp.where(hit, sy_ * sinv, 1.0)
                p_dz[r2, :] = jnp.where(hit, sz_ * sinv, 0.0)
                # Liveness is the explicit hit mask (spawned on EVERY hit,
                # even under TIR — RayTracing.hlsl:110).
                p_cull[r2, :] = jnp.where(hit, cu, 0.0)
                p_wgt[r2, :] = jnp.where(hit, w * fres, 0.0)

    def _batched_body(w_slots, tmin, tmax, is_last, spawn_reflect):
        """RRT_SLOT_BATCH round: the whole w-slot front as ONE (w*8, 128)
        traversal. Identical per-lane math to the per-slot path (_slot_
        body) — union gating only adds candidate tests that each lane's
        own predicates reject — so the output is bit-identical; what
        changes is the cost split (one set of gate reductions / scalar
        trips / record DMAs per round, vector work over all w slots'
        rows). Env miss shading stays per slot (a batched union-window
        env scan measured ~10 ms/frame slower) and dead slots skip it on
        their scalar flag."""
        R = w_slots * _SUB
        r = pl.ds(0, R)
        cu = p_cull[r, :]
        o_x, o_y, o_z = p_ox[r, :], p_oy[r, :], p_oz[r, :]
        d_x, d_y, d_z = p_dx[r, :], p_dy[r, :], p_dz[r, :]
        w = p_wgt[r, :]
        alive = cu != 0.0

        possible = traverse_tile(
            tmin, tmax, num_clusters, cluster_size,
            tri_sm, None, cluster_sm, subs_sm,
            o_x, o_y, o_z, d_x, d_y, d_z, cu,
            best_t, best_i, best_nx, best_ny, best_nz,
            any_hit=is_last, stream=stream, norm_vmem=norm_vmem,
            num_supers=n_supers, tri_bcast=tri_bc)

        t = best_t[0:R, :]
        hit = (t < tmax) & alive
        miss = alive & ~hit

        miss_w = jnp.where(miss, w, 0.0)
        env_tile = _ENV_PATH == "tile"  # batched rounds have count >= 1
        if "noenv" not in _ABLATE:
            for s in range(w_slots):
                lo, hi = s * _SUB, (s + 1) * _SUB

                @pl.when(flags_sm[s] != 0)
                def _(s=s, lo=lo, hi=hi):
                    if env_tile:
                        er, eg, eb = env_window_tile(
                            d_x[lo:hi], d_y[lo:hi], d_z[lo:hi],
                            miss_w[lo:hi] > 0.0, env_ref,
                            env_h, env_w, env_rows)
                        rad_r[:] = rad_r[:] + miss_w[lo:hi] * er
                        rad_g[:] = rad_g[:] + miss_w[lo:hi] * eg
                        rad_b[:] = rad_b[:] + miss_w[lo:hi] * eb
                    else:
                        env_window_accumulate(
                            d_x[lo:hi], d_y[lo:hi], d_z[lo:hi],
                            miss_w[lo:hi], env_ref, env_h, env_w,
                            env_rows, rad_r, rad_g, rad_b)

        if is_last:
            return

        flags_sm[n_slots] = flags_sm[n_slots] | jnp.where(
            possible != 0, jnp.int32(1), jnp.int32(0))

        z = jnp.zeros((R, _LANE), jnp.float32)
        p_cull[r, :] = z
        if spawn_reflect:
            p_cull[pl.ds(R, R), :] = z

        @pl.when(possible != 0)
        def _shade_and_spawn():
            # Hit shading — same expressions as _slot_body, over all R rows.
            nx_, ny_, nz_ = best_nx[0:R, :], best_ny[0:R, :], best_nz[0:R, :]
            nlen2 = nx_ * nx_ + ny_ * ny_ + nz_ * nz_
            inv_nlen = jax.lax.rsqrt(jnp.maximum(nlen2, jnp.float32(1e-30))) * cu
            npx = nx_ * inv_nlen
            npy = ny_ * inv_nlen
            npz = nz_ * inv_nlen

            dot_dn = d_x * npx + d_y * npy + d_z * npz
            base = 1.0 - dot_dn
            b2 = base * base
            fres = (r0 * (1.0 - r0)) * b2 * b2 * base

            hpx = jnp.where(hit, o_x + t * d_x, o_x)
            hpy = jnp.where(hit, o_y + t * d_y, o_y)
            hpz = jnp.where(hit, o_z + t * d_z, o_z)

            eta = jnp.where(cu > 0.0, 1.0 / ior, ior)
            k = 1.0 - eta * eta * (1.0 - dot_dn * dot_dn)
            refr_ok = k >= 0.0
            coef = eta * dot_dn + jnp.sqrt(jnp.maximum(k, 0.0))
            rx = eta * d_x - coef * npx
            ry = eta * d_y - coef * npy
            rz = eta * d_z - coef * npz
            rinv = jax.lax.rsqrt(
                jnp.maximum(rx * rx + ry * ry + rz * rz, jnp.float32(1e-30)))
            f_alive = hit & refr_ok

            p_ox[r, :] = hpx
            p_oy[r, :] = hpy
            p_oz[r, :] = hpz
            p_dx[r, :] = jnp.where(f_alive, rx * rinv, 0.0)
            p_dy[r, :] = jnp.where(f_alive, ry * rinv, 1.0)
            p_dz[r, :] = jnp.where(f_alive, rz * rinv, 0.0)
            p_cull[r, :] = jnp.where(f_alive, -cu, 0.0)
            p_wgt[r, :] = jnp.where(f_alive, w * (1.0 - fres), 0.0)

            if spawn_reflect:
                # Reflection children of slots [0, w) land at slots
                # [w, 2w) — rows [R, 2R), contiguous.
                r2 = pl.ds(R, R)
                sx_ = d_x - 2.0 * dot_dn * npx
                sy_ = d_y - 2.0 * dot_dn * npy
                sz_ = d_z - 2.0 * dot_dn * npz
                sinv = jax.lax.rsqrt(
                    jnp.maximum(sx_ * sx_ + sy_ * sy_ + sz_ * sz_,
                                jnp.float32(1e-30)))
                p_ox[r2, :] = hpx
                p_oy[r2, :] = hpy
                p_oz[r2, :] = hpz
                p_dx[r2, :] = jnp.where(hit, sx_ * sinv, 0.0)
                p_dy[r2, :] = jnp.where(hit, sy_ * sinv, 1.0)
                p_dz[r2, :] = jnp.where(hit, sz_ * sinv, 0.0)
                p_cull[r2, :] = jnp.where(hit, cu, 0.0)
                p_wgt[r2, :] = jnp.where(hit, w * fres, 0.0)

    jax.lax.fori_loop(0, group, tile, 0)


def _frame_kernel_coded(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm,
                        env_codes, env_lut, *rest, **kw):
    """Code-packed-envmap arity adapter (resident geometry): the env
    operand is the (codes, lut) pair instead of the 3-plane f32 map."""
    _frame_kernel(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm,
                  (env_codes, env_lut), *rest, **kw)


def _frame_kernel_bcast(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm,
                        tri_bc, env_ref, *rest, **kw):
    """RRT_TRI_VMEM arity adapter: the broadcast geometry table rides
    between the SMEM tables and the env operand(s)."""
    _frame_kernel(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm,
                  env_ref, *rest, tri_bc=tri_bc, **kw)


def _frame_kernel_bcast_coded(scalars_sm, tri_sm, norm_vmem, cluster_sm,
                              subs_sm, tri_bc, env_codes, env_lut, *rest,
                              **kw):
    """RRT_TRI_VMEM + code-packed envmap."""
    _frame_kernel(scalars_sm, tri_sm, norm_vmem, cluster_sm, subs_sm,
                  (env_codes, env_lut), *rest, tri_bc=tri_bc, **kw)


def _frame_kernel_streamed(scalars_sm, records, cluster_sm, norm_vmem,
                           env_ref, *rest, **kw):
    """Streamed-geometry arity adapter: triangle/subcluster data arrives
    per visited cluster via HBM->SMEM DMA (traverse_tile stream mode)
    instead of SMEM-resident tables; normals resolve from the VMEM gather
    table like the resident path."""
    *mid, rec_scratch, dma_sems = rest
    _frame_kernel(scalars_sm, None, norm_vmem, cluster_sm, None, env_ref,
                  *mid, stream=(records, rec_scratch, dma_sems), **kw)


def _frame_kernel_streamed_coded(scalars_sm, records, cluster_sm, norm_vmem,
                                 env_codes, env_lut, *rest, **kw):
    """Streamed geometry + code-packed envmap."""
    *mid, rec_scratch, dma_sems = rest
    _frame_kernel(scalars_sm, None, norm_vmem, cluster_sm, None,
                  (env_codes, env_lut),
                  *mid, stream=(records, rec_scratch, dma_sems), **kw)


def _pick_group(n_tiles: int) -> int:
    forced = os.environ.get("RRT_FRAME_GROUP")  # sweep knob
    if forced:
        g = int(forced)
        assert n_tiles % g == 0, (n_tiles, g)
        return g
    for g in (16, 8, 4, 2, 1):
        if n_tiles % g == 0:
            return g
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_refract", "max_reflect",
                     "env_h", "env_w", "interpret", "cluster_size",
                     "tile_stride", "n_tiles_local", "n_tiles_real"),
)
def frame_call(tri_packed, tri_norm_vmem, cluster_bounds, sub_bounds,
               env_flat, scalars, width, height, spp, max_refract,
               max_reflect, env_h, env_w, interpret=False,
               cluster_records=None, cluster_size=None,
               env_codes=None, env_lut=None,
               tile_stride=1, n_tiles_local=None, n_tiles_real=0):
    """Render one frame fully on-device; returns (r, g, b) tile-order
    (rows, 128) radiance planes for an image padded to whole
    TILE_H x TILE_W tiles (default 32x32, RRT_TILE).

    ``scalars`` is the flat float32 vector described at the top of this
    module (camera + limits + jitter). width/height are the *unpadded*
    image dims (raygen NDC scale); the output covers the padded grid.
    ``tri_norm_vmem`` is the scene's (9*Rn, 128) normal gather table
    (deferred winner-normal resolve) — used by both modes.

    Pass ``cluster_records`` (scene.cluster_records) with tri_packed /
    sub_bounds set to None to select the size-agnostic streaming path:
    triangle data lives in HBM and visited clusters are DMA'd into a
    16-slot SMEM ring (traverse_tile stream mode) — for scenes whose
    tables exceed the SMEM budget.

    Multi-device pixel DP (``tile_stride`` > 1, set by
    parallel.sharding.make_fused_sharded_renderer): this call renders
    ``n_tiles_local`` tiles — global tile ids ``j * tile_stride + base``
    with the shard base appended to ``scalars`` at index
    ``_N_BASE_SCALARS + 2*spp`` — and ``n_tiles_real`` gates off the
    round-up padding tiles (their output rows stay zero).
    """
    streamed = tri_packed is None
    assert (not streamed) or cluster_size is not None, (
        "streamed mode needs an explicit static cluster_size")
    h_pad = ((height + TILE_H - 1) // TILE_H) * TILE_H
    w_pad = ((width + TILE_W - 1) // TILE_W) * TILE_W
    tiles_x = w_pad // TILE_W
    n_tiles = (h_pad // TILE_H) * tiles_x
    if n_tiles_local is not None:
        n_tiles = n_tiles_local
    if tile_stride > 1:
        assert scalars.shape[0] >= _N_BASE_SCALARS + 2 * spp + 1, (
            "sharded frame_call needs the shard's tile base appended to "
            f"scalars (len {scalars.shape[0]}, need "
            f"{_N_BASE_SCALARS + 2 * spp + 1})")
    group = _pick_group(n_tiles)
    grid = n_tiles // group
    rows = n_tiles * _SUB

    if not streamed:
        cluster_size = tri_packed.shape[0] // cluster_bounds.shape[0]
    n_real_clusters = cluster_bounds.shape[0]

    # Coarse third bound level (supers of 32 clusters) for many-cluster
    # scenes: cuts the flat scan's O(C/word) per-tile gate cost to
    # O(S/word + visited supers). The super AABBs are computed here per
    # call (they must follow the per-frame front-to-back permutation of
    # cluster_bounds). Pad clusters to whole supers with degenerate
    # far-point boxes (lo == hi == +BIG): the slab test is lo/hi-
    # SYMMETRIC, so an "inverted" box would gate ON — a far point is
    # rejected by every ray instead. The super min/max reduction uses
    # separate ignore pads (+BIG lo / -BIG hi).
    n_supers = 0
    cb_flat = cluster_bounds.reshape(-1)
    if n_real_clusters > _SUPER_MIN_C > 0:
        from refraction_tpu.kernels.intersect_pallas import SUPER_CLUSTERS

        n_supers = -(-n_real_clusters // SUPER_CLUSTERS)
        if n_supers < 2:
            # One super bounds everything — no pruning possible, and the
            # kernel's hier layout decode requires n_supers > 1 (a forced
            # low RRT_SUPER with <= SUPER_CLUSTERS clusters lands here).
            n_supers = 0
    if n_supers:
        pad = n_supers * SUPER_CLUSTERS - n_real_clusters
        big = jnp.float32(3.0e38)
        ign = jnp.concatenate(
            [jnp.full((pad, 3), big, jnp.float32),
             jnp.full((pad, 3), -big, jnp.float32)], axis=1)
        blk = jnp.concatenate([cluster_bounds, ign]).reshape(
            n_supers, SUPER_CLUSTERS, 6)
        supers = jnp.concatenate(
            [jnp.min(blk[:, :, :3], axis=1), jnp.max(blk[:, :, 3:], axis=1)],
            axis=1)
        cb_pad = jnp.concatenate(
            [cluster_bounds, jnp.full((pad, 6), big, jnp.float32)])
        cb_flat = jnp.concatenate([supers.reshape(-1), cb_pad.reshape(-1)])

    env_rows = env_flat.shape[0] // 3
    n_slots = 2 ** max(min(max_reflect, max_refract), 0)
    assert n_slots <= 32, (
        f"n_slots={n_slots}: the packed liveness pass holds one bit per "
        "slot in an int32 (min(max_reflect, max_refract) <= 5)")

    out_spec = pl.BlockSpec((group * _SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32_out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)

    static_kw = dict(
        cluster_size=cluster_size, env_h=env_h, env_w=env_w,
        env_rows=env_rows, width=width, height=height, tiles_x=tiles_x,
        group=group, spp=spp, max_refract=max_refract,
        max_reflect=max_reflect, n_slots=n_slots, n_supers=n_supers,
        tile_stride=tile_stride, n_tiles_real=n_tiles_real,
    )
    # Slot row-block height (must mirror _frame_kernel's batch_spp/SR).
    batch_spp = (_SPP_BATCH and spp > 1 and (spp & (spp - 1)) == 0
                 and not _SLOT_BATCH)
    sr = spp * _SUB if batch_spp else _SUB
    pool = lambda dt: pltpu.VMEM((n_slots * sr, _LANE), dt)  # noqa: E731
    # Batched-slot rounds traverse the whole w-slot front at once, so the
    # winner scratch must span the pool; per-slot mode uses one row block.
    best_rows = n_slots * _SUB if _SLOT_BATCH else sr
    scratch = [
        pool(jnp.float32), pool(jnp.float32), pool(jnp.float32),
        pool(jnp.float32), pool(jnp.float32), pool(jnp.float32),
        pool(jnp.float32), pool(jnp.float32),
        pltpu.VMEM((_SUB, _LANE), jnp.float32),  # rad r
        pltpu.VMEM((_SUB, _LANE), jnp.float32),  # rad g
        pltpu.VMEM((_SUB, _LANE), jnp.float32),  # rad b
        pltpu.VMEM((best_rows, _LANE), jnp.float32),  # best_t
        pltpu.VMEM((best_rows, _LANE), jnp.int32),    # best_i
        pltpu.VMEM((best_rows, _LANE), jnp.float32),  # best_nx
        pltpu.VMEM((best_rows, _LANE), jnp.float32),  # best_ny
        pltpu.VMEM((best_rows, _LANE), jnp.float32),  # best_nz
        pltpu.SMEM((n_slots + 1,), jnp.int32),   # per-slot live flags +
                                                 # round any-possible bit
    ]
    coded = env_codes is not None
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if coded:
        # Code-packed envmap: one int32 per texel + 256-entry LUT
        # replaces the 3-plane f32 map (3x fewer env gathers/loads).
        env_specs = [vmem, vmem]
        env_ops = (env_codes, env_lut)
    else:
        env_specs = [vmem]              # env (3R, 128) f32
        env_ops = (env_flat,)
    if streamed:
        from refraction_tpu.kernels.intersect_pallas import (
            N_STREAM_SLOTS, rec_pad_for)

        rec_pad = rec_pad_for(cluster_size)
        # Guard against layout drift: scene.py re-derives the record
        # stride (circular-import constraint), so cross-check here.
        assert cluster_records.shape[-1] == n_real_clusters * rec_pad, (
            f"cluster_records size {cluster_records.shape[-1]} != "
            f"{n_real_clusters} clusters * rec_pad {rec_pad}; scene.py and "
            "intersect_pallas.rec_pad_for disagree on the record layout")
        kern = functools.partial(
            _frame_kernel_streamed_coded if coded else _frame_kernel_streamed,
            **static_kw)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            pl.BlockSpec(memory_space=pl.ANY),       # cluster records (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clusters flat
            vmem,                                    # normal table (9Rn,128)
        ] + env_specs
        operands = (scalars, cluster_records, cb_flat,
                    tri_norm_vmem) + env_ops
        scratch += [
            pltpu.SMEM((N_STREAM_SLOTS * rec_pad,), jnp.float32),
            pltpu.SemaphoreType.DMA((N_STREAM_SLOTS,)),
        ]
    else:
        t_pad = tri_packed.shape[0]
        use_bc = (_TRI_VMEM
                  and t_pad * 9 * _LANE * 4 <= _TRI_VMEM_BUDGET)
        if use_bc:
            kern = functools.partial(
                _frame_kernel_bcast_coded if coded else _frame_kernel_bcast,
                **static_kw)
        else:
            kern = functools.partial(
                _frame_kernel_coded if coded else _frame_kernel, **static_kw)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tris flat
            vmem,                                    # normal table (9Rn,128)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clusters flat
            pl.BlockSpec(memory_space=pltpu.SMEM),   # subclusters flat
        ]
        operands = (scalars, tri_packed.reshape(-1),
                    tri_norm_vmem, cb_flat,
                    sub_bounds.reshape(-1))
        if use_bc:
            # Per-float broadcast table from the (f2b-permuted) packed
            # tris — lane-replicated so a sub visit loads its 8 tris'
            # geometry as one aligned (SUB_TRIS*9, 128) vector read.
            tri_bcast = jnp.broadcast_to(
                tri_packed.reshape(-1, 1), (t_pad * 9, _LANE))
            in_specs = in_specs + [vmem]
            operands = operands + (tri_bcast,)
        in_specs = in_specs + env_specs
        operands = operands + env_ops
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(out_spec,) * 3,
        out_shape=(f32_out,) * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


def build_scalars(frame, cfg, offsets) -> jnp.ndarray:
    """Pack the per-frame scalar vector (host side, tiny).

    ``frame`` is a camera.CameraFrame; ``offsets`` the (spp, 2) sub-pixel
    jitter table from render.sample_offsets."""
    import numpy as np

    p = np.asarray(frame.proj_inv, np.float32)
    vals = [p[0, 0], p[0, 1], p[0, 3],
            p[1, 0], p[1, 1], p[1, 3],
            p[2, 0], p[2, 1], p[2, 3],
            frame.origin[0], frame.origin[1], frame.origin[2],
            cfg.primary_tmin, cfg.primary_tmax,
            cfg.secondary_tmin, cfg.secondary_tmax,
            cfg.ior, cfg.fresnel_r0]
    for k in range(offsets.shape[0]):
        vals += [float(offsets[k, 0]), float(offsets[k, 1])]
    return jnp.asarray(np.asarray(vals, np.float32))


# Front-to-back cluster ordering (RRT_F2B=0 disables, for A/B timing).
_F2B = os.environ.get("RRT_F2B", "1") != "0"

# Front-to-back SUBCLUSTER ordering within each cluster (RRT_F2B_SUB).
# Requires RRT_F2B=1 as well: front_to_back_scene returns early when
# _F2B is off, so sub ordering silently disables with it (both orders
# come from the same per-frame permutation prelude). Only matters when a
# cluster spans >1 sub gating word (cluster_size > 32*SUB_TRIS = 256)
# AND sequential word gating (RRT_SEQGATE) is on:
# the near words then tighten the caps the far words are gated with.
# Emulated visit counts (tools/ottstats.py v_kern -> v_f2bs, stride-64/7
# samples): ott C=1024 3019 -> 2871 (-4.9%), monkey C=1024 3740 -> 3455
# (-7.6%; its single cluster previously saw ZERO early termination —
# v_kern == v_nocap). Same per-frame tiny-XLA-op mechanism as the
# cluster permutation; tie-breaks can differ like any visit reorder.
_F2B_SUB = os.environ.get("RRT_F2B_SUB", "1") != "0"

# Coarse third bound level kicks in past this many clusters (RRT_SUPER
# overrides; 0 disables). Below it the flat scan's word count is already
# small and the extra super reduction would only add stalls. 32 (not the
# round-2 initial 64): ott at its optimal cluster size (256 -> 51
# clusters, 2 supers) measured a consistent -1.0 ms (52.61 -> 51.54
# median, every one of 6 paired runs ~1 ms faster); <= 32 clusters would
# yield a single all-bounding super (no pruning) and is gated off.
_SUPER_MIN_C = int(os.environ.get("RRT_SUPER", "32"))


def front_to_back_scene(scene, origin):
    """Return a scene whose cluster-granular tables are permuted so the
    traversal visits clusters nearest ``origin`` (the camera) first.

    The scan visits clusters in ascending table order with per-box
    improvability gating (intersect_pallas.py traverse_tile): once a near
    cluster lands a hit, every farther box whose entry t can no longer
    improve any lane is skipped on its gate bits. Near-to-far order
    maximizes that pruning — the moral equivalent of DXR's ordered BVH
    traversal inside TraceRay (RayTracing.hlsl:60) — at ZERO in-kernel
    cost: only the (tiny) table order changes per frame, the scan
    machinery doesn't. (An in-kernel ordered visit was 4x slower —
    TODO.md "tried and reverted"; measured win here: ott 1080p 5-bounce
    54.6 -> 52.6 ms, monkey neutral, back-to-front worst case neutral.)

    Runs under jit on ~C-element data (argsort of cluster-center
    distances + block gathers); the permuted tables feed ONLY the fused
    kernel — winner ids index the identically permuted normal table, so
    shading is unchanged. Ties between coincident hits may resolve to a
    different (equal-t) triangle than the ascending-Morton oracle order —
    a measure-zero deviation recorded in PARITY.md.
    """
    from refraction_tpu.kernels.intersect_pallas import _SEQGATE
    from refraction_tpu.scene import SUB_TRIS

    C = scene.cluster_bounds.shape[0]
    t_pad = scene.tri_packed.shape[0]
    cs = t_pad // C
    spc = cs // SUB_TRIS
    sub_f2b = _F2B_SUB and _SEQGATE and spc > 32
    if not _F2B or (C <= 1 and not sub_f2b):
        return scene
    cb = scene.cluster_bounds
    o = jnp.asarray(origin, jnp.float32).reshape(1, 3)
    if _F2B and C > 1:
        centers = 0.5 * (cb[:, :3] + cb[:, 3:])
        perm = jnp.argsort(jnp.sum((centers - o) ** 2, axis=1))
    else:
        perm = jnp.arange(C)
    rec_pad = scene.cluster_records.shape[0] // C
    cb2 = cb[perm]
    tp2 = scene.tri_packed.reshape(C, cs, 9)[perm]
    tnp2 = scene.tri_norm_packed.reshape(C, cs, 9)[perm]
    sb2 = scene.sub_bounds.reshape(C, spc, 6)[perm]
    rec2 = scene.cluster_records.reshape(C, rec_pad)[perm]

    if sub_f2b:
        # Within-cluster f2b: per-cluster argsort of sub-center distance;
        # tri/normal/record blocks follow in SUB_TRIS*9 chunks. Padded
        # subs (degenerate tris) sort wherever their centers land — they
        # can gate on exactly as they would in table order, and their
        # zero-det triangles can never be accepted.
        sc = 0.5 * (sb2[:, :, :3] + sb2[:, :, 3:])
        d2 = jnp.sum((sc - o.reshape(1, 1, 3)) ** 2, axis=-1)
        sperm = jnp.argsort(d2, axis=1)  # (C, spc)
        tk = lambda x: jnp.take_along_axis(  # noqa: E731
            x, sperm[:, :, None], axis=1)
        sb2 = tk(sb2)
        tp2 = tk(tp2.reshape(C, spc, SUB_TRIS * 9)).reshape(C, cs, 9)
        tnp2 = tk(tnp2.reshape(C, spc, SUB_TRIS * 9)).reshape(C, cs, 9)
        rec2 = jnp.concatenate(
            [tk(rec2[:, :spc * 6].reshape(C, spc, 6)).reshape(C, -1),
             tk(rec2[:, spc * 6:spc * 6 + cs * 9].reshape(
                 C, spc, SUB_TRIS * 9)).reshape(C, -1),
             rec2[:, spc * 6 + cs * 9:]],
            axis=1)

    tnp_flat = tnp2.reshape(t_pad, 9)
    rows_n = scene.tri_norm_vmem.shape[0] // 9
    tbl = jnp.zeros((9, rows_n * _LANE), jnp.float32)
    tbl = tbl.at[:, :t_pad].set(tnp_flat.T).reshape(9 * rows_n, _LANE)
    return scene._replace(
        cluster_bounds=cb2,
        tri_packed=tp2.reshape(t_pad, 9),
        tri_norm_packed=tnp_flat,
        sub_bounds=sb2.reshape(-1, 6),
        cluster_records=rec2.reshape(-1),
        tri_norm_vmem=tbl,
    )


SMEM_TABLE_BUDGET = 1000 * 2 ** 10  # resident tri tables cap (bytes)


def fits_smem(scene) -> bool:
    """Whether the scene's triangle tables fit SMEM-resident; otherwise
    the streaming (HBM-record DMA) traversal is used. Normals are not
    counted: they live in a VMEM gather table in both modes (deferred
    winner-normal resolve), which doubles the resident capacity."""
    n = (scene.tri_packed.size
         + scene.cluster_bounds.size + scene.sub_bounds.size)
    return n * 4 <= SMEM_TABLE_BUDGET


def fused_radiance(scene, scalars, cfg, interpret: bool = False,
                   streamed: bool | None = None):
    """(scene, scalar vector, cfg) -> (H, W, 3) linear radiance image.

    The single shared fused-kernel frame dispatch — front-to-back cluster
    order, geometry/env operand selection, frame_call, untile + crop —
    used by both render_frame_fused (frame-object entry) and
    render.make_renderer's jitted path, so the frame_call operand
    contract lives in ONE place. jit-traceable (the camera rides in
    ``scalars``; origin is scalars[9:12])."""
    from refraction_tpu.render import untile_order

    scene = front_to_back_scene(scene, scalars[9:12])
    env_h, env_w = scene.envmap.shape[0], scene.envmap.shape[1]
    env_flat = scene.env_packed.reshape(-1, _LANE)
    if streamed is None:
        streamed = not fits_smem(scene)
    if streamed:
        geom = (None, scene.tri_norm_vmem, scene.cluster_bounds, None)
        rec = scene.cluster_records
    else:
        geom = (scene.tri_packed, scene.tri_norm_vmem,
                scene.cluster_bounds, scene.sub_bounds)
        rec = None
    cs = scene.tri_packed.shape[0] // scene.cluster_bounds.shape[0]
    coded = scene.env_codes.shape[0] > 1  # shape-derived static flag
    r, g, b = frame_call(
        *geom, env_flat, scalars, cluster_records=rec, cluster_size=cs,
        width=cfg.width, height=cfg.height, spp=cfg.spp,
        max_refract=cfg.max_refract_depth, max_reflect=cfg.max_reflect_depth,
        env_h=env_h, env_w=env_w, interpret=interpret,
        env_codes=scene.env_codes if coded else None,
        env_lut=scene.env_lut if coded else None,
    )
    h_pad = ((cfg.height + TILE_H - 1) // TILE_H) * TILE_H
    w_pad = ((cfg.width + TILE_W - 1) // TILE_W) * TILE_W
    rad = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    img = untile_order(rad, h_pad, w_pad).reshape(h_pad, w_pad, 3)
    return img[:cfg.height, :cfg.width]


def render_frame_fused(scene, frame, cfg, interpret: bool = False,
                       streamed: bool | None = None):
    """(scene, CameraFrame, cfg) -> (H, W, 3) linear radiance image."""
    from refraction_tpu.render import sample_offsets

    scalars = build_scalars(frame, cfg, sample_offsets(cfg.spp))
    return fused_radiance(scene, scalars, cfg, interpret, streamed)
