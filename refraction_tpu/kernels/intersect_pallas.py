"""Pallas TPU closest-hit kernel: the software replacement for DXR TraceRay.

Design (TPU-first, not a BVH translation — SURVEY.md 7 "hard parts"):

- Rays are processed in 1024-ray (8, 128) VMEM tiles (the render layer
  maps each tile to a 32x32 image square so its frustum is tight); GROUP
  tiles share one grid program to amortize per-program overhead. All
  Möller–Trumbore math is dense float32 VPU work over the whole tile.
- Triangles arrive Morton-sorted in equal-size *clusters* with a fine
  level of 8-triangle *subclusters* (scene.py); both levels' AABBs live
  in SMEM. Gating is bitmasked: per-lane overlap flags for 16 boxes pack
  into one int32 tile that is OR-reduced across lanes with a ~10-op
  pltpu.roll tree, and `@pl.when` skips unvisited boxes on scalar bit
  tests. (Naive per-box jnp.any() reductions cost ~100s of cycles each
  on the scalar unit and were the per-tile floor; a near-to-far ordered
  variant with early termination benchmarked 4x slower still — the
  per-visit while_loop serialized the pipeline.) This is the TPU-native
  analogue of BVH traversal: data-dependent work skipping with fully
  static shapes and zero divergence cost.
- Within a visited subcluster, triangles are iterated one at a time; the
  9+9 triangle/normal scalars are read from SMEM and broadcast to the
  tile — scalar loads pipeline with vector work on the scalar core. The
  winning triangle's interpolated shading normal is tracked in-kernel so
  the integrator never pays a per-ray table gather.
- Dead lanes are encoded in the cull operand: cull = +1 (want front hits,
  det > 0), -1 (want back hits), 0 (dead) — `det * cull > 0` rejects dead
  lanes for free, and fully dead tiles fail every gate, reducing late
  wavefront rounds to a cheap AABB bitmask scan.

Acceptance rules match ops/intersect.py exactly (same formulas, strict
`t < best` update preserves lowest-index tie-breaking since clusters and
triangles are visited in ascending order).
"""

from __future__ import annotations

import functools
import os

# Timing-ablation knobs (RRT_ABLATE=notri,nonorm,noenv): compile-out parts
# of the kernel to attribute device time. Debug only — images are wrong.
_ABLATE = frozenset(
    filter(None, os.environ.get("RRT_ABLATE", "").split(",")))

# Division-free rational-t triangle tests (RRT_RATIONAL=1): the MT loop
# carries the winner as (t_num', |det|) and compares candidates with
# cross-multiplication (t_a/d_a < t_b/d_b <=> t_a*d_b < t_b*d_a for
# positive denominators), deferring the per-lane division to ONE
# reciprocal per traversal. Removes the longest-latency op (the f32
# divide) from the 8-triangle unroll. The resolved t/u/v are
# BIT-IDENTICAL to the divided form whenever the same winner is selected
# (negation and reciprocal-of-negation are exact in IEEE; x*(1/(-d)) ==
# (-x)*(1/d)); only measure-zero boundary ties (|u+v-1|, |t-best| within
# rounding of the cross-multiplied compare) can flip a winner.
#
# Scene-scale precondition (ADVICE r3): rational compares multiply two
# det-scaled quantities (t_num*den' vs t_num'*den, and enter*cur_den in
# the gate margin), SQUARING the determinant's f32 dynamic range. With
# TPU flush-to-zero, dets below ~1e-19 underflow the products so `a < b`
# reads false — a closer winner can be silently dropped or a live box
# pruned; dets above ~1e19 overflow to inf with the same effect.
# Degenerate/near-zero-area triangles and scenes scaled far outside
# ~[1e-9, 1e9] units are OUT OF CONTRACT for RRT_RATIONAL=1. All shipped
# assets (monkey/shell/ott/cube/sphere, unit-ish scale) are well inside:
# their |det| spans ~1e-6..1e1, products ~1e-12..1e2.
#
# DEFAULT ON since round 4: device medians (1080p/ref configs, paired
# sweeps) monkey 4-bounce 14.19 -> 13.99 ms, shell 5-bounce 11.69 ->
# 11.61, ott 5-bounce 40.51 -> 39.68; winner parity pinned by
# test_rational_bit_parity (defer-norms + any-hit paths). RRT_RATIONAL=0
# reverts (and is required for out-of-contract scene scales).
_RATIONAL = os.environ.get("RRT_RATIONAL", "1") != "0"

# Multi-visit set-bit iteration (RRT_PAIR, see iter_set_bits_paired):
# process VISIT_W gated visits per scalar-loop trip at the SUB level and
# in the coded env scan — the levels whose visit bodies are cheap vector
# work, so duplicated (idempotent) visits on non-multiple counts cost
# only their vector ops while the trip count divides by VISIT_W.
# Cluster/super levels stay unpaired: their visit bodies contain whole
# sub scans, where a duplicate would re-run microseconds of work.
# RRT_PAIR=0 -> 1 visit/trip, =1 (default) -> 2, =4 -> 4. Width 2
# measured (device medians, 1080p): monkey 4-bounce 14.72 -> 14.21 ms,
# ott 5-bounce 41.58 -> 40.62, shell 1024x768 5-bounce 11.85 -> 11.71.
# Width 4 trades up to 3 duplicate visits per word for half the trips
# again — wins only where gating words are DENSE (divergent secondary
# rays); sweep per scene before flipping.
_PAIR_ENV = os.environ.get("RRT_PAIR", "1")
_VISIT_W = {"0": 1, "1": 2}.get(_PAIR_ENV, None) or int(_PAIR_ENV)
assert _VISIT_W in (1, 2, 4), f"RRT_PAIR={_PAIR_ENV}: width must be 1/2/4"
_PAIR = _VISIT_W >= 2

# Sequential sub-word gating (RRT_SEQGATE, DEFAULT OFF — measured
# loser): in the carried sub scan, compute each 32-bit gating word from
# the REGISTER-CARRIED winner state as tightened by the previous words'
# visits, instead of issuing every word's gate planes with cluster-entry
# caps (the unrolled all-words-first path). Matters exactly when a
# cluster has >1 sub word (cluster_size > 256): at C=1024 a cluster's 4
# words see ZERO within-cluster early termination (tools/ottstats.py:
# monkey v_kern == v_nocap exactly). The visit SET can only shrink and
# winners are bit-identical (test_seqgate_bit_parity) — but the
# plane->tree->extract->visits chain per WORD serializes the VPU against
# the scalar core: monkey 1080p 4-bounce measured 13.10 -> 15.85 ms
# device median (+2.75 ms ~= 3 extra serialization boundaries x ~0.55 us
# x ~1.6k cluster visits/frame) against an emulated visit win of only
# -1.5..-7.6%. Kept as a knob for re-evaluation if the boundary cost
# ever drops; the boundary-free route to the same pruning is fused-word
# iteration (below), not sequential gating.
_SEQGATE = os.environ.get("RRT_SEQGATE", "0") != "0"

# Single-cluster flat scan (RRT_FLAT1, default on): when the scene is
# ONE cluster (monkey's auto tier), skip the cluster level entirely —
# every sub box is CONTAINED in the cluster box, so the sub gate words
# subsume its test (cluster off => all sub words zero => zero visits)
# and their OR is a TIGHTER `possible` scalar. Trades the cluster
# level's plane + roll tree + extract drain + branch region per live
# round for unconditional sub planes on rounds the cluster box would
# have rejected — a win exactly when the speculated planes are cheap,
# i.e. single-row-block (8, 128) traversals: monkey spp1 10.74 -> 10.61
# device median, but spp4's (32, 128) blocks pay 4x plane vector and
# LOSE (29.03 -> 32.52), so the path engages only at R == 8 (the
# sample-batched and slot-batched shapes keep the two-level scan).
_FLAT1 = os.environ.get("RRT_FLAT1", "1") != "0"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from refraction_tpu.scene import SUB_TRIS, SUPER_CLUSTERS, Scene

BLOCK_RAYS = 1024  # one (8, 128) tile = the skip granularity
GROUP = 16         # tiles processed per grid program (amortizes per-program
                   # grid overhead, which dominated at 1-tile programs)
_SUB = 8
_LANE = 128
BIG = 3.0e38  # python float: becomes an inline literal inside the kernel


def _kernel(limits_sm, tri_sm, norm_sm, cluster_sm, subs_sm, ox, oy, oz,
            dx, dy, dz, cull, t_out, i_out, nx_out, ny_out, nz_out,
            best_t, best_i, best_nx, best_ny, best_nz,
            cluster_size: int):
    tmin = limits_sm[0]
    tmax = limits_sm[1]
    # SMEM tables are FLAT 1D: SMEM pads the last dim of 2D arrays to 128
    # lanes, so a (T, 9) table would burn 14x its size (512 KB at T=1024,
    # vs the 1 MB SMEM budget). Flat layout: tri i component c at [9i+c].
    num_clusters = cluster_sm.shape[0] // 6

    def tile_work(g, _):
        rows = pl.ds(g * _SUB, _SUB)
        _tile_kernel(
            tmin, tmax, num_clusters, cluster_size,
            tri_sm, norm_sm, cluster_sm, subs_sm,
            ox[rows, :], oy[rows, :], oz[rows, :],
            dx[rows, :], dy[rows, :], dz[rows, :], cull[rows, :],
            lambda v: t_out.__setitem__((rows, slice(None)), v),
            lambda v: i_out.__setitem__((rows, slice(None)), v),
            lambda v: nx_out.__setitem__((rows, slice(None)), v),
            lambda v: ny_out.__setitem__((rows, slice(None)), v),
            lambda v: nz_out.__setitem__((rows, slice(None)), v),
            best_t, best_i, best_nx, best_ny, best_nz,
        )
        return 0

    jax.lax.fori_loop(0, GROUP, tile_work, 0)


def _tile_kernel(tmin, tmax, num_clusters, cluster_size,
                 tri_sm, norm_sm, cluster_sm, subs_sm,
                 o_x, o_y, o_z, d_x, d_y, d_z, cu,
                 put_t, put_i, put_nx, put_ny, put_nz,
                 best_t, best_i, best_nx, best_ny, best_nz):
    traverse_tile(tmin, tmax, num_clusters, cluster_size,
                  tri_sm, norm_sm, cluster_sm, subs_sm,
                  o_x, o_y, o_z, d_x, d_y, d_z, cu,
                  best_t, best_i, best_nx, best_ny, best_nz)
    put_t(best_t[:])
    put_i(best_i[:])
    put_nx(best_nx[:])
    put_ny(best_ny[:])
    put_nz(best_nz[:])


def rec_len_for(cluster_size: int) -> int:
    """Used float count of one streamed cluster record:
    [subcluster AABBs (cs/SUB_TRIS x 6) | tri9 x cs]. Normals are NOT
    streamed — they resolve from the scene's VMEM gather table (deferred
    winner-normal resolve), which halves per-cluster DMA bytes."""
    return (cluster_size // SUB_TRIS) * 6 + cluster_size * 9


def rec_pad_for(cluster_size: int) -> int:
    """Stored float count of one record: padded to a whole number of
    (8, 128) tiles so HBM DMA slices meet Mosaic's tiling alignment."""
    return ((rec_len_for(cluster_size) + 1023) // 1024) * 1024


N_STREAM_SLOTS = 16  # one SMEM record slot per gating-word bit


def _bit_index(iso):
    """Index of an isolated bit via five mask tests (Mosaic lowers
    neither scalar popcount nor scalar bitcast). iso == 0 reads 0."""
    b = jnp.int32(0)
    for shift, mask in ((1, 0xAAAAAAAA), (2, 0xCCCCCCCC),
                        (4, 0xF0F0F0F0), (8, 0xFF00FF00),
                        (16, 0xFFFF0000)):
        mk = jnp.int32(np.int32(np.uint32(mask)))
        b = b + jnp.where(
            jnp.bitwise_and(iso, mk) != 0,
            jnp.int32(shift), jnp.int32(0))
    return b


def iter_set_bits(word, visit):
    """Scalar loop over the SET bits of ``word`` (int32), ascending:
    one while-loop trip per set bit — isolate the lowest bit, index it,
    visit, clear. Bit 31 (the int32 sign bit) works: ``w & -w`` of
    INT_MIN is INT_MIN and its masks read index 31."""

    def body(w):
        iso = jnp.bitwise_and(w, jnp.int32(0) - w)
        visit(_bit_index(iso))
        return jnp.bitwise_xor(w, iso)

    jax.lax.while_loop(lambda w: w != 0, body, word)


def iter_set_bits_paired(word, visit, width=2):
    """iter_set_bits processing ``width`` set bits per while-loop trip.

    The per-visit floor is the loop-trip boundary itself (~0.5-1 us of
    scalar-core serialization per trip — the sub2x instrument measured
    ~8.9 ms of ott's frame in visit overhead vs ~2 ms of actual MT
    vector math), so dividing the trip count nearly divides that floor.
    When fewer than ``width`` bits remain, the last trip re-visits its
    LAST real bit for the missing ones — callers must pass an
    IDEMPOTENT visit (the traversal's strict `<` winner test and the
    coded env scan's overwrite-select both re-reject/re-produce the
    identical result on a duplicate visit, so the output is
    bit-identical to the unpaired loop; each duplicate costs only the
    visit's vector ops, not another trip — width 4 on a 1-bit word pays
    3 duplicate visit bodies, which is why wide widths only win where
    the gating words are DENSE).
    Ascending order is preserved, so closest-hit tie-breaking matches
    the dense scan exactly like iter_set_bits."""

    def body(w):
        b_prev = None
        for _ in range(width):
            iso = jnp.bitwise_and(w, jnp.int32(0) - w)
            b = _bit_index(iso)
            if b_prev is not None:
                b = jnp.where(w != 0, b, b_prev)
            visit(b)
            b_prev = b
            w = jnp.bitwise_and(w, jnp.bitwise_not(iso))
        return w

    jax.lax.while_loop(lambda w: w != 0, body, word)


def iter_set_bits_carry(word, visit, carry, width=1):
    """iter_set_bits threading a tuple ``carry`` of values through the
    visits: ``visit(b, carry) -> carry``; returns the final carry.

    This is how the traversal keeps its winner state in REGISTERS across
    a whole subcluster scan instead of bouncing it through VMEM scratch
    once per visit. Measured ~NEUTRAL on device (1080p medians: ott
    40.62 -> 40.51, monkey 14.21 -> 14.19, shell 11.71 -> 11.69) —
    Mosaic evidently already hides the scratch round-trip, so the
    sub2x-instrument's ~8.9 ms/frame per-visit overhead on ott is the
    loop-trip serialization itself, not winner-state traffic. Kept:
    never loses, and it makes the winner-state movement explicit (one
    scratch read/write per CLUSTER visit instead of per subcluster).
    Visit order is ascending like iter_set_bits, so the threaded
    updates are order-identical to the scratch version.

    ``width`` > 1 processes that many set bits per trip with the same
    idempotent-duplicate contract as iter_set_bits_paired."""

    def body(c):
        w = c[0]
        cr = c[1:]
        b_prev = None
        for _ in range(width):
            iso = jnp.bitwise_and(w, jnp.int32(0) - w)
            b = _bit_index(iso)
            if b_prev is not None:
                b = jnp.where(w != 0, b, b_prev)
            cr = visit(b, cr)
            b_prev = b
            w = jnp.bitwise_and(w, jnp.bitwise_not(iso))
        return (w,) + tuple(cr)

    out = jax.lax.while_loop(lambda c: c[0] != 0, body,
                             (word,) + tuple(carry))
    return out[1:]


def iter_set_bits_fused(words, rel0s, visit, carry, width=1):
    """Iterate the set bits of SEVERAL gating words in ONE while loop,
    threading ``carry`` like iter_set_bits_carry: each pick takes the
    lowest set bit of the FIRST nonzero word — exactly the visit set
    AND order of running the per-word loops in sequence, but with ONE
    loop region instead of ``len(words)`` (the RRT_SEQGATE postmortem
    measured ~0.55 us of VPU/scalar-core serialization per region per
    cluster visit — at 4 sub words that is ~3 removable boundaries).
    The per-pick cost is a ~3(k-1)-scalar-op first-nonzero select chain,
    noise next to a region boundary.

    ``rel0s`` are the words' static bit-index bases; ``visit(rel,
    carry) -> carry`` gets rel = rel0s[i] + bit. ``width`` > 1 makes
    that many picks per trip (trip count = ceil(total set bits/width) —
    across ALL words, strictly better than per-word pairing); when
    fewer bits remain the last real rel is re-visited (the idempotent-
    duplicate contract of iter_set_bits_paired)."""
    k = len(words)
    assert k == len(rel0s) and k >= 2

    def body(c):
        ws = list(c[:k])
        cr = c[k:]
        rel_prev = None
        for _ in range(width):
            any_w = ws[0]
            for i in range(1, k):
                any_w = jnp.bitwise_or(any_w, ws[i])
            w_sel = ws[k - 1]
            rel0_sel = jnp.int32(rel0s[k - 1])
            for i in range(k - 2, -1, -1):
                pick = ws[i] != 0
                w_sel = jnp.where(pick, ws[i], w_sel)
                rel0_sel = jnp.where(pick, jnp.int32(rel0s[i]), rel0_sel)
            iso = jnp.bitwise_and(w_sel, jnp.int32(0) - w_sel)
            rel = rel0_sel + _bit_index(iso)
            if rel_prev is not None:
                rel = jnp.where(any_w != 0, rel, rel_prev)
            cr = visit(rel, cr)
            rel_prev = rel
            # Clear the picked bit from the word it came from (the
            # first nonzero one); a duplicate pick (any_w == 0) has
            # iso == 0 on every selected word, clearing nothing.
            seen = ws[0] != ws[0]  # scalar False of the right dtype
            for i in range(k):
                nz = ws[i] != 0
                sel_i = nz & jnp.logical_not(seen)
                ws[i] = jnp.where(sel_i, jnp.bitwise_xor(ws[i], iso),
                                  ws[i])
                seen = seen | nz
        return tuple(ws) + tuple(cr)

    def cond(c):
        w = c[0]
        for i in range(1, k):
            w = jnp.bitwise_or(w, c[i])
        return w != 0

    out = jax.lax.while_loop(cond, body, tuple(words) + tuple(carry))
    return out[k:]


# Fused multi-word sub-scan iteration (see iter_set_bits_fused).
# RRT_FUSEWORDS=0 reverts to one while loop per gating word. Measured
# (device medians, 1080p, C=1024): monkey 13.10 -> 13.06, ott 34.82 ->
# 34.76 — small but consistent across all samples; never loses.
_FUSEWORDS = os.environ.get("RRT_FUSEWORDS", "1") != "0"

# Visit width of the FUSED multi-word loop (RRT_PAIR_FUSED). Width 4
# lost per-word (up to 3 duplicate visits per sparse word — the
# RRT_PAIR=4 sweep) but WINS fused: duplicates occur once per cluster
# scan, not once per word, so trip count ~ceil(total visits/4).
# Measured on top of fused words (device medians, 1080p): ott 34.76 ->
# 34.30, monkey 13.06 -> 12.81. Single-word scans (cluster_size <= 256,
# e.g. shell's 128) keep RRT_PAIR width 2 — width 4 measured +0.28 ms
# there (round-4 per-word sweep).
_FUSE_W = int(os.environ.get("RRT_PAIR_FUSED", "4"))
assert _FUSE_W in (1, 2, 4, 8)


# Clusters per coarse third-level AABB (hier mode): SUPER_CLUSTERS,
# defined in scene.py (imported above) so the median-split triangle
# ordering can mirror the traversal hierarchy.


def traverse_tile(tmin, tmax, num_clusters, cluster_size,
                  tri_sm, norm_sm, cluster_sm, subs_sm,
                  o_x, o_y, o_z, d_x, d_y, d_z, cu,
                  best_t, best_i, best_nx, best_ny, best_nz,
                  any_hit: bool = False, stream=None, norm_vmem=None,
                  num_supers: int = 0, tri_bcast=None):
    """Closest-hit traversal of one (8,128) ray tile; results land in the
    best_* scratch refs. Shared by the standalone closest-hit kernel and
    the fused wavefront megakernels.

    best_t is initialized to ``tmax`` so the range test folds into the
    closest-hit update (`t < best_t`); "no hit" is therefore
    ``best_t >= tmax``, and a winner at exactly t == tmax is dropped — a
    measure-zero deviation from the inclusive reference test
    (RayTracing.hlsl:60 TMax), recorded in PARITY.md.

    Returns a scalar ``possible`` (OR of the top-level gate words). When
    it is 0 — no box gated on for ANY lane — the whole traversal body is
    skipped and every best_* scratch ref is GARBAGE for the entire tile
    (in defer-norms mode best_nx/ny/nz are not even initialized, not the
    (0,1,0) default the resolve writes for non-hit lanes): callers MUST
    gate every read of the best_* refs behind ``possible != 0`` (the
    fused frame kernel does; a no-hit tile shades as all-miss either
    way, since best_t keeps its tmax init).

    With ``any_hit=True`` (the final bounce round, where hits contribute
    black and only the hit/miss decision matters — RayTracing.hlsl:82)
    the winner's index/normal tracking is skipped and a lane's best_t is
    dropped to -1 on its first accepted hit, which removes it from every
    later box's improvability bits — the scan drains itself.

    With ``norm_vmem`` (the scene's (9*Rn, 128) tri_norm_vmem table as a
    VMEM ref) winner-normal interpolation is DEFERRED: the inner triangle
    loop tracks only (t, id, u, v) — saving 9 SMEM loads + ~19 vector ops
    per candidate triangle (measured 7.7 ms of a 24 ms monkey 1080p
    frame) — and one post-traversal pass gathers each lane's winner
    normals from the table with the envmap kernel's windowed cross-lane
    gather (winner ids are Morton-coherent, so the row window is narrow).
    ``norm_sm`` is ignored in this mode; the arithmetic is bit-identical
    (same lerp expression, same winner (u, v)).

    With ``stream=(records, rec_scratch, dma_sems)`` the per-cluster
    triangle/normal/subcluster data is NOT SMEM-resident (tri_sm, norm_sm
    and subs_sm must be None): only the cluster AABBs stay in SMEM, and
    each gated cluster's record row of the HBM ``records`` array
    (scene.cluster_records) is DMA'd into the 16-slot SMEM ``rec_scratch``
    ring. All of a gating word's DMAs are issued before the first visit,
    so transfers overlap the preceding clusters' triangle work. This is
    the size-agnostic path (DXR's AS build+traverse never cared about
    scene size — RefractionDemo.cpp:272-361): SMEM holds O(num_clusters)
    bounds + a constant ring, whatever the triangle count.

    With ``num_supers > 1`` (the coarse third bound level, for scenes
    with many clusters) ``cluster_sm`` holds
    ``[super AABBs (num_supers*6) | cluster AABBs (num_supers*32*6)]``
    — clusters padded to whole supers with degenerate far-point boxes
    (lo == hi == +BIG; the slab test is lo/hi-symmetric, so an inverted
    box would gate ON) that can never gate on. The cluster scan then
    only visits the 32-cluster
    span of supers some live lane overlaps-and-can-improve, cutting the
    per-tile gate cost from O(C/word) to O(S/word + visited supers).
    Visit order within the scan is unchanged (ascending), so
    tie-breaking is identical to the flat scan.

    The ray tile may be R = any multiple of 8 rows (R = o_x.shape[0]);
    the best_* scratch refs may be larger — only their first R rows are
    used. The fused frame kernel's batched-slot mode traces a whole
    w-slot wavefront front as one (w*8, 128) tile so the per-box gate
    reductions and per-visit scalar trips (and, streaming, the record
    DMAs) are paid once per ROUND instead of once per live slot."""
    R = o_x.shape[0]
    rr = pl.ds(0, R)  # static prefix of the (possibly larger) scratch
    alive = cu != 0.0
    defer_norms = norm_vmem is not None
    # Rational mode (see _RATIONAL): supported on the production paths
    # (deferred-normal closest hit, where best_nz is free to carry the
    # winner denominator until the resolve pass, and any-hit, which needs
    # no denominator at all — the retire mark stays a real value). The
    # inline-normal path keeps the divided form.
    rational = _RATIONAL and (defer_norms or any_hit)
    if tri_bcast is not None:
        # The bcast path never loads candidate normals (rows carry only
        # the 9 geometry floats) — production modes only.
        assert defer_norms or any_hit, "tri_bcast requires deferred normals"
        assert stream is None, "tri_bcast is a resident-geometry path"

    best_t[rr] = jnp.broadcast_to(tmax, (R, _LANE))
    if not any_hit:
        best_i[rr] = jnp.zeros((R, _LANE), jnp.int32)
        best_nx[rr] = jnp.zeros((R, _LANE), jnp.float32)
        # In defer mode best_ny holds winner-v until the resolve pass
        # (default normal (0,1,0) is applied there instead).
        if defer_norms:
            best_ny[rr] = jnp.zeros((R, _LANE), jnp.float32)
            if rational:
                # best_t/best_nz carry (t_num', den): init t = tmax/1.
                best_nz[rr] = jnp.ones((R, _LANE), jnp.float32)
        else:
            best_ny[rr] = jnp.ones((R, _LANE), jnp.float32)
            best_nz[rr] = jnp.zeros((R, _LANE), jnp.float32)

    # Safe reciprocal directions for the conservative slab test: clamping
    # tiny components can only widen the hit interval (false positives are
    # filtered by the exact triangle test; false negatives are impossible).
    eps = jnp.float32(1e-30)
    def safe_inv(c):
        mag = jnp.maximum(jnp.abs(c), eps)
        return jnp.where(c < 0, -1.0 / mag, 1.0 / mag)

    inv_x, inv_y, inv_z = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)

    def slab_mask_entry(bounds_sm, base):
        """Per-lane conservative ray-vs-AABB overlap + entry t (no reductions)."""
        lo0 = bounds_sm[base + 0]
        lo1 = bounds_sm[base + 1]
        lo2 = bounds_sm[base + 2]
        hi0 = bounds_sm[base + 3]
        hi1 = bounds_sm[base + 4]
        hi2 = bounds_sm[base + 5]
        ax_ = (lo0 - o_x) * inv_x
        bx_ = (hi0 - o_x) * inv_x
        ay_ = (lo1 - o_y) * inv_y
        by_ = (hi1 - o_y) * inv_y
        az_ = (lo2 - o_z) * inv_z
        bz_ = (hi2 - o_z) * inv_z
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(ax_, bx_), jnp.minimum(ay_, by_)),
            jnp.maximum(jnp.minimum(az_, bz_), tmin),
        )
        leave = jnp.minimum(
            jnp.minimum(jnp.maximum(ax_, bx_), jnp.maximum(ay_, by_)),
            jnp.minimum(jnp.maximum(az_, bz_), tmax),
        )
        return (enter <= leave) & alive, enter

    def slab_mask(bounds_sm, base):
        return slab_mask_entry(bounds_sm, base)[0]

    def _roll_tree_plane(v, combine):
        for s in (64, 32, 16, 8, 4, 2, 1):
            v = combine(v, pltpu.roll(v, s, axis=1))
        s = v.shape[0] // 2
        while s >= 1:
            v = combine(v, pltpu.roll(v, s, axis=0))
            s //= 2
        return v

    def _roll_tree(v, combine):
        return _roll_tree_plane(v, combine)[0, 0]

    def or_reduce_scalar(bits):
        """Bitwise-OR a (8,128) int32 tile to one scalar via a roll tree —
        replaces per-cluster jnp.any() reductions, whose scalar-unit cost
        (~100s of cycles each) was the kernel's per-tile floor."""
        return _roll_tree(bits, jnp.bitwise_or)

    _GROUP_BITS = 16  # AABBs gated per bitmask reduction (streaming: one
                      # SMEM ring slot per bit, so fixed at 16 there)

    def gated_loop(bounds_ref, base, start, count, visit, pre_visit=None,
                   bits_per_word=32, dup=False, width=1, carry=None,
                   want_words=False):
        """For i in [start, start+count): visit(i) iff any live lane
        overlaps AABB i, whose bounds live at ``bounds_ref[base + i*6]``.
        ``count`` is static; ``base``/``start`` may be traced.

        Overlap flags for groups of ``bits_per_word`` AABBs are packed
        into per-lane bitmasks and OR-reduced across the tile once per
        group — one reduction per word instead of a ~100-cycle scalar
        reduction per box (32-bit words halve the reduction count vs 16;
        the streaming path uses 16 because each bit indexes a DMA ring
        slot). ``pre_visit(word, rel0)``, if given, runs between the
        reduction and the visits (DMA issue hook for streaming).

        With ``carry`` (a tuple; sub level) visits thread it in
        registers — ``visit(i, carry) -> carry`` — and gated_loop
        returns the final carry. The improvability bits still read the
        best_t SCRATCH, which during a carried scan is exactly the scan-
        start state — the same staleness the unrolled all-words-first
        path already has, so visit sets and winners are unchanged.
        Incompatible with ``pre_visit`` (pl.when is statement-only).

        Without ``carry`` the return value is the bitwise OR of all
        gating words — a scalar that is zero iff NO box was visited
        (callers use it to skip hit-dependent work: no gated box means
        no lane can have accepted a hit)."""
        n_groups = (count + bits_per_word - 1) // bits_per_word

        def group_bits(rel0, n_boxes=None, cur=None):
            # ``n_boxes`` (static-rel0 path): real boxes in this word —
            # the tail word then emits no clamped-index slab tests.
            # ``cur`` (RRT_SEQGATE): the register-carried winner state to
            # gate against instead of the scan-start scratch — fresher
            # caps, same conservative margin, bit-identical winners.
            if n_boxes is None:
                n_boxes = min(bits_per_word, count)
            bits = jnp.zeros((R, _LANE), jnp.int32)
            cur_best = best_t[rr] if cur is None else cur[0]
            # Rational closest-hit: best is (num, den); enter < num/den
            # <=> enter*den < num (den > 0 always: init 1, updates |det|).
            # The (1 + 1e-4) margin makes the prune conservative w.r.t.
            # the cross-multiplied accept test: accept compares
            # fl(t_*bd) < fl(bt*du) whose roundings can admit a triangle
            # with real t a few ulp ABOVE the current best (and such
            # wobble can stack over in-group updates), while
            # enter <= real t always — a margin far above the stacked
            # ulp bound guarantees accept => gate, which is what makes
            # the visit SET (union gating, word granularity, slot
            # batching) unable to change any winner (the batch/subword
            # bit-parity contracts). Visiting the few extra boxes whose
            # entry is within 0.01% of the current best costs nothing
            # measurable.
            if rational:
                cur_best = cur_best * jnp.float32(1.0 + 1e-4)
            if rational and not any_hit:
                cur_den = best_nz[rr] if cur is None else cur[4]
            else:
                cur_den = None
            for b in range(n_boxes):
                rel = rel0 + b
                idx = start + jnp.minimum(rel, count - 1)
                m, enter = slab_mask_entry(bounds_ref, base + idx * 6)
                # Improvability: a box only matters to a lane whose current
                # best hit is farther than the box entry — per-lane early
                # termination folded into the overlap bit for free.
                in_range = rel < count
                improv = (enter * cur_den < cur_best if cur_den is not None
                          else enter < cur_best)
                # int32-safe bit constant (bit 31 is the sign bit).
                bconst = jnp.int32(np.int32(np.uint32(1) << np.uint32(b)))
                bits = bits | jnp.where(
                    m & improv & in_range, bconst, jnp.int32(0)
                )
            return bits

        def word_visits(word, rel0, cr=None):
            # One scalar-loop trip per SET bit, ascending (same visit
            # order as a dense scan, so closest-hit tie-breaking is
            # unchanged). ``dup`` (the "sub2x" instrument) runs every
            # visit twice — idempotent, bit-identical output — so the
            # time delta isolates the full per-visit cost (trip +
            # loads + MT + winner-state traffic).
            if carry is not None:
                assert pre_visit is None
                if dup:
                    def _v(b, c):
                        c = visit(start + rel0 + b, c)
                        return visit(start + rel0 + b, c)
                else:
                    def _v(b, c):
                        return visit(start + rel0 + b, c)

                return iter_set_bits_carry(word, _v, cr, width=width)
            if dup:
                def _visit1(b):
                    visit(start + rel0 + b)
                    visit(start + rel0 + b)
            else:
                def _visit1(b):
                    visit(start + rel0 + b)

            it = (functools.partial(iter_set_bits_paired, width=width)
                  if width > 1 else iter_set_bits)
            if pre_visit is None:
                # No pl.when gate: the while loop's own ``w != 0``
                # condition self-gates an empty word, and every branch
                # region is a Mosaic pipeline boundary (the measured
                # +1.15 us/word SUBWORD cost is control flow, not reads).
                it(word, _visit1)
            else:
                @pl.when(word != 0)
                def _():
                    pre_visit(word, start + rel0)
                    it(word, _visit1)

        if "gate2x" in _ABLATE:
            # Honest duplicate of the gate-plane computation (slab tests
            # + roll tree; cost instrument, bit-identical output): the
            # OPAQUE ZERO base offset (derived from live ray data — an
            # fp-mul-by-0 the compiler can't fold) defeats CSE; OR-ing
            # the identical duplicate word into the real one is a no-op.
            _gz = (o_x[0, 0] * jnp.float32(0.0)).astype(jnp.int32)

            def group_bits(rel0, n_boxes=None, cur=None, _real=group_bits):
                b1 = _real(rel0, n_boxes, cur)
                b2 = _real(rel0 + _gz, n_boxes, cur)
                return b1 | b2

        if count == 1 and carry is None and pre_visit is None:
            # Single-box scan (the cluster level of a single-cluster
            # scene — monkey's auto tier): the set-bit while machinery
            # (isolate + 5-mask _bit_index + clear, plus a loop region
            # per gated round) degenerates to ONE conditional region.
            # Visit set identical: bit 0 set <=> region taken; ~0.5 us
            # of scalar work saved per gated tile-round.
            word = or_reduce_scalar(group_bits(0, 1))

            @pl.when(word != 0)
            def _single():
                visit(start)

            return word

        if carry is not None and _SEQGATE and n_groups > 1:
            # Sequential words (RRT_SEQGATE): word g's gate plane reads
            # the carry as tightened by words < g. Unrolled when small
            # (same branch-count cuts as below), rolled past 4 words.
            cr = tuple(carry)
            if n_groups <= 4:
                for g in range(n_groups):
                    nb = min(bits_per_word, count - g * bits_per_word)
                    plane = _roll_tree_plane(
                        group_bits(g * bits_per_word, nb, cur=cr),
                        jnp.bitwise_or)
                    cr = word_visits(plane[0, 0], g * bits_per_word, cr)
                return cr

            def seq_body(g, cr):
                rel0 = g * bits_per_word
                return word_visits(
                    or_reduce_scalar(group_bits(rel0, cur=cr)), rel0, cr)

            return jax.lax.fori_loop(0, n_groups, seq_body, cr)

        if n_groups <= 8:
            # Statically small scan (every shipped scene's cluster, super
            # and subcluster levels — and the 8-word sub scans RRT_SUBTRIS=4
            # produces at cluster_size 1024): unroll the word loop, issue
            # ALL words' gate planes + OR roll trees before the first scalar
            # read, and give tail words their real box count (no clamped-
            # index slab tests). The read grouping measured NEUTRAL on
            # device — Mosaic already schedules scalar reads by dataflow,
            # so the RRT_SUBWORD +1.15 us/word cost is control-flow
            # boundaries, not drains — but the tail-word skip is strictly
            # less work and the unrolled shape is where the branch-count
            # cuts land. Visit semantics are unchanged; later words' gate
            # bits read a best_t that is staler by the earlier words'
            # visits, which is exactly the (bit-parity-safe) conservative
            # direction — the subword parity test pins that argument.
            planes = [
                _roll_tree_plane(group_bits(
                    g * bits_per_word,
                    min(bits_per_word, count - g * bits_per_word)),
                    jnp.bitwise_or)
                for g in range(n_groups)
            ]
            # Extract AFTER all trees are issued (or_reduce_scalar embeds
            # its extract, which would re-serialize tree/read/tree/read).
            words = [p[0, 0] for p in planes]
            if carry is not None:
                # ``want_words`` (the single-cluster flat path): also
                # return the OR of the gating words — the caller's
                # ``possible`` scalar.
                any_w = words[0]
                for w in words[1:]:
                    any_w = jnp.bitwise_or(any_w, w)
                cr = tuple(carry)
                if _FUSEWORDS and n_groups > 1:
                    # One loop region for ALL words (identical visit
                    # set/order — see iter_set_bits_fused).
                    if dup:
                        def _vf(rel, c):
                            c = visit(start + rel, c)
                            return visit(start + rel, c)
                    else:
                        def _vf(rel, c):
                            return visit(start + rel, c)

                    cr = iter_set_bits_fused(
                        words,
                        [g * bits_per_word for g in range(n_groups)],
                        _vf, cr,
                        width=(_FUSE_W if width > 1 else width))
                    return (cr, any_w) if want_words else cr
                for g, word in enumerate(words):
                    cr = word_visits(word, g * bits_per_word, cr)
                return (cr, any_w) if want_words else cr
            any_w = words[0]
            for w in words[1:]:
                any_w = jnp.bitwise_or(any_w, w)
            for g, word in enumerate(words):
                word_visits(word, g * bits_per_word)
            return any_w
        else:
            # Large streamed scans (e.g. C=320 at cluster level): rolled
            # loop, one drain per word.
            if carry is not None:
                def group_body_c(g, cr):
                    rel0 = g * bits_per_word
                    return word_visits(
                        or_reduce_scalar(group_bits(rel0)), rel0, cr)

                return jax.lax.fori_loop(0, n_groups, group_body_c,
                                         tuple(carry))

            def group_body(g, acc):
                rel0 = g * bits_per_word
                w = or_reduce_scalar(group_bits(rel0))
                word_visits(w, rel0)
                return jnp.bitwise_or(acc, w)

            return jax.lax.fori_loop(0, n_groups, group_body, jnp.int32(0))

    subs_per_cluster = cluster_size // SUB_TRIS
    if stream is not None:
        assert tri_sm is None and norm_sm is None and subs_sm is None
        assert defer_norms or any_hit, (
            "stream mode requires norm_vmem (records carry no normals)")
        records, rec_scratch, dma_sems = stream
        rec_len = rec_pad_for(cluster_size)
        tri_off = subs_per_cluster * 6

        def _rec_dma(ci, slot):
            return pltpu.make_async_copy(
                records.at[pl.ds(ci * rec_len, rec_len)],
                rec_scratch.at[pl.ds(slot * rec_len, rec_len)],
                dma_sems.at[slot],
            )

        def _issue_dmas(word, ci0):
            def body(b, _):
                @pl.when((word >> b) & 1 != 0)
                def _():
                    _rec_dma(ci0 + b, b).start()

                return 0

            jax.lax.fori_loop(0, _GROUP_BITS, body, 0)

    def tri_body(ti, tref, tb, nref, nb, best, dup_mode=None, rows=None):
        """One Möller–Trumbore test against the whole tile; ``best`` is the
        register-carried (t, i, nx, ny, nz) winner state (t only in
        any-hit mode) — values, not scratch refs, so the 8-triangle
        unroll below has no false memory dependencies and the VLIW
        scheduler can software-pipeline consecutive triangles. ``ti`` is
        the global triangle index (winner id); (tref, tb)/(nref, nb)
        locate its 9 floats of geometry/normals.

        ``dup_mode`` (instrument passes only; see visit_subs): the plain
        "tri2x" duplicate pass is CSE'd away by Mosaic (pure loads +
        pure math at identical addresses — only the winner-select chain
        re-runs), so it UNDER-measures per-candidate cost. The honest
        modes defeat CSE with an OPAQUE ZERO derived from a runtime
        value (zf = tref[tb] * 0.0 is not foldable under IEEE — tref
        could hold inf/NaN for all the compiler knows — and izoff =
        int(zf) poisons every downstream address), while staying
        bit-exact at runtime (izoff == 0; x + s*0.0 == x for the finite
        scene data):
        - "honest": re-issues the loads AND the MT math AND the selects
          at tb + izoff — the full per-candidate cost.
        - "loads": re-issues only the 9 geometry loads (+ address
          arithmetic), consumed via best_t += sum * zf."""
        if "notri" in _ABLATE:
            return best
        if dup_mode is not None:
            zf = tref[tb + 0] * jnp.float32(0.0)
            izoff = zf.astype(jnp.int32)
            if dup_mode == "loads":
                s = tref[tb + izoff]
                for k in range(1, 9):
                    s = s + tref[tb + izoff + k]
                return (best[0] + s * zf,) + tuple(best[1:])
            assert dup_mode == "honest"
            tb = tb + izoff
            nb = nb + izoff
        if rows is not None:
            # RRT_TRI_VMEM: the 9 geometry floats arrive as (1, 128)
            # broadcast rows preloaded from the VMEM table (one aligned
            # (SUB_TRIS*9, 128) vector load per sub visit) instead of 9
            # scalar SMEM loads per candidate — moves the candidate-data
            # traffic from the scalar port to the vector port. The math
            # below broadcasts (1,128) against the (R,128) ray planes;
            # values and acceptance are bit-identical.
            a0, a1, a2, e10, e11, e12, e20, e21, e22 = rows
        else:
            a0 = tref[tb + 0]
            a1 = tref[tb + 1]
            a2 = tref[tb + 2]
            e10 = tref[tb + 3]
            e11 = tref[tb + 4]
            e12 = tref[tb + 5]
            e20 = tref[tb + 6]
            e21 = tref[tb + 7]
            e22 = tref[tb + 8]

        # pvec = cross(D, e2)
        px = d_y * e22 - d_z * e21
        py = d_z * e20 - d_x * e22
        pz = d_x * e21 - d_y * e20
        det = e10 * px + e11 * py + e12 * pz
        # det * cull > 0 enforces facing AND kills dead lanes.
        accept = det * cu > 0.0

        tvx = o_x - a0
        tvy = o_y - a1
        tvz = o_z - a2
        u_num = tvx * px + tvy * py + tvz * pz
        # qvec = cross(tvec, e1)
        qx = tvy * e12 - tvz * e11
        qy = tvz * e10 - tvx * e12
        qz = tvx * e11 - tvy * e10
        v_num = d_x * qx + d_y * qy + d_z * qz
        t_num = e20 * qx + e21 * qy + e22 * qz

        if rational:
            # Division-free (see _RATIONAL): select on sign-normalized
            # numerators; du = |det| > 0 whenever `accept` holds, so all
            # cross-multiplied compares keep their direction.
            sgn = jnp.where(det < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
            du = det * sgn
            u_ = u_num * sgn
            v_ = v_num * sgn
            t_ = t_num * sgn
            cond = (
                accept
                & (u_ >= 0.0)
                & (v_ >= 0.0)
                & (u_ + v_ <= du)
                & (t_ >= tmin * du)
            )
            if any_hit:
                (bt,) = best  # tmax (live) or -1 (retired); both real t's
                upd = cond & (t_ < bt * du)
                return (jnp.where(upd, jnp.float32(-1.0), bt),)
            bt, bi, bu, bv, bd = best
            upd = cond & (t_ * bd < bt * du)
            bt = jnp.where(upd, t_, bt)
            bd = jnp.where(upd, du, bd)
            bi = jnp.where(upd, ti, bi)
            bu = jnp.where(upd, u_, bu)
            bv = jnp.where(upd, v_, bv)
            return bt, bi, bu, bv, bd

        # Unguarded: det == 0 makes t/u/v garbage, but `accept` is then
        # false (0 * cu > 0 fails), so the garbage can never be selected
        # (float division by zero does not trap on TPU).
        # "nodiv" ablation: skip the reciprocal (WRONG image) — isolates
        # the vector-divide latency from the rest of the MT arithmetic
        # (the divide is the longest-latency op in the 8-tri unroll).
        inv_det = det if "nodiv" in _ABLATE else 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        t = t_num * inv_det

        cond = (
            accept
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= tmin)
        )
        # t <= tmax folds into the strict best test (best_t starts at tmax).
        if any_hit:
            (bt,) = best
            upd = cond & (t < bt)
            # Mark and retire the lane (see docstring).
            return (jnp.where(upd, jnp.float32(-1.0), bt),)

        if defer_norms:
            # Winner (u, v) only; normals resolve in one gather pass
            # after traversal (see _resolve_normals).
            bt, bi, bu, bv = best
            upd = cond & (t < bt)
            bt = jnp.where(upd, t, bt)
            bi = jnp.where(upd, ti, bi)
            bu = jnp.where(upd, u, bu)
            bv = jnp.where(upd, v, bv)
            return bt, bi, bu, bv

        bt, bi, bx, by, bz = best
        upd = cond & (t < bt)
        bt = jnp.where(upd, t, bt)
        bi = jnp.where(upd, ti, bi)

        # Interpolated (unnormalized) shading normal of the winning
        # triangle (RayTracing.hlsl:83-86), tracked in-kernel so the
        # integrator never needs a per-ray table gather (XLA TPU
        # gathers at wavefront widths cost ~60 ms each).
        if "nonorm" in _ABLATE:
            return bt, bi, bx, by, bz
        na0 = nref[nb + 0]
        na1 = nref[nb + 1]
        na2 = nref[nb + 2]
        nb0 = nref[nb + 3]
        nb1 = nref[nb + 4]
        nb2 = nref[nb + 5]
        nc0 = nref[nb + 6]
        nc1 = nref[nb + 7]
        nc2 = nref[nb + 8]
        bx = jnp.where(upd, na0 + u * nb0 + v * nc0, bx)
        by = jnp.where(upd, na1 + u * nb1 + v * nc1, by)
        bz = jnp.where(upd, na2 + u * nb2 + v * nc2, bz)
        return bt, bi, bx, by, bz

    def read_best():
        """Winner state, scratch -> registers (once per cluster visit)."""
        if any_hit:
            return (best_t[rr],)
        if defer_norms:
            # best_nx/best_ny double as winner-u / winner-v storage
            # until the resolve pass overwrites them with normals
            # (rational mode adds best_nz as the winner denominator).
            best = (best_t[rr], best_i[rr], best_nx[rr], best_ny[rr])
            if rational:
                best = best + (best_nz[rr],)
            return best
        return (best_t[rr], best_i[rr], best_nx[rr], best_ny[rr],
                best_nz[rr])

    def write_best(best):
        best_t[rr] = best[0]
        if not any_hit:
            best_i[rr] = best[1]
            best_nx[rr] = best[2]
            best_ny[rr] = best[3]
            if not defer_norms or rational:
                best_nz[rr] = best[4]

    def visit_subs(ci, tref, tri_base, nref, norm_base):
        """Fine level for one cluster: bitmask-gated 8-tri subclusters.
        The winner state is threaded through the scan as a register
        carry — visit_sub(sl, best) -> best — so scratch is touched once
        per CLUSTER visit (read_best/write_best in visit_cluster), not
        once per subcluster. Measured ~neutral (see iter_set_bits_carry)
        — the per-visit floor is the scalar-loop trip, not scratch
        traffic — but the register carry never loses and makes the
        state movement explicit."""

        # RRT_TRI_VMEM fast path: candidate geometry from the (T*9, 128)
        # per-float broadcast VMEM table — one aligned (SUB_TRIS*9, 128)
        # vector load per sub visit instead of SUB_TRIS*9 scalar SMEM
        # loads. Instrument/ablation modes keep the SMEM path (their
        # opaque-zero address poisoning is defined on scalar loads).
        use_bc = (tri_bcast is not None
                  and not any(m in _ABLATE
                              for m in ("tri1", "tri2x", "tri2xh", "ld2x")))

        def visit_sub(sl, best):
            # "tri1" ablation: ONE MT test per visit instead of SUB_TRIS —
            # wrong image AND wrong workload (fewer hits -> emptier later
            # rounds), so it UNDERSTATES real tri cost; "tri2x" is the
            # uncontaminated instrument: it repeats the whole 8-tri loop
            # (idempotent — the strict `<` winner test re-rejects every
            # candidate the first pass accepted), so the image is
            # bit-identical and the time delta IS the per-visit MT
            # vector+load cost.
            if use_bc:
                base_row = (ci * cluster_size + sl * SUB_TRIS) * 9
                blk = tri_bcast[pl.ds(base_row, SUB_TRIS * 9), :]
                for k in range(SUB_TRIS):
                    best = tri_body(
                        ci * cluster_size + sl * SUB_TRIS + k,
                        None, 0, nref, 0, best,
                        rows=[blk[k * 9 + j:k * 9 + j + 1, :]
                              for j in range(9)])
                return best
            n_tris = 1 if "tri1" in _ABLATE else SUB_TRIS
            dup_pass = ("tri2x" if "tri2x" in _ABLATE else
                        "tri2xh" if "tri2xh" in _ABLATE else
                        "ld2x" if "ld2x" in _ABLATE else None)
            for p in range(2 if dup_pass else 1):
                mode = (None if p == 0 or dup_pass == "tri2x" else
                        "honest" if dup_pass == "tri2xh" else "loads")
                for k in range(n_tris):
                    tl = sl * SUB_TRIS + k
                    best = tri_body(ci * cluster_size + tl,
                                    tref, tri_base + tl * 9,
                                    nref, norm_base + tl * 9, best,
                                    dup_mode=mode)
            return best

        return visit_sub

    # Subcluster gating word width (resident mode; RRT_SUBWORD sweeps).
    # 32 = one reduction per 256-tri cluster; improvability then can't
    # prune WITHIN a cluster (all 32 sub bits are computed before any of
    # the word's visits). 16 would let the second half-word prune
    # against the first half's hits — MEASURED WORSE: ott 1080p 5-bounce
    # 41.5 -> 52.3 ms device median (the extra or-reduce + fori trip per
    # cluster visit swamps any pruning win; within-cluster best_t rarely
    # tightens enough to clear fine bits). Off-default knob kept with a
    # bit-parity test (test_subword_bit_parity). Streamed mode is pinned
    # at 16 regardless (bit == DMA ring slot).
    _sub_bits = int(os.environ.get("RRT_SUBWORD", "32"))

    _dup_subs = "sub2x" in _ABLATE  # per-visit cost instrument (see
                                    # gated_loop); output bit-identical

    if stream is None:
        def visit_cluster(ci):
            vs = visit_subs(ci, tri_sm, ci * cluster_size * 9,
                            norm_sm, ci * cluster_size * 9)
            if subs_per_cluster == 1:
                # RRT_SUBTRIS == cluster_size: no sub level at all — the
                # cluster gate already passed, so go straight to the
                # triangles (saves the one-box slab test, its OR
                # reduction, and the set-bit trip per cluster visit).
                write_best(vs(jnp.int32(0), read_best()))
            else:
                write_best(gated_loop(
                    subs_sm, ci * subs_per_cluster * 6, jnp.int32(0),
                    subs_per_cluster, vs,
                    bits_per_word=_sub_bits, dup=_dup_subs, width=_VISIT_W,
                    carry=read_best(),
                ))

        pre = None
    else:
        def visit_cluster(ci):
            slot = ci % N_STREAM_SLOTS  # == its gating-word bit
            _rec_dma(ci, slot).wait()
            base = slot * rec_len
            vs = visit_subs(ci, rec_scratch, base + tri_off, None, 0)
            if subs_per_cluster == 1:
                write_best(vs(jnp.int32(0), read_best()))
            else:
                write_best(gated_loop(
                    rec_scratch, base, jnp.int32(0), subs_per_cluster,
                    vs, dup=_dup_subs, width=_VISIT_W, carry=read_best(),
                ))

        pre = _issue_dmas

    # ---- Coarse level: Morton-order bitmask gates over clusters. The
    # streaming path pins 16-bit words (bit == DMA ring slot); the
    # resident path uses 32-bit words (half the scalar reductions).
    # Early termination lives *inside the bitmask scans* (gated_loop folds
    # a per-lane `entry <= best_t` improvability test into the overlap
    # bits): as the visit sequence tightens best_t, later subcluster — and
    # for multi-group scenes later cluster — scans prune boxes no live
    # lane can improve, at 2 vector ops per box and ZERO extra scalar
    # reductions. (Scalar-granular variants were both tried and were
    # slower: a near-to-far ordered visit benchmarked 4x worse — the
    # per-visit while_loop + argmin serialized the VPU — and a per-cluster
    # roll-tree bound check cost ~7 ms/frame at 1080p: every vector->
    # scalar reduction + branch stalls the in-order pipeline ~1 us.)
    cluster_bits = _GROUP_BITS if stream is not None else 32
    if "cl2x" in _ABLATE:
        # Honest duplicate of each CLUSTER visit (cost instrument,
        # bit-identical output): pass 2's sub-level gating word reads the
        # best_t that pass 1 tightened, so nothing CSEs with pass 1 and
        # the delta measures the full marginal per-cluster-visit cost —
        # sub gate planes + OR tree + extract + while-loop trips +
        # read/write_best scratch traffic + the pl.when/loop pipeline
        # boundaries (pass 2 usually gates off most subs, so its tri
        # loads/math are a small remainder).
        def visit_cluster(ci, _real=visit_cluster):
            _real(ci)
            _real(ci)

    flat1 = (_FLAT1 and num_clusters == 1 and num_supers <= 1
             and stream is None and subs_per_cluster > 1 and not _SEQGATE
             and R == _SUB)  # single-row blocks only (see the knob note)
    if flat1:
        # RRT_FLAT1 (see the knob comment): one-cluster scenes scan the
        # subcluster words directly as the top level. Visit set is
        # bit-identical to the two-level path (containment), `possible`
        # only gets tighter (sub-word OR instead of the cluster bit).
        vs = visit_subs(jnp.int32(0), tri_sm, 0, norm_sm, 0)
        out, possible = gated_loop(
            subs_sm, jnp.int32(0), jnp.int32(0), subs_per_cluster, vs,
            bits_per_word=_sub_bits, dup=_dup_subs, width=_VISIT_W,
            carry=read_best(), want_words=True)
        write_best(out)
    elif num_supers > 1:
        # Coarse third level: supers of SUPER_CLUSTERS clusters, gated
        # by the same packed-bitmask machinery; a visited super scans
        # its (16-aligned, so streamed DMA ring slots ci % 16 still
        # match the word-relative issue slots) 32-cluster span.
        def visit_super(si):
            gated_loop(cluster_sm, jnp.int32(num_supers * 6),
                       si * SUPER_CLUSTERS, SUPER_CLUSTERS,
                       visit_cluster, pre_visit=pre,
                       bits_per_word=cluster_bits)

        # ``possible`` (a conservative any-box-visited scalar; zero =>
        # no lane can have accepted a hit) comes from the SUPER words
        # here — a gated-on super whose clusters all gate off still
        # reads as possible, which is safe (possible may only be a
        # false positive, never a false negative).
        possible = gated_loop(cluster_sm, jnp.int32(0), jnp.int32(0),
                              num_supers, visit_super, bits_per_word=32)
    else:
        possible = gated_loop(cluster_sm, jnp.int32(0), jnp.int32(0),
                              num_clusters, visit_cluster, pre_visit=pre,
                              bits_per_word=cluster_bits)

    # ---- Rational resolve: three divisions per TRAVERSAL convert the
    # carried (num, den) winner back to real (t, u, v); unhit lanes keep
    # num = tmax, den = 1 exactly. Direct IEEE divides (not reciprocal-
    # multiply): a correctly-rounded divide is one op XLA cannot
    # re-associate, so the per-slot and batched-slot programs compute
    # bit-identical values — mul-by-reciprocal measured 1-ulp different
    # between the two program shapes under XLA:CPU contraction.
    # Both resolve passes sit behind the ``possible`` scalar: a tile
    # whose top-level gate words were all zero has best_t == tmax (num
    # tmax / den 1) on every lane — the resolves would be identity on t
    # and only fill the documented-garbage normal planes — and skipping
    # them saves the resolve window's roll trees + extracts on the
    # (majority, for small on-screen objects) miss-only tiles.
    if rational and not any_hit:
        # Unconditional (no pl.when on ``possible``): three vector
        # divides are cheaper than a branch region, and on a miss-only
        # tile they are exact identities (num tmax / den 1).
        den = best_nz[rr]
        best_t[rr] = best_t[rr] / den
        best_nx[rr] = best_nx[rr] / den
        best_ny[rr] = best_ny[rr] / den

    # ---- Deferred winner-normal resolve: ONE windowed gather pass over
    # the tile's winner triangle ids (Morton-coherent, so the id window is
    # narrow — a whole 1024-tri scene is a single 8-row group). The lerp
    # expression and winner (u, v) are exactly those the inline path would
    # have used, so results are bit-identical.
    if (not any_hit) and defer_norms:
        if "nonorm" in _ABLATE:
            best_ny[rr] = jnp.ones((R, _LANE), jnp.float32)
            best_nz[rr] = jnp.zeros((R, _LANE), jnp.float32)
            return possible

        rows_n = norm_vmem.shape[0] // 9
        n_all = rows_n // _SUB  # total 8-row groups in the table (static)

        def _resolve_norms():
            hitm = (best_t[rr] < tmax) & alive
            bi = best_i[rr]
            bu = best_nx[rr]
            bv = best_ny[rr]
            q = bi // _LANE
            r = bi % _LANE

            def _norm_group(base, accs):
                nx, ny, nz = accs
                brow = q - base
                tiles = [
                    norm_vmem[pl.ds(c * rows_n + base, _SUB), :]
                    for c in range(9)
                ]
                for j in range(_SUB):
                    mj = hitm & (brow == j)
                    g = [
                        jnp.take_along_axis(
                            jnp.broadcast_to(t[j:j + 1, :], (R, _LANE)),
                            r, axis=1)
                        for t in tiles
                    ]
                    nx = jnp.where(mj, g[0] + bu * g[3] + bv * g[6], nx)
                    ny = jnp.where(mj, g[1] + bu * g[4] + bv * g[7], ny)
                    nz = jnp.where(mj, g[2] + bu * g[5] + bv * g[8], nz)
                return nx, ny, nz

            accs0 = (jnp.zeros((R, _LANE), jnp.float32),
                     jnp.ones((R, _LANE), jnp.float32),
                     jnp.zeros((R, _LANE), jnp.float32))
            if n_all <= 2:
                # Statically tiny table (<=2048 tris): scan it whole — no
                # window reductions, no dynamic loop bound, zero stalls.
                accs = accs0
                for gi in range(n_all):
                    accs = _norm_group(jnp.int32(gi * _SUB), accs)
                nx, ny, nz = accs
            else:
                big = jnp.int32(2 ** 30)
                # Both window trees before either scalar extract: one pipe
                # drain for the pair (see envmap_pallas._window_scalars).
                lo_plane = _roll_tree_plane(jnp.where(hitm, q, big),
                                            jnp.minimum)
                hi_plane = _roll_tree_plane(jnp.where(hitm, q, -1),
                                            jnp.maximum)
                q_lo = lo_plane[0, 0]
                q_hi = hi_plane[0, 0]
                g0 = (q_lo // _SUB) * _SUB
                n_groups = q_hi // _SUB - q_lo // _SUB + 1  # <=0: no lane hit
                nx, ny, nz = jax.lax.fori_loop(
                    0, n_groups,
                    lambda i, a: _norm_group(g0 + i * _SUB, a), accs0)
                if "res2x" in _ABLATE:
                    # Honest duplicate of the resolve scan (cost instrument,
                    # bit-identical output): pass 2 starts from pass 1's
                    # accs, so every masked overwrite re-selects the same
                    # value; the OPAQUE ZERO row offset (q_lo is runtime
                    # data, so fp-mul-by-0 can't fold) defeats CSE the same
                    # way tri_body's dup modes do.
                    izoff = (q_lo.astype(jnp.float32)
                             * jnp.float32(0.0)).astype(jnp.int32)
                    nx, ny, nz = jax.lax.fori_loop(
                        0, n_groups,
                        lambda i, a: _norm_group(g0 + izoff + i * _SUB, a),
                        (nx, ny, nz))
            best_nx[rr] = nx
            best_ny[rr] = ny
            best_nz[rr] = nz

        if n_all <= 2:
            # Static tiny-table path: no window reductions, no extracts
            # — cheaper than a branch region, run unconditionally.
            _resolve_norms()
        else:
            # Dynamic-window path: the two window roll trees + extract
            # are a real drain — skip them when no box was even gated.
            pl.when(possible != 0)(_resolve_norms)

    return possible


def _pad_rays(x, n_pad):
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_closest(tri_packed, tri_norm_packed, cluster_bounds, sub_bounds,
                    origins, dirs, cull, limits, interpret=False):
    n = origins.shape[0]  # already padded to BLOCK_RAYS * GROUP multiple
    rows = n // _LANE
    grid = n // (BLOCK_RAYS * GROUP)

    def comp(x, i):
        return x[:, i].reshape(rows, _LANE)

    block_rows = _SUB * GROUP
    ray_spec = pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32_out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)
    t, idx, nx, ny, nz = pl.pallas_call(
        functools.partial(_kernel, cluster_size=tri_packed.shape[0] // cluster_bounds.shape[0]),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # limits (2,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tris flat (9T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tri normals flat (9T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clusters flat (6C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # subclusters flat (6T/8,)
            ray_spec, ray_spec, ray_spec,            # origin xyz
            ray_spec, ray_spec, ray_spec,            # dir xyz
            ray_spec,                                # cull
        ],
        out_specs=(out_spec,) * 5,
        out_shape=(
            f32_out,
            jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
            f32_out, f32_out, f32_out,
        ),
        scratch_shapes=[
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.int32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
            pltpu.VMEM((_SUB, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(
        limits.reshape(-1), tri_packed.reshape(-1),
        tri_norm_packed.reshape(-1), cluster_bounds.reshape(-1),
        sub_bounds.reshape(-1),
        comp(origins, 0), comp(origins, 1), comp(origins, 2),
        comp(dirs, 0), comp(dirs, 1), comp(dirs, 2),
        cull.reshape(rows, _LANE),
    )
    return (t.reshape(-1), idx.reshape(-1),
            nx.reshape(-1), ny.reshape(-1), nz.reshape(-1))


def pallas_intersect(scene: Scene, origins, dirs, want_front, alive,
                     tmin, tmax, interpret: bool = False):
    """IntersectFn implementation backed by the Pallas kernel.

    Returns (hit, t, tri_idx, normal) where normal is the (W, 3)
    *unnormalized* interpolated shading normal of the winning triangle
    (garbage on non-hit lanes — mask before use).
    """
    smem_bytes = (scene.tri_packed.size + scene.tri_norm_packed.size
                  + scene.cluster_bounds.size + scene.sub_bounds.size) * 4
    if smem_bytes > 1000 * 2 ** 10:
        # Triangle tables exceed the SMEM budget (scenes beyond ~14k
        # tris). The production path for such scenes is the fused frame
        # kernel's HBM-record streaming mode (framekernel.frame_call with
        # cluster_records) — this modular entry point falls back to XLA
        # brute force, which is only safe at modest ray widths.
        import warnings

        warnings.warn(
            f"scene tables ({smem_bytes // 1024} KiB) exceed the SMEM "
            "budget: modular pallas_intersect falls back to XLA brute "
            "force, which can fault the TPU runtime at full wavefront "
            "widths. Use the fused frame renderer (streams geometry "
            "per cluster) for large scenes.",
            RuntimeWarning, stacklevel=2)
        from refraction_tpu.ops.backends import xla_intersect

        return xla_intersect(scene, origins, dirs, want_front, alive,
                             tmin, tmax)

    n = origins.shape[0]
    chunk = BLOCK_RAYS * GROUP
    n_pad = ((n + chunk - 1) // chunk) * chunk

    cull = jnp.where(
        alive, jnp.where(want_front, jnp.float32(1.0), jnp.float32(-1.0)),
        jnp.float32(0.0),
    )
    o = _pad_rays(origins.astype(jnp.float32), n_pad)
    d = _pad_rays(dirs.astype(jnp.float32), n_pad)
    cull = _pad_rays(cull, n_pad)
    limits = jnp.asarray([[tmin, tmax]], jnp.float32)

    t, idx, nx, ny, nz = _pallas_closest(
        scene.tri_packed, scene.tri_norm_packed, scene.cluster_bounds,
        scene.sub_bounds, o, d, cull, limits, interpret=interpret,
    )
    t = t[:n]
    idx = idx[:n]
    hit = t < tmax  # best_t inits at tmax; miss lanes stay there
    normal = jnp.stack([nx[:n], ny[:n], nz[:n]], axis=-1)
    return hit, t, idx, normal
