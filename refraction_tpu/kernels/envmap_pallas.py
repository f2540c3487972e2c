"""Pallas TPU envmap miss shader: equirect texel fetch without XLA gathers.

The miss shader (RayTracing.hlsl:127-137) is a per-ray random access into
the environment map. XLA's TPU gather costs ~10 ns/ray (~80 ms per
wavefront round at 1080p widths) — it became the frame bottleneck once
intersection moved to Pallas. This kernel exploits two structural facts:

1. The whole envmap fits in VMEM (a 640x480 RGB f32 map is 3.7 MB),
   packed as (3*R, 128): flat texel index f = iy*W + ix lives at row
   (c*R + f//128), lane (f%128).
2. Ray blocks are *angularly coherent* (pixel-major primaries, and
   secondary rays inherit pixel order), so a block's flat indices span a
   narrow row window. The kernel scans only rows [min(q)//8*8, max(q)]
   in groups of 8, and resolves lanes with the hardware cross-lane
   ``dynamic_gather`` (jnp.take_along_axis axis=1) — 8 row-broadcast
   gathers per group, no scalar loops.

Dead lanes (weight 0) are excluded from the window min/max, and fully
dead blocks skip everything — late wavefront rounds cost ~nothing.

atan2/acos are polynomial implementations (utils/fastmath.py) because
Mosaic has no native lowering. The XLA env backend uses true
jnp.arctan2/arccos (it is shared with the numpy oracle), so the two env
paths agree to within one texel: a direction within ~1e-7 of a texel
truncation boundary may round to the neighbor.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from refraction_tpu.config import REF_PI_ENVMAP
from refraction_tpu.kernels.intersect_pallas import (
    _ABLATE, _VISIT_W, _bit_index, iter_set_bits, iter_set_bits_carry,
    iter_set_bits_fused)
from refraction_tpu.scene import Scene
from refraction_tpu.utils.fastmath import acos, atan2

BLOCK_RAYS = 1024
GROUP = 8  # tiles per grid program
_SUB = 8
_LANE = 128
# Env rows scanned per loop iteration (windowed path). Sweeping 8/16/32
# on monkey 1080p measured 23.72/23.61/~same ms — per-iteration overhead
# is minor; 16 amortizes the dynamic-offset loads slightly. Must divide
# the scene.env_packed 32-row channel padding.
_SCAN_ROWS = int(os.environ.get("RRT_ENV_SCAN", "16"))
assert 32 % _SCAN_ROWS == 0, (
    f"RRT_ENV_SCAN={_SCAN_ROWS} must divide the 32-row channel padding "
    "(scene.env_packed) or scans cross channel boundaries")
# Occupancy-gate granularity of env_window_accumulate (rows per gated
# group). 8 = one aligned (8,128) tile per visit. 4 halves the scanned
# rows per visit when occupancy is sparse: loads stay 8-aligned (the
# half-group selects its 4 rows out of the loaded tile with one extra
# select per row).
_ENV_SUB = int(os.environ.get("RRT_ENV_SUB", "8"))
assert _ENV_SUB in (4, 8), f"RRT_ENV_SUB={_ENV_SUB} must be 4 or 8"
# env_window_accumulate's static-word path materializes one gate word
# (plane + OR roll tree) per _WORD row-groups of the WHOLE env table —
# a win on the shipped coded assets (600 rows -> 3 words: all trees
# issue before one batched extract drain) but O(table size) per call on
# big maps. Above this many static words it falls back to a dynamic
# word WINDOW: two roll reductions find [min, max] occupied word and a
# fori visits only those, paying one extract per window word instead of
# n_words unconditional planes. 8 (=2048 rows at _ENV_SUB=8) keeps every
# shipped asset on the measured-fast static path.
_STATIC_ENV_WORDS = int(os.environ.get("RRT_ENV_STATIC_WORDS", "8"))
# Any-miss pre-gate of the accumulate scan — DEFAULT OFF since round 5
# (RRT_ENV_GATE=1 restores it): the gate predates the static-word scan,
# whose empty gate words already self-gate an all-hit block, so the
# pre-gate only ADDS a roll-max extract + branch region (~1 us) to
# every missing slot-round. Removing it measured (device medians):
# monkey 11.08 -> 10.74, shell ref-demo 11.2 -> 10.81, ott
# 30.8 -> 30.48, ott spp4 116.1 -> 115.8, monkey spp4 29.28 -> 29.03 —
# wins everywhere, bit-identical output (the ungated body adds exact
# zeros on all-dead blocks).
_ENV_GATE = os.environ.get("RRT_ENV_GATE", "0") != "0"


def _sublane_steps(rows: int):
    steps = []
    s = rows // 2
    while s >= 1:
        steps.append(s)
        s //= 2
    return steps


def _roll_min_plane(v):
    for s in (64, 32, 16, 8, 4, 2, 1):
        v = jnp.minimum(v, pltpu.roll(v, s, axis=1))
    for s in _sublane_steps(v.shape[0]):
        v = jnp.minimum(v, pltpu.roll(v, s, axis=0))
    return v


def _roll_max_plane(v):
    for s in (64, 32, 16, 8, 4, 2, 1):
        v = jnp.maximum(v, pltpu.roll(v, s, axis=1))
    for s in _sublane_steps(v.shape[0]):
        v = jnp.maximum(v, pltpu.roll(v, s, axis=0))
    return v


def _roll_min(v):
    return _roll_min_plane(v)[0, 0]


def _roll_max(v):
    return _roll_max_plane(v)[0, 0]


def _window_scalars(lo_masked, hi_masked):
    """min/max window bounds with both roll trees issued before either
    scalar extract. Measured NEUTRAL on device (Mosaic already schedules
    scalar reads by dataflow, not program order); kept because it makes
    the pairing explicit and costs nothing."""
    lo_plane = _roll_min_plane(lo_masked)
    hi_plane = _roll_max_plane(hi_masked)
    return lo_plane[0, 0], hi_plane[0, 0]


def _env_kernel(dx, dy, dz, w, env_ref, out_r, out_g, out_b,
                height: int, width: int, rows_per_chan: int):
    def tile(g, _):
        rows = pl.ds(g * _SUB, _SUB)
        _env_tile(
            dx[rows, :], dy[rows, :], dz[rows, :], w[rows, :], env_ref,
            lambda v: out_r.__setitem__((rows, slice(None)), v),
            lambda v: out_g.__setitem__((rows, slice(None)), v),
            lambda v: out_b.__setitem__((rows, slice(None)), v),
            height, width, rows_per_chan,
        )
        return 0

    jax.lax.fori_loop(0, GROUP, tile, 0)


def _lut_decode(codes, lut_ref, rows):
    """Decode (rows,128) int32 packed texel codes (r | g<<8 | b<<16 LUT
    indices) into three f32 tiles via the 256-entry LUT (lut_ref is
    (2,128): code c at row c//128, lane c%128). Exact: the LUT holds the
    identical f32 channel values the 3-plane layout would store."""
    row0 = jnp.broadcast_to(lut_ref[0:1, :], (rows, _LANE))
    row1 = jnp.broadcast_to(lut_ref[1:2, :], (rows, _LANE))

    def chan(sh):
        c = jnp.bitwise_and(jnp.right_shift(codes, sh), jnp.int32(255))
        lane = jnp.bitwise_and(c, jnp.int32(127))
        v0 = jnp.take_along_axis(row0, lane, axis=1)
        v1 = jnp.take_along_axis(row1, lane, axis=1)
        return jnp.where(c < 128, v0, v1)

    return chan(0), chan(8), chan(16)


def _rgbe_decode(codes):
    """Decode (rows,128) int32 Radiance RGBE words (r|g<<8|b<<16|e<<24)
    as ``m * 2^(e-136)`` (io/hdr.py rgbe_to_float) with the scale
    bit-assembled into the f32 exponent field. Exact for e > 9 and e == 0
    (black) — the cases scene.build_scene's fit check accepts."""
    e = jnp.bitwise_and(jnp.right_shift(codes, 24), jnp.int32(255))
    sc_bits = jnp.left_shift(e - 9, 23)
    scale = jnp.where(
        e > 9,
        jax.lax.bitcast_convert_type(sc_bits, jnp.float32),
        jnp.float32(0.0))

    def chan(sh):
        m = jnp.bitwise_and(jnp.right_shift(codes, sh),
                            jnp.int32(255)).astype(jnp.float32)
        return m * scale

    return chan(0), chan(8), chan(16)


def _pal_decode(codes, sh, lut_ref, rows):
    """Decode (rows,128) int32 words holding FOUR texels' 8-bit palette
    indices (texel f at byte f%4; ``sh`` = per-lane bit shift 8*(f%4)):
    three channel tables of the <=256-entry RGB-triple palette live at
    lut_ref rows 0-1 / 2-3 / 4-5. Exact — the palette holds the identical
    f32 channel values the 3-plane layout would store."""
    byte = jnp.bitwise_and(jnp.right_shift(codes, sh), jnp.int32(255))
    lane = jnp.bitwise_and(byte, jnp.int32(127))
    hi = byte >= 128

    def chan(c):
        v0 = jnp.take_along_axis(
            jnp.broadcast_to(lut_ref[2 * c:2 * c + 1, :], (rows, _LANE)),
            lane, axis=1)
        v1 = jnp.take_along_axis(
            jnp.broadcast_to(lut_ref[2 * c + 1:2 * c + 2, :], (rows, _LANE)),
            lane, axis=1)
        return jnp.where(hi, v1, v0)

    return chan(0), chan(1), chan(2)


def _env_decode(codes, lut_ref, rows, sh=None):
    """Flavor dispatch (static, shape-derived): (6,128) lut = 4-texel
    palette words (needs ``sh``); (2,128) = per-channel 256-entry LUT
    codes (8-bit-PNG sources); (1,128) = RGBE bytes (.hdr sources)."""
    if lut_ref.shape[0] == 6:
        return _pal_decode(codes, sh, lut_ref, rows)
    if lut_ref.shape[0] == 2:
        return _lut_decode(codes, lut_ref, rows)
    return _rgbe_decode(codes)


def _env_flat(x, y, z, height, width):
    """Equirect flat texel index f = iy*W + ix (RayTracing.hlsl:133-134)."""
    pi = jnp.float32(REF_PI_ENVMAP)
    theta = width * (atan2(x, z) / pi + 1.0) / 2.0
    phi = height * (acos(jnp.clip(y, -1.0, 1.0)) / pi)
    ix = jnp.clip(theta.astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(phi.astype(jnp.int32), 0, height - 1)
    return iy * width + ix


def _env_addr(f, packed4: bool):
    """Per-lane storage address of texel f: row q, lane r, and (palette
    flavor) the bit shift of its byte inside the 4-texel word."""
    if packed4:
        fw = jnp.right_shift(f, 2)
        sh = jnp.left_shift(jnp.bitwise_and(f, jnp.int32(3)), 3)
        return fw // _LANE, fw % _LANE, sh
    return f // _LANE, f % _LANE, None


def _env_indices(x, y, z, height, width):
    """Uncoded-layout texel address: per-lane flat row q and lane r."""
    f = _env_flat(x, y, z, height, width)
    return f // _LANE, f % _LANE


def env_window_tile(x, y, z, alive, env_ref,
                    height: int, width: int, rows_per_chan: int):
    """Equirect texel lookup for one (R,128) tile of directions (R = any
    power of two >= 8; the fused frame kernel batches several wavefront
    slots into one call so the two window roll-reductions — the dominant
    scalar-stall cost — are paid once per bounce round, not per slot).

    Returns (r, g, b) tiles — zeros where not alive. If *no* lane is
    alive the row window is empty and the scan loop self-gates to zero
    iterations, so callers need no any-alive gate. ``env_ref`` is the
    (3R, 128) flat-packed map in VMEM — or a ``(codes_ref, lut_ref)``
    tuple for the code-packed layout (one int32 gather per lane-row
    instead of three f32; exact LUT decode once per call). Shared by the
    standalone env kernel and the wavefront megakernels."""
    coded = isinstance(env_ref, tuple)
    packed4 = coded and env_ref[1].shape[0] == 6
    q, r, sh = _env_addr(
        _env_flat(x, y, z, height, width), packed4)

    big = jnp.int32(2 ** 30)
    q_lo, q_hi = _window_scalars(jnp.where(alive, q, big),
                                 jnp.where(alive, q, -1))
    return env_window_scan(q, r, sh, q_lo, q_hi, alive, env_ref,
                           rows_per_chan)


def env_window_addr(x, y, z, alive, env_ref, height, width):
    """The address/window half of env_window_tile: per-lane texel
    address (q, r, sh) and the scalar row window (q_lo, q_hi) over the
    ``alive`` lanes. Split out so the fused frame kernel can ISSUE the
    window roll trees + extracts BEFORE its traversal (their drain then
    overlaps the traversal's gate-plane vector work) and reuse the
    result when the traversal proves every lane missed."""
    coded = isinstance(env_ref, tuple)
    packed4 = coded and env_ref[1].shape[0] == 6
    q, r, sh = _env_addr(
        _env_flat(x, y, z, height, width), packed4)
    big = jnp.int32(2 ** 30)
    q_lo, q_hi = _window_scalars(jnp.where(alive, q, big),
                                 jnp.where(alive, q, -1))
    return q, r, sh, q_lo, q_hi


def env_window_scan(q, r, sh, q_lo, q_hi, alive, env_ref, rows_per_chan):
    """The scan half of env_window_tile (see env_window_addr)."""
    coded = isinstance(env_ref, tuple)
    rows = q.shape[0]
    zero = jnp.zeros((rows, _LANE), jnp.float32)
    scan = _SCAN_ROWS
    g0 = (q_lo // scan) * scan
    n_groups = q_hi // scan - q_lo // scan + 1
    if "envnoscan" in _ABLATE:
        n_groups = jnp.int32(0)

    # NOTE (both layouts): the inner row loops select on `brow == j`
    # WITHOUT an `alive &` — a dead lane may match and gather a garbage
    # texel, but every caller multiplies the result by a weight that is
    # zero on dead lanes, and dead lanes are already excluded from the
    # row window (q_lo/q_hi mask on `alive`), so they can never add
    # visits. Dropping the mask removes one vector op per scanned row.
    if coded:
        codes_ref, lut_ref = env_ref

        def cgroup(i, code_acc):
            base = g0 + i * scan
            brow = q - base
            tile = codes_ref[pl.ds(base, scan), :]
            for j in range(scan):
                mj = brow == j
                row = jnp.broadcast_to(tile[j:j + 1, :], (rows, _LANE))
                g = jnp.take_along_axis(row, r, axis=1)
                code_acc = jnp.where(mj, g, code_acc)
            return code_acc

        codes = jax.lax.fori_loop(
            0, n_groups, cgroup, jnp.zeros((rows, _LANE), jnp.int32))
        cr, cg, cb = _env_decode(codes, lut_ref, rows, sh)
        return (jnp.where(alive, cr, 0.0), jnp.where(alive, cg, 0.0),
                jnp.where(alive, cb, 0.0))

    n_chan = 1 if "envr" in _ABLATE else 3  # gather-cost ablation knob

    def group(i, accs):
        acc_r, acc_g, acc_b = accs
        base = g0 + i * scan
        brow = q - base
        tiles = [
            env_ref[pl.ds(c * rows_per_chan + base, scan), :]
            for c in range(n_chan)
        ]
        for j in range(scan):
            mj = brow == j
            for c, (tile, acc) in enumerate(
                zip(tiles, (acc_r, acc_g, acc_b))
            ):
                row = jnp.broadcast_to(tile[j:j + 1, :], (rows, _LANE))
                g = jnp.take_along_axis(row, r, axis=1)
                if c == 0:
                    acc_r = jnp.where(mj, g, acc_r)
                elif c == 1:
                    acc_g = jnp.where(mj, g, acc_g)
                else:
                    acc_b = jnp.where(mj, g, acc_b)
        return acc_r, acc_g, acc_b

    return jax.lax.fori_loop(0, n_groups, group, (zero, zero, zero))


_WORD = 32  # env row-groups gated per bitmask word


def env_window_accumulate(x, y, z, wgt, env_ref,
                          height: int, width: int, rows_per_chan: int,
                          acc_r, acc_g, acc_b):
    """Occupancy-gated equirect accumulate: ``acc_c += wgt * env_c(dir)``
    for every lane with ``wgt > 0``, written directly into the (rows,128)
    VMEM refs.

    env_window_tile scans EVERY 8-row group inside [min q, max q] — fine
    for coherent primary tiles (narrow window), but a tile whose rays
    refracted through the dielectric scatters across the whole map: at
    480x640 that is up to 300 groups x ~80 vector ops even though only a
    handful of groups contain any lane's texel (measured 9.7 ms of a
    24 ms 1080p monkey frame). Here group occupancy is packed into 32-bit
    words exactly like the traversal's AABB gates
    (intersect_pallas.gated_loop): per lane ``1 << (group - word_base)``,
    one OR roll-tree reduction per word, and ``@pl.when`` skips empty
    groups — scattered windows collapse to the occupied few.

    The WHOLE body (index math, window reductions, word machinery) sits
    behind one any-miss roll-max gate: a live slot-round where every ray
    HIT (deep interior refraction chains) previously still paid the
    atan2/acos index math + two window reductions (~100 vector ops) just
    to find an empty window — now it pays one ~20-op reduction."""
    coded = isinstance(env_ref, tuple)
    rows = x.shape[0]
    if not _ENV_GATE:
        # Default: no any-miss pre-gate (see _ENV_GATE). The static-word
        # body self-gates — an all-hit block yields all-zero gate words,
        # so the visit loop never fires and the (coded-path) accumulate
        # adds exact zeros; the pre-gate's saved index math + word
        # planes (~100 vector ops) cost less than its own roll-max
        # extract + branch region.
        _env_accumulate_body(x, y, z, wgt, env_ref, height, width,
                             rows_per_chan, acc_r, acc_g, acc_b, coded,
                             rows)
        return
    any_alive = _roll_max(wgt) > 0.0

    @pl.when(any_alive)
    def _accumulate():
        _env_accumulate_body(x, y, z, wgt, env_ref, height, width,
                             rows_per_chan, acc_r, acc_g, acc_b, coded, rows)


def _env_accumulate_body(x, y, z, wgt, env_ref, height, width,
                         rows_per_chan, acc_r, acc_g, acc_b, coded, rows):
    # Sample-batched callers (framekernel RRT_SPP_BATCH) pass a
    # (spp*8, 128) direction block but per-PIXEL (8, 128) accumulators:
    # fold the sample blocks (ascending, matching the sequential sample
    # loop's accumulation order) before the accumulate store.
    ar = acc_r.shape[0]
    if rows != ar:
        assert rows % ar == 0, (rows, ar)

        def _fold(v):
            out = v[0:ar, :]
            for b in range(1, rows // ar):
                out = out + v[b * ar:(b + 1) * ar, :]
            return out
    else:
        def _fold(v):
            return v

    alive = wgt > 0.0
    packed4 = coded and env_ref[1].shape[0] == 6
    q, r, sh = _env_addr(
        _env_flat(x, y, z, height, width), packed4)

    # STATIC word count over the whole table (no row window at all):
    # the dynamic-window variant paid one or-reduce EXTRACT (+ a Mosaic
    # loop region) per window word inside a rolled fori — on scattered
    # secondary rounds that is several ~0.6 us scalar drains per slot
    # round. With the word count static (4-texel-coded envmap.png: 600
    # rows -> 75 groups -> 3 words), ALL word planes + OR roll trees
    # issue before a single batched extract drain, and the visits run in
    # ONE fused while loop across every word
    # (intersect_pallas.iter_set_bits_fused — same visit set and order:
    # occupied groups, ascending). The window reduction itself (a
    # two-tree drain) disappears with the window.
    rows_total = env_ref[0].shape[0] if coded else rows_per_chan
    n_groups_total = -(-rows_total // _ENV_SUB)
    n_words = -(-n_groups_total // _WORD)  # python int: static
    if "envnoscan" in _ABLATE:
        n_words = 0
    gq = q // _ENV_SUB  # per-lane ABSOLUTE group index

    # Large-table fallback (see _STATIC_ENV_WORDS): dynamic word window.
    dyn_words = n_words > _STATIC_ENV_WORDS
    if dyn_words:
        wq = gq // _WORD
        lo_w = _roll_min(jnp.where(alive, wq, jnp.int32(2 ** 30)))
        hi_w = _roll_max(jnp.where(alive, wq, jnp.int32(-1)))
        n_dyn = hi_w - lo_w + 1  # <= 0 when no lane is alive: zero trips

    def _load_rows(ref, base_rows, chan_base=0):
        """The group's _ENV_SUB rows as (1,128) slices. Loads are always
        8-row aligned; at _ENV_SUB=4 the half-group picks its 4 rows out
        of the containing tile with one scalar-cond select per row."""
        if _ENV_SUB == 8:
            t = ref[pl.ds(chan_base + base_rows, 8), :]
            return [t[j:j + 1, :] for j in range(8)]
        base8 = (base_rows // 8) * 8
        lo_half = base_rows == base8
        t = ref[pl.ds(chan_base + base8, 8), :]
        return [jnp.where(lo_half, t[j:j + 1, :], t[j + 4:j + 5, :])
                for j in range(4)]

    def _roll_or_plane(bits):
        for s in (64, 32, 16, 8, 4, 2, 1):
            bits = bits | pltpu.roll(bits, s, axis=1)
        for s in _sublane_steps(rows):
            bits = bits | pltpu.roll(bits, s, axis=0)
        return bits

    def word_bits(wi):
        rel = gq - wi * _WORD
        in_word = alive & (rel >= 0) & (rel < _WORD)
        sh = jnp.clip(rel, 0, _WORD - 1)
        return jnp.where(in_word,
                         jnp.left_shift(jnp.int32(1), sh), jnp.int32(0))

    if coded:
        codes_ref, lut_ref = env_ref

        def cvisit(g, code_acc):
            base = g * _ENV_SUB
            brow = q - base
            for j, rowj in enumerate(_load_rows(codes_ref, base)):
                # no `alive &`: see env_window_tile's layout note — dead
                # lanes' garbage is killed by the zero weight below.
                mj = brow == j
                row = jnp.broadcast_to(rowj, (rows, _LANE))
                g_ = jnp.take_along_axis(row, r, axis=1)
                code_acc = jnp.where(mj, g_, code_acc)
            return code_acc

        # All word planes + OR trees BEFORE the (single) extract drain;
        # then one fused while loop over every word. cvisit is an
        # overwrite-select (idempotent), so _VISIT_W-wide picks keep the
        # iter_set_bits_paired duplicate contract.
        code0 = jnp.zeros((rows, _LANE), jnp.int32)
        if dyn_words:
            def wbody(i, codes):
                wi = lo_w + i
                w = _roll_or_plane(word_bits(wi))[0, 0]
                (codes,) = iter_set_bits_carry(
                    w, lambda b, c: (cvisit(wi * _WORD + b, c[0]),),
                    (codes,), width=_VISIT_W)
                return codes

            codes = jax.lax.fori_loop(0, n_dyn, wbody, code0)
        elif n_words == 0:
            codes = code0
        elif n_words == 1:
            words = [_roll_or_plane(word_bits(0))[0, 0]]

            def body(c):
                w, acc = c
                b_prev = None
                for _ in range(_VISIT_W):
                    iso = jnp.bitwise_and(w, jnp.int32(0) - w)
                    b = _bit_index(iso)
                    if b_prev is not None:
                        b = jnp.where(w != 0, b, b_prev)
                    acc = cvisit(b, acc)
                    b_prev = b
                    w = jnp.bitwise_and(w, jnp.bitwise_not(iso))
                return w, acc

            _, codes = jax.lax.while_loop(
                lambda c: c[0] != 0, body, (words[0], code0))
        else:
            planes = [_roll_or_plane(word_bits(wi)) for wi in range(n_words)]
            words = [pl_[0, 0] for pl_ in planes]
            (codes,) = iter_set_bits_fused(
                words, [wi * _WORD for wi in range(n_words)],
                lambda g, c: (cvisit(g, c[0]),), (code0,),
                width=_VISIT_W)
        cr, cg, cb = _env_decode(codes, lut_ref, rows, sh)
        acc_r[:] = acc_r[:] + _fold(wgt * cr)
        acc_g[:] = acc_g[:] + _fold(wgt * cg)
        acc_b[:] = acc_b[:] + _fold(wgt * cb)
        return

    n_chan = 1 if "envr" in _ABLATE else 3  # gather-cost ablation knob

    def visit(g):
        base = g * _ENV_SUB
        brow = q - base
        chans = [_load_rows(env_ref, base, c * rows_per_chan)
                 for c in range(n_chan)]
        gr = jnp.zeros((rows, _LANE), jnp.float32)
        gg = jnp.zeros((rows, _LANE), jnp.float32)
        gb = jnp.zeros((rows, _LANE), jnp.float32)
        for j in range(_ENV_SUB):
            # no `alive &` (dead lanes: wgt == 0 below); no hit_any mask
            # either — g* stay zero on lanes whose texel row is outside
            # this group, and a live lane's row is in EXACTLY one visited
            # group, so `wgt * g*` accumulates each lane once.
            mj = brow == j
            for c, rows_l in enumerate(chans):
                row = jnp.broadcast_to(rows_l[j], (rows, _LANE))
                v = jnp.take_along_axis(row, r, axis=1)
                if c == 0:
                    gr = jnp.where(mj, v, gr)
                elif c == 1:
                    gg = jnp.where(mj, v, gg)
                else:
                    gb = jnp.where(mj, v, gb)
        acc_r[:] = acc_r[:] + _fold(wgt * gr)
        acc_g[:] = acc_g[:] + _fold(wgt * gg)
        acc_b[:] = acc_b[:] + _fold(wgt * gb)

    # One scalar-loop trip per SET bit, all words in one fused loop
    # (width 1: the accumulate STORE is not idempotent, so no
    # duplicate picks). A two-level variant (one coarse word gating
    # the fine words) measured WORSE (monkey +0.7 ms, ott +0.7).
    if dyn_words:
        def wbody(i, c):
            wi = lo_w + i
            iter_set_bits(_roll_or_plane(word_bits(wi))[0, 0],
                          lambda b: visit(wi * _WORD + b))
            return c

        jax.lax.fori_loop(0, n_dyn, wbody, jnp.int32(0))
        return
    planes = [_roll_or_plane(word_bits(wi)) for wi in range(n_words)]
    words = [pl_[0, 0] for pl_ in planes]
    if n_words == 1:
        iter_set_bits(words[0], visit)
    elif n_words > 1:
        def _vf(g, c):
            visit(g)
            return c

        iter_set_bits_fused(words, [wi * _WORD for wi in range(n_words)],
                            _vf, (jnp.int32(0),), width=1)


def _env_tile(x, y, z, wgt, env_ref, put_r, put_g, put_b,
              height: int, width: int, rows_per_chan: int):
    zero = jnp.zeros((_SUB, _LANE), jnp.float32)
    alive = wgt > 0.0
    # Cheap any(): roll-max of the weight (scalar reductions are the
    # per-tile cost floor on TPU; roll trees are plain vector ops).
    any_alive = _roll_max(wgt) > 0.0

    put_r(zero)
    put_g(zero)
    put_b(zero)

    @pl.when(any_alive)
    def _():
        acc_r, acc_g, acc_b = env_window_tile(
            x, y, z, alive, env_ref, height, width, rows_per_chan
        )
        put_r(wgt * acc_r)
        put_g(wgt * acc_g)
        put_b(wgt * acc_b)


def _pad(x, n_pad, fill=0.0):
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )
    return x


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def _env_call(env_flat, dirs, weight, height, width, interpret=False):
    n = dirs.shape[0]
    rows = n // _LANE
    grid = n // (BLOCK_RAYS * GROUP)
    rows_per_chan = env_flat.shape[0] // 3

    ray_spec = pl.BlockSpec((_SUB * GROUP, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32_out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)

    def comp(i):
        return dirs[:, i].reshape(rows, _LANE)

    r, g, b = pl.pallas_call(
        functools.partial(
            _env_kernel, height=height, width=width,
            rows_per_chan=rows_per_chan,
        ),
        grid=(grid,),
        in_specs=[
            ray_spec, ray_spec, ray_spec, ray_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # env (3R, 128)
        ],
        out_specs=(ray_spec,) * 3,
        out_shape=(f32_out, f32_out, f32_out),
        interpret=interpret,
    )(comp(0), comp(1), comp(2), weight.reshape(rows, _LANE), env_flat)
    return jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)


def pallas_env_contribution(scene: Scene, dirs, weight,
                            interpret: bool = False):
    """Weighted miss contributions: weight[i] * envmap(dirs[i]), (W, 3).

    weight must already be zero on non-miss / dead lanes.
    """
    if scene.env_packed.size * 4 > 8 * 2 ** 20:
        # Envmap too large for VMEM residency: XLA gather fallback.
        from refraction_tpu.ops.backends import xla_env_contribution

        return xla_env_contribution(scene, dirs, weight)

    n = dirs.shape[0]
    chunk = BLOCK_RAYS * GROUP
    n_pad = ((n + chunk - 1) // chunk) * chunk
    d = _pad(dirs.astype(jnp.float32), n_pad, fill=1.0)
    w = _pad(weight.astype(jnp.float32), n_pad, fill=0.0)
    h, wid = scene.envmap.shape[0], scene.envmap.shape[1]
    env_flat = scene.env_packed.reshape(-1, _LANE)
    out = _env_call(env_flat, d, w, h, wid, interpret=interpret)
    return out[:n]
