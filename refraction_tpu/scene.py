"""Scene representation: device-resident triangle soup + environment map.

The TPU-native replacement for the reference's GPU resource zoo — vertex /
index upload buffers (Mesh.cpp:55-94), the BLAS/TLAS acceleration structures
(RefractionDemo.cpp:272-361) and SRV descriptor tables (RefractionDemo.cpp:466-511)
all collapse into one immutable pytree of dense arrays:

- triangles are Morton-sorted at build time (our BLAS-build equivalent) and
  padded with degenerate triangles to a multiple of the cluster size, so
  every downstream kernel sees static, tile-aligned shapes;
- per-cluster AABBs play the role of the acceleration structure;
- Möller–Trumbore inputs (A, e1, e2) are precomputed once.

The pytree passes straight through jit/shard_map; geometry is replicated
across devices (scenes are tiny — SURVEY.md 2.4) while rays/pixels shard.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import numpy as np

from refraction_tpu.bvh.clusters import build_clusters
from refraction_tpu.bvh.morton import (hilbert_order, median_split_order,
                                       morton_order)
from refraction_tpu.config import RenderConfig
from refraction_tpu.io.objmesh import MeshData, parse_obj
from refraction_tpu.io.texture import load_texture


class Scene(NamedTuple):
    """All-array scene pytree (leaves may be numpy or jax arrays)."""

    tri_a: np.ndarray        # (T, 3)  first vertex
    tri_e1: np.ndarray       # (T, 3)  B - A
    tri_e2: np.ndarray       # (T, 3)  C - A
    tri_norm: np.ndarray     # (T, 3, 3) per-corner shading normals
    tri_packed: np.ndarray   # (T, 9)  [A | e1 | e2] rows (kernel layout)
    tri_norm_packed: np.ndarray  # (T, 9) [nA | nB-nA | nC-nA] (kernel layout)
    cluster_lo: np.ndarray   # (C, 3) cluster AABB min
    cluster_hi: np.ndarray   # (C, 3) cluster AABB max
    cluster_bounds: np.ndarray  # (C, 6) [lo | hi] rows (kernel layout)
    sub_bounds: np.ndarray      # (T/8, 6) fine 8-tri subcluster AABBs
    envmap: np.ndarray       # (H, W, 3) float32 equirect environment
    env_packed: np.ndarray   # (3, R, 128) float32: flattened H*W texels per
                             # channel, 128 per row (envmap kernel layout)
    cluster_records: np.ndarray  # (C * rec_pad,) float32 per-cluster record
                             # [sub AABBs | tri9] — the HBM table the
                             # streaming traversal DMAs per visited cluster
                             # (size-agnostic path; kernels/intersect_pallas
                             # rec_len_for; normals resolve from
                             # tri_norm_vmem instead of streaming)
    tri_norm_vmem: np.ndarray  # (9*Rn, 128) float32 normal gather table:
                             # channel c of [nA | nB-nA | nC-nA] for tri ti
                             # lives at row c*Rn + ti//128, lane ti%128. Used
                             # by the deferred winner-normal resolve (the
                             # inner tri loop tracks (u, v, id) only)
    env_codes: np.ndarray    # int32 packed texel codes; flavor is given by
                             # env_lut's static shape:
                             #  (6,128) palette: codes (R/4,128) hold FOUR
                             #    texels/word (8-bit indices into a 256-RGB-
                             #    triple palette; texel f at byte f%4 of
                             #    word f//4) — scan windows shrink 4x;
                             #  (2,128) LUT: one texel/word, three 8-bit
                             #    per-channel value indices (r|g<<8|b<<16);
                             #  (1,128) RGBE: one texel/word, raw Radiance
                             #    bytes decoded arithmetically.
                             # (1,128) zero codes = uncoded (3-plane f32).
    env_lut: np.ndarray      # decode table (see env_codes): palette rows
                             # 0-1/2-3/4-5 = r/g/b channel of triple c at
                             # row c//128, lane c%128; LUT = the 256-entry
                             # shared value table
    tri_mask: np.ndarray = None  # (T,) int32 per-triangle instance mask
                             # (DXR InstanceMask baked per tri; pad tris
                             # 0). Table (Morton/median) order — matches
                             # tri_a/e1/e2, NOT the f2b-permuted kernel
                             # tables: per-ray masks are a wavefront/XLA
                             # -path capability (xla_intersect ray_mask);
                             # the fused kernel serves the reference's
                             # constant-0xff ray mask
                             # (RayTracing.hlsl:60,106,121).

    @property
    def num_tris(self) -> int:
        return int(self.tri_a.shape[0])

    @property
    def num_clusters(self) -> int:
        return int(self.cluster_lo.shape[0])


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static (non-traced) facts about a built scene."""

    num_real_tris: int
    num_padded_tris: int
    cluster_size: int
    scene_path: str = ""
    envmap_path: str = ""


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Triangles per fine (subcluster) AABB — the traversal's finest gating
# granularity. Kernel layouts (sub_bounds, cluster_records) derive from
# it; kernels/intersect_pallas imports it from here.
SUB_TRIS = int(os.environ.get("RRT_SUBTRIS", "8"))

# Clusters per coarse third-level AABB (hier mode). RRT_SUPER_SIZE
# sweeps it; must stay a multiple of 16 so a super's 16-cluster spans
# keep the streamed DMA ring slot identity (ci % 16 == word bit).
# Lives here (not kernels/) so the median-split ordering can mirror the
# traversal hierarchy without a scene->kernels import cycle.
SUPER_CLUSTERS = int(os.environ.get("RRT_SUPER_SIZE", "32"))
assert SUPER_CLUSTERS % 16 == 0 and SUPER_CLUSTERS > 0, SUPER_CLUSTERS


def build_scene(
    mesh: MeshData,
    envmap: np.ndarray,
    cluster_size: int = 32,
    tri_mask: np.ndarray | None = None,
) -> tuple[Scene, SceneMeta]:
    """Spatially sort (RRT_CURVE), pad, and precompute intersection
    inputs.

    ``tri_mask`` (num_tris,) int: per-triangle DXR InstanceMask bytes
    (build_instanced_scene bakes per-instance masks here; default all
    1, the reference's instance mask). Carried in table order for the
    wavefront path's per-ray mask test; pad triangles get mask 0."""
    assert cluster_size % SUB_TRIS == 0 and cluster_size >= SUB_TRIS, (
        f"cluster_size={cluster_size} must be a multiple of "
        f"SUB_TRIS={SUB_TRIS} (kernel gating/record layouts divide by it)")
    t_real = mesh.num_tris
    # Triangle ordering sets super/cluster/subcluster AABB tightness,
    # i.e. traversal speed. RRT_CURVE: median (default — cascaded
    # kd-style median split over the traversal hierarchy; measured
    # device medians vs hilbert at 1080p: monkey 18.3->17.3 ms, shell
    # 28.0->24.7, ott 49.6->45.8, 81,920-tri icosphere 53.8->45.6),
    # hilbert (no diagonal jumps, ~20% tighter clusters than morton),
    # morton (round-1 baseline).
    curve = os.environ.get("RRT_CURVE", "median")
    if curve == "median":
        order = median_split_order(
            mesh.positions,
            (SUPER_CLUSTERS * cluster_size, cluster_size, SUB_TRIS))
    elif curve == "hilbert":
        order = hilbert_order(mesh.positions)
    elif curve == "morton":
        order = morton_order(mesh.positions)
    else:
        # A typo'd knob silently benchmarking the wrong ordering poisons
        # perf experiments — fail loudly.
        raise ValueError(f"RRT_CURVE={curve!r}: use median|hilbert|morton")
    pos = mesh.positions[order]
    norm = mesh.normals[order]
    if tri_mask is None:
        tri_mask = np.ones(t_real, np.int32)
    mask = np.asarray(tri_mask, np.int32)[order]

    t_pad = max(_round_up(max(t_real, 1), cluster_size), cluster_size)
    if t_pad > t_real:
        # Degenerate padding: repeat the last real triangle's first vertex as
        # all three corners -> zero-area, never intersected (det == 0), and
        # a point inside the final cluster so its AABB stays tight.
        if t_real > 0:
            pad_pt = pos[-1, 0]
        else:
            pad_pt = np.zeros(3, np.float32)
        pad_pos = np.broadcast_to(pad_pt, (t_pad - t_real, 3, 3)).copy()
        pad_norm = np.broadcast_to(
            np.array([0, 1, 0], np.float32), (t_pad - t_real, 3, 3)
        ).copy()
        pos = np.concatenate([pos, pad_pos])
        norm = np.concatenate([norm, pad_norm])
        mask = np.concatenate([mask, np.zeros(t_pad - t_real, np.int32)])

    # Optional front-to-back cluster ordering (RRT_ORDER_FROM="x,y,z"):
    # permute whole cluster blocks by AABB-center distance from a point
    # (the camera). The traversal visits clusters in ascending table
    # order with improvability gating (intersect_pallas.py:481-495), so
    # a near-to-far order lets an early hit prune far clusters — the
    # moral of DXR's ordered BVH traversal (RayTracing.hlsl:60) — at
    # ZERO in-kernel cost (an in-kernel ordered scan measured 4x slower;
    # TODO.md "tried and reverted"). Every downstream table and the
    # oracle derive from this array order, so parity is exact.
    order_from = os.environ.get("RRT_ORDER_FROM")
    if order_from:
        pt = np.asarray([float(v) for v in order_from.split(",")],
                        np.float32)
        c_lo, c_hi = build_clusters(pos, cluster_size)
        centers = 0.5 * (c_lo + c_hi)
        perm = np.argsort(((centers - pt) ** 2).sum(axis=1), kind="stable")
        blocks = perm[:, None] * cluster_size + np.arange(cluster_size)
        pos = pos[blocks.reshape(-1)]
        norm = norm[blocks.reshape(-1)]
        mask = mask[blocks.reshape(-1)]

    lo, hi = build_clusters(pos, cluster_size)
    sub_lo, sub_hi = build_clusters(pos, SUB_TRIS)
    tri_a = np.ascontiguousarray(pos[:, 0])
    tri_e1 = np.ascontiguousarray(pos[:, 1] - pos[:, 0])
    tri_e2 = np.ascontiguousarray(pos[:, 2] - pos[:, 0])
    envmap = np.ascontiguousarray(envmap, dtype=np.float32)

    # Streaming-traversal records: one row per cluster holding its
    # subcluster AABBs + triangle + normal data, so scenes whose tables
    # exceed the SMEM budget stream per-visited-cluster (DXR's build is
    # size-agnostic, RefractionDemo.cpp:272-361 — so is this path).
    tri_packed = np.ascontiguousarray(
        np.concatenate([tri_a, tri_e1, tri_e2], axis=1))
    tri_norm_packed = np.ascontiguousarray(
        np.concatenate(
            [norm[:, 0], norm[:, 1] - norm[:, 0], norm[:, 2] - norm[:, 0]],
            axis=1))
    sub_bounds = np.ascontiguousarray(np.concatenate([sub_lo, sub_hi], axis=1))
    n_clusters = lo.shape[0]
    spc = cluster_size // SUB_TRIS
    # Record layout must match kernels/intersect_pallas.rec_len_for:
    # normals are not streamed (deferred winner-normal resolve reads the
    # VMEM gather table below), halving per-cluster DMA bytes.
    rec_len = spc * 6 + cluster_size * 9
    rec_pad = ((rec_len + 1023) // 1024) * 1024  # whole (8,128) DMA tiles
    cluster_records = np.zeros((n_clusters, rec_pad), np.float32)
    cluster_records[:, :rec_len] = np.concatenate(
        [
            sub_bounds.reshape(n_clusters, spc * 6),
            tri_packed.reshape(n_clusters, cluster_size * 9),
        ],
        axis=1,
    )
    cluster_records = np.ascontiguousarray(cluster_records.reshape(-1))

    # Deferred-normal gather table: the traversal inner loop no longer
    # interpolates candidate normals (9 SMEM loads + ~19 vector ops per
    # visited triangle — measured 7.7 ms of a 24 ms monkey 1080p frame);
    # it tracks the winner's (u, v, id) and a post-traversal pass gathers
    # the winner's 9 normal floats from this VMEM table with the same
    # windowed cross-lane-gather trick as the envmap kernel.
    rows_n = _round_up(t_pad, 128 * 8) // 128
    tri_norm_vmem = np.zeros((9, rows_n, 128), np.float32)
    for c in range(9):
        tri_norm_vmem[c].reshape(-1)[:t_pad] = tri_norm_packed[:, c]
    tri_norm_vmem = tri_norm_vmem.reshape(9 * rows_n, 128)

    # Envmap kernel layout: flat texels, 128 per row, rows padded to 32
    # (the env scan loads row-blocks of up to 32 at dynamic offsets
    # aligned to the block size; padding keeps every load in-channel).
    flat = envmap.reshape(-1, 3)
    n_tex = flat.shape[0]
    rows = _round_up(max(n_tex, 1), 128 * 32) // 128
    env_packed = np.zeros((3, rows, 128), np.float32)
    for c in range(3):
        env_packed[c].reshape(-1)[:n_tex] = flat[:, c]

    # Code-packed variant: when the map has <=256 distinct channel values
    # (always true for 8-bit PNG sources — the reference's actual asset,
    # since envMap.hdr is missing upstream), pack each texel as three
    # 8-bit LUT indices in ONE int32. The fused kernel's env scan then
    # gathers one int32 per lane instead of three f32 (3x fewer gathers
    # and tile loads) and decodes via the exact LUT once per call —
    # bit-identical radiance. Maps with more values (HDR, procedural
    # float) keep the 3-plane f32 path (placeholder (1, 128) codes).
    uniq = np.unique(flat)
    word = None
    code_rows = rows
    # Palette flavor first (preferred): <=256 distinct RGB TRIPLES (true
    # for the reference's envmap.png — 135) packs FOUR texels' 8-bit
    # palette indices per int32 word. The env scan's visit cost is pure
    # gather/select over code rows (measured: the whole remaining env
    # cost; index math and window reductions are free), so quartering the
    # row count quarters coherent windows and merges scattered visits.
    # Decode via three 256-entry channel tables — bit-identical radiance.
    trip_view = np.ascontiguousarray(flat).view(
        [("r", np.float32), ("g", np.float32), ("b", np.float32)]
    ).reshape(-1)
    uniq_t, inv_t = np.unique(trip_view, return_inverse=True)
    if uniq_t.size <= 256:
        n4 = _round_up(max(n_tex, 1), 4)
        idx8 = np.zeros(n4, np.int64)
        idx8[:n_tex] = inv_t.reshape(-1)
        w64 = (idx8[0::4] | (idx8[1::4] << 8) | (idx8[2::4] << 16)
               | (idx8[3::4] << 24))
        word = w64.astype(np.uint32).view(np.int32)
        pal = np.zeros((3, 256), np.float32)
        pal[0, :uniq_t.size] = uniq_t["r"]
        pal[1, :uniq_t.size] = uniq_t["g"]
        pal[2, :uniq_t.size] = uniq_t["b"]
        env_lut = pal.reshape(6, 128)
        code_rows = _round_up(max(word.size, 1), 128 * 32) // 128
    elif uniq.size <= 256:
        lut = np.zeros(256, np.float32)
        lut[:uniq.size] = uniq
        idx = np.searchsorted(uniq, flat)  # exact: values come from uniq
        word = (idx[:, 0] | (idx[:, 1] << 8) | (idx[:, 2] << 16)).astype(
            np.int32)
        env_lut = lut.reshape(2, 128)
    else:
        # RGBE flavor: if the map is exactly representable as Radiance
        # RGBE bytes (true for values decoded FROM an .hdr file — the
        # roundtrip is lossless) with exponents the kernel's
        # bit-assembled 2^(e-136) covers (e > 9, i.e. values >~1e-36),
        # pack the original bytes; the kernel decodes arithmetically.
        # env_lut (1, 128) marks this flavor (vs (2, 128) for LUT).
        from refraction_tpu.io.hdr import float_to_rgbe, rgbe_to_float

        with np.errstate(all="ignore"):
            rgbe = float_to_rgbe(flat)
            exact = np.array_equal(rgbe_to_float(rgbe), flat)
        e = rgbe[:, 3].astype(np.int64)
        if exact and bool(((e == 0) | (e > 9)).all()):
            w64 = (rgbe[:, 0].astype(np.int64)
                   | (rgbe[:, 1].astype(np.int64) << 8)
                   | (rgbe[:, 2].astype(np.int64) << 16)
                   | (e << 24))
            word = w64.astype(np.uint32).view(np.int32)
            env_lut = np.zeros((1, 128), np.float32)
    if word is not None:
        env_codes = np.zeros((code_rows, 128), np.int32)
        env_codes.reshape(-1)[:word.size] = word
    else:
        env_codes = np.zeros((1, 128), np.int32)
        env_lut = np.zeros((2, 128), np.float32)

    scene = Scene(
        tri_a=tri_a,
        tri_e1=tri_e1,
        tri_e2=tri_e2,
        tri_norm=np.ascontiguousarray(norm),
        tri_packed=tri_packed,
        tri_norm_packed=tri_norm_packed,
        cluster_lo=lo,
        cluster_hi=hi,
        cluster_bounds=np.ascontiguousarray(np.concatenate([lo, hi], axis=1)),
        sub_bounds=sub_bounds,
        envmap=envmap,
        env_packed=env_packed,
        cluster_records=cluster_records,
        tri_norm_vmem=tri_norm_vmem,
        env_codes=env_codes,
        env_lut=env_lut,
        tri_mask=np.ascontiguousarray(mask),
    )
    meta = SceneMeta(
        num_real_tris=t_real,
        num_padded_tris=t_pad,
        cluster_size=cluster_size,
    )
    return scene, meta


def auto_cluster_size(num_tris: int) -> int:
    """Empirical per-scene cluster size (device-ms sweeps at 1080p on one
    v5e; re-swept round 4 under the rational+paired defaults after the
    honest cost instruments showed the frame is dominated by per-
    cluster-visit serialization — the ~1 us vector->scalar gate-word
    extract + loop-region boundaries each visit pays — so fewer, bigger
    cluster visits win almost everywhere: ott 12877t 1024 > 512 > 256
    (34.8 vs 35.8 vs 39.7 ms) with a cliff at 2048 (59.3 — 7 clusters
    can't cull), monkey 967t 1024 > 512 > 256 (13.10/13.22/13.99,
    single-cluster: the one cluster box still rejects background
    tiles), shell 1536t 128 < 256/512 (11.61/11.95/11.77 — the nested
    shells want fine culling), streamed 81,920t icosphere 512 > 256
    (DMA-ring record size is SMEM-capped)."""
    if num_tris <= 1100:
        return 1024
    if num_tris <= 8192:
        return 128
    if num_tris <= 32768:
        return 1024
    return 512


def load_scene(cfg: RenderConfig) -> tuple[Scene, SceneMeta]:
    """Load scene + envmap from cfg paths (the `initialize` asset ingest,
    RefractionDemo.cpp:527,537-538)."""
    mesh = parse_obj(cfg.scene_path)
    envmap = load_texture(cfg.envmap_path)
    cs = cfg.cluster_size or auto_cluster_size(mesh.num_tris)
    scene, meta = build_scene(mesh, envmap, cs)
    meta = dataclasses.replace(
        meta, scene_path=cfg.scene_path, envmap_path=cfg.envmap_path
    )
    return scene, meta


@dataclasses.dataclass(frozen=True)
class Instance:
    """One TLAS instance — the D3D12_RAYTRACING_INSTANCE_DESC equivalent
    (RefractionDemo.cpp:325-335: 3x4 row-major object->world ``Transform``,
    ``InstanceMask``). The reference builds exactly one instance with the
    identity transform and mask 1; this framework generalizes to N
    instances by *baking* transforms into world space at scene build —
    the TPU-native answer to a TLAS: geometry is a replicated dense
    array, so an instance edit is one rebuild + host->device transfer,
    just as the reference re-records its TLAS build.

    ``mask`` honors full DXR visibility semantics: an instance is
    visible to a ray iff ``mask & InstanceInclusionMask != 0``
    (RayTracing.hlsl:60,106,121 — the reference passes 0xff on every
    TraceRay). Masks are baked per triangle (scene.tri_mask); PER-RAY
    inclusion masks are served by the wavefront path
    (integrator.render_pixels(ray_mask=...) / xla_intersect), while the
    production fused kernel serves the reference's constant-0xff mask —
    mask-0 instances (invisible under EVERY inclusion mask) are dropped
    at build either way.
    """

    mesh: MeshData
    transform: np.ndarray | None = None  # (3, 4) row-major; None = identity
    mask: int = 1


def _transform_mesh(mesh: MeshData, transform: np.ndarray) -> MeshData:
    """Bake a 3x4 object->world transform: positions affinely, shading
    normals by the inverse-transpose of the linear part (correct under
    non-uniform scale; the shader re-normalizes after barycentric lerp,
    RayTracing.hlsl:83-86, so lengths don't matter)."""
    m = np.asarray(transform, np.float32)
    if m.shape != (3, 4):
        raise ValueError(f"instance transform must be (3, 4), got {m.shape}")
    lin, t = m[:, :3], m[:, 3]
    if abs(float(np.linalg.det(lin))) < 1e-12:
        raise ValueError("instance transform is singular")
    nrm_m = np.linalg.inv(lin).T.astype(np.float32)
    return MeshData(
        positions=(mesh.positions @ lin.T + t).astype(np.float32),
        normals=(mesh.normals @ nrm_m.T).astype(np.float32),
        uvs=mesh.uvs,
    )


def merge_meshes(meshes: list[MeshData]) -> MeshData:
    if not meshes:
        raise ValueError("no meshes to merge")
    return MeshData(
        positions=np.concatenate([m.positions for m in meshes]),
        normals=np.concatenate([m.normals for m in meshes]),
        uvs=np.concatenate([m.uvs for m in meshes]),
    )


def build_instanced_scene(
    instances: list[Instance],
    envmap: np.ndarray,
    cluster_size: int | None = None,
) -> tuple[Scene, SceneMeta]:
    """Build one scene from N instances (the TLAS-with-N-instances
    capability). Baked world-space triangles from all visible instances
    are merged and spatially clustered together (RRT_CURVE order), so
    traversal is exactly the single-mesh path — instancing costs nothing
    per ray."""
    visible = [i for i in instances if i.mask & 0xFF]
    if not visible:
        raise ValueError("all instances are masked out (mask & 0xff == 0)")
    baked = [
        i.mesh if i.transform is None else _transform_mesh(i.mesh, i.transform)
        for i in visible
    ]
    merged = merge_meshes(baked)
    tri_mask = np.concatenate([
        np.full(i.mesh.num_tris, np.int32(i.mask & 0xFF))
        for i in visible
    ]).astype(np.int32)
    cs = cluster_size or auto_cluster_size(merged.num_tris)
    return build_scene(merged, envmap, cs, tri_mask=tri_mask)


def instance_transform(translate=(0.0, 0.0, 0.0), scale=1.0,
                       rotate_y_deg=0.0) -> np.ndarray:
    """Convenience 3x4 composer (scale, then rotate about +Y, then
    translate) for CLI/instance specs."""
    s = np.asarray(scale, np.float32) * np.ones(3, np.float32)
    c, sn = np.cos(np.radians(rotate_y_deg)), np.sin(np.radians(rotate_y_deg))
    rot = np.array([[c, 0.0, sn], [0.0, 1.0, 0.0], [-sn, 0.0, c]],
                   np.float32)
    m = np.zeros((3, 4), np.float32)
    m[:, :3] = rot * s[None, :]
    m[:, 3] = np.asarray(translate, np.float32)
    return m


def load_instanced(spec_path: str, cfg: RenderConfig) -> tuple[Scene, SceneMeta]:
    """Load an instanced scene from a JSON spec (the CLI ``--instances``
    format): a list (or {"instances": [...]}) of entries
    ``{"obj": path, "translate": [x,y,z], "scale": s | [sx,sy,sz],
    "rotate_y_deg": deg, "mask": m}`` — or an explicit
    ``"transform": 3x4`` row-major matrix instead of the convenience
    fields. OBJ paths resolve like ``--scene``: as given, else under the
    asset dir of ``cfg.scene_path``."""
    import json

    with open(spec_path) as f:
        spec = json.load(f)
    if isinstance(spec, dict):
        spec = spec["instances"]
    if not isinstance(spec, list) or not spec:
        raise ValueError(f"{spec_path}: expected a non-empty instance list")
    asset_dir = os.path.dirname(cfg.scene_path)
    meshes: dict[str, MeshData] = {}
    instances = []
    for ent in spec:
        path = ent["obj"]
        if not os.path.exists(path):
            path = os.path.join(asset_dir, ent["obj"])
        if path not in meshes:
            meshes[path] = parse_obj(path)
        if "transform" in ent:
            m = np.asarray(ent["transform"], np.float32)
        else:
            m = instance_transform(
                translate=ent.get("translate", (0.0, 0.0, 0.0)),
                scale=ent.get("scale", 1.0),
                rotate_y_deg=ent.get("rotate_y_deg", 0.0))
        instances.append(
            Instance(meshes[path], m, mask=int(ent.get("mask", 1))))
    envmap = load_texture(cfg.envmap_path)
    scene, meta = build_instanced_scene(instances, envmap, cfg.cluster_size)
    meta = dataclasses.replace(
        meta, scene_path=spec_path, envmap_path=cfg.envmap_path)
    return scene, meta


def scene_to_device(scene: Scene, sharding=None) -> Scene:
    """Move scene leaves to device (replicated unless a sharding is given)."""
    import jax

    if sharding is None:
        return jax.tree.map(jax.device_put, scene)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), scene)
