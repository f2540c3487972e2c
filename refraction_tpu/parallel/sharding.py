"""Multi-device rendering: shard_map over a JAX device mesh.

The reference is strictly single-GPU (SURVEY.md 2.4 — one adapter,
RefractionDemo.cpp:155); scaling is a from-scratch TPU design:

- **Pixel data parallelism** (`render_sharded`): the image is sharded over
  the mesh's ``pixels`` axis; geometry + envmap are replicated (scenes are
  <= a few MB). Each device runs the full wavefront on its tile; the only
  cross-device communication is the output assembly — collectives ride ICI
  via the output sharding, no NCCL-style transport to port.
- **Triangle sharding** (`make_trisharded_intersect`): for scenes too big
  to replicate, each device intersects every ray against its triangle
  shard and the per-device (t, idx) candidates are combined with an
  all_gather + min/tie-break reduction — the renderer's analogue of
  tensor parallelism, and the pattern the multichip dry-run exercises.
- **Sample parallelism** (`make_sample_sharded_renderer`): supersampling
  samples sharded over a second mesh axis on a 2-D ``(samples, pixels)``
  mesh; each device traces its jitter subset of its pixel shard and the
  partial radiance sums ``psum``-reduce over the samples axis. The
  renderer's analogue of ML data parallelism over the batch (SURVEY.md
  §2.4: "data parallelism over pixels/samples").

Both run unchanged on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and a real TPU pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from refraction_tpu.camera import CameraFrame, generate_rays
from refraction_tpu.config import RenderConfig
from refraction_tpu.integrator import render_pixels
from refraction_tpu.ops.backends import get_backend
from refraction_tpu.ops.intersect import intersect_closest
from refraction_tpu.scene import Scene


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("pixels",))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _unit_interleave(n_pad: int, unit: int, ndev: int):
    """(scatter, gather) closures for round-robin load balancing.

    Static unit permutation: unit u lands at slot
    ``(u % ndev) * units_per_dev + u // ndev``, so device d's contiguous
    shard holds units d, d+ndev, d+2*ndev, ... — a uniform vertical
    slice of the frame instead of one contiguous band (center rows carry
    the object's bounce tree; sky rows miss straight to the envmap).
    ``scatter`` maps ray order -> device-interleaved order, ``gather``
    inverts it; both permute ``axis`` (default 0). ndev <= 1 returns
    identities."""
    if ndev <= 1:
        ident = lambda x, axis=0: x  # noqa: E731
        return ident, ident
    upd = n_pad // unit // ndev

    # Pure reshape/transpose (no gather — same rationale as
    # render.tile_order): a (upd, ndev) block transpose of unit rows,
    # which the SPMD partitioner lowers to a clean all-to-all instead of
    # an opaque 2M-element index gather.
    def _block_swap(x, a, b, axis):
        lead, trail = x.shape[:axis], x.shape[axis + 1:]
        x = x.reshape(*lead, a, b, unit, *trail)
        x = jnp.swapaxes(x, axis, axis + 1)
        return x.reshape(*lead, n_pad, *trail)

    def scatter(x, axis=0):   # ray order -> device-interleaved order
        return _block_swap(x, upd, ndev, axis)

    def gather(x, axis=0):    # device-interleaved order -> ray order
        return _block_swap(x, ndev, upd, axis)

    return scatter, gather


def make_sharded_renderer(
    cfg: RenderConfig,
    mesh: Mesh,
    intersect_fn: Callable | None = None,
    interleave: bool = True,
):
    """Build a jitted multi-device (scene, frame) -> (H, W, 3) renderer.

    Image rows x cols are flattened and sharded over the ``pixels`` mesh
    axis (padded up to a multiple of the device count); the scene is
    replicated. Per-sample jitter offsets follow render.make_renderer.

    ``interleave`` (default) assigns the shard's work units (1024-ray
    blocks, the megakernel tile size) to devices round-robin instead of
    as one contiguous band each: the frame's cost is concentrated in the
    center rows (the object's bounce tree; sky rows miss straight to the
    envmap), so contiguous bands leave the sky-band chips idle behind
    the center-band chips every frame. Round-robin gives every chip a
    uniform vertical slice of the frame. Unit granularity keeps each
    1024-ray block contiguous, so intra-block ray coherence (what the
    traversal's window gating exploits) is untouched, and per-pixel work
    is device-independent — the image matches the contiguous assignment
    to XLA-fusion ulp (asserted in test_sharding.py)."""
    env_fn = None
    mega = False
    if intersect_fn is None:
        backend = get_backend(cfg.backend, cfg.cluster_size)
        intersect_fn = backend.intersect
        env_fn = backend.env_contribution
        mega = backend.name == "pallas"
    from refraction_tpu.render import sample_offsets

    offsets = sample_offsets(cfg.spp)
    n = cfg.height * cfg.width
    ndev = mesh.devices.size
    # The megakernel path needs whole 1024-ray tiles per shard.
    unit = 1024 if mega else 8
    n_pad = _round_up(n, ndev * unit)

    scatter_units, gather_units = _unit_interleave(
        n_pad, unit, ndev if interleave else 1)

    ray_spec = P("pixels")
    rep = P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, ray_spec, ray_spec),
        out_specs=ray_spec,
        # pallas_call outputs carry no varying-mesh-axis metadata; the
        # shard body is per-shard pure, so the static check is safely off.
        check_vma=False,
    )
    def _trace_shard(scene, o, d):
        if mega:
            from refraction_tpu.integrator import render_pixels_mega

            return render_pixels_mega(scene, o, d, cfg)
        return render_pixels(scene, o, d, cfg, intersect_fn, env_fn)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def _render(scene: Scene, proj_inv, origin):
        frame = CameraFrame(origin=origin, proj_inv=proj_inv)
        acc = jnp.zeros((n_pad, 3), jnp.float32)
        for s in range(cfg.spp):
            jitter = jnp.broadcast_to(jnp.asarray(offsets[s]), (n, 2))
            o, d = generate_rays(
                frame, cfg.width, cfg.height,
                jitter=None if cfg.spp == 1 else jitter, xp=jnp,
            )
            pad = n_pad - n
            if pad:
                o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                d = jnp.concatenate(
                    [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], d.dtype), (pad, 3))]
                )
            o = scatter_units(o)
            d = scatter_units(d)
            o = jax.lax.with_sharding_constraint(o, NamedSharding(mesh, ray_spec))
            d = jax.lax.with_sharding_constraint(d, NamedSharding(mesh, ray_spec))
            acc = acc + _trace_shard(scene, o, d)
        acc = gather_units(acc)  # undo the unit interleave (ray order)
        return (acc[:n] / cfg.spp).reshape(cfg.height, cfg.width, 3)

    def render(scene: Scene, frame: CameraFrame):
        return _render(
            scene,
            jnp.asarray(frame.proj_inv, jnp.float32),
            jnp.asarray(frame.origin, jnp.float32),
        )

    return render


def make_fused_sharded_renderer(
    cfg: RenderConfig,
    mesh: Mesh,
    interpret: bool = False,
):
    """Pixel-DP of the PRODUCTION whole-frame fused kernel
    (kernels/framekernel.py) over the ``pixels`` mesh axis.

    Unlike make_sharded_renderer (which shards pre-generated rays through
    the per-round megakernel), nothing per-ray crosses shards here: each
    device receives only the replicated scene + the per-frame scalar
    vector, generates its own tiles' rays inside the kernel, and renders
    global tiles ``d, d+S, d+2S, ...`` (round-robin, so every chip gets a
    uniform slice of the object's bounce tree — same load-balancing
    rationale as _unit_interleave). The only collective is the output
    assembly into the replicated image. The global 32x32-tile count is
    padded to a multiple of the device count; pad tiles are gated off
    inside the kernel and contribute zero rows.

    ``interpret=True`` runs the Pallas kernel in interpret mode — the CPU
    virtual-mesh test/dry-run configuration; on a real TPU slice the same
    code compiles per-shard Mosaic kernels."""
    from refraction_tpu.kernels.framekernel import (
        TILE_H, TILE_W, build_scalars, fits_smem, frame_call,
        front_to_back_scene)
    from refraction_tpu.render import sample_offsets, untile_order

    _SUB, _LANE = 8, 128
    ndev = mesh.devices.size
    h_pad = _round_up(cfg.height, TILE_H)
    w_pad = _round_up(cfg.width, TILE_W)
    n_tiles = (h_pad // TILE_H) * (w_pad // TILE_W)
    n_tiles_pad = _round_up(n_tiles, ndev)
    n_local = n_tiles_pad // ndev
    offsets = sample_offsets(cfg.spp)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("pixels"),) * 3,
        check_vma=False,  # same rationale as make_sharded_renderer
    )
    def _shard(scene, scalars):
        base = jax.lax.axis_index("pixels").astype(jnp.float32).reshape(1)
        scal = jnp.concatenate([scalars, base])
        if fits_smem(scene):
            geom = (scene.tri_packed, scene.tri_norm_vmem,
                    scene.cluster_bounds, scene.sub_bounds)
            rec = None
        else:
            geom = (None, scene.tri_norm_vmem, scene.cluster_bounds, None)
            rec = scene.cluster_records
        cs = scene.tri_packed.shape[0] // scene.cluster_bounds.shape[0]
        coded = scene.env_codes.shape[0] > 1
        return frame_call(
            *geom, scene.env_packed.reshape(-1, _LANE), scal,
            width=cfg.width, height=cfg.height, spp=cfg.spp,
            max_refract=cfg.max_refract_depth,
            max_reflect=cfg.max_reflect_depth,
            env_h=scene.envmap.shape[0], env_w=scene.envmap.shape[1],
            cluster_records=rec, cluster_size=cs,
            env_codes=scene.env_codes if coded else None,
            env_lut=scene.env_lut if coded else None,
            interpret=interpret, tile_stride=ndev, n_tiles_local=n_local,
            n_tiles_real=n_tiles if n_tiles_pad != n_tiles else 0,
        )

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def _render(scene: Scene, scalars: jnp.ndarray):
        scene = front_to_back_scene(scene, scalars[9:12])
        r, g, b = _shard(scene, scalars)

        def to_tile_order(x):
            # Device-major rows -> global tile order: shard d's local
            # tile j is global tile j*ndev + d.
            x = x.reshape(ndev, n_local, _SUB, _LANE)
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape(n_tiles_pad * _SUB, _LANE)[:n_tiles * _SUB]

        rad = jnp.stack([to_tile_order(p).reshape(-1) for p in (r, g, b)],
                        axis=-1)
        img = untile_order(rad, h_pad, w_pad).reshape(h_pad, w_pad, 3)
        return img[:cfg.height, :cfg.width]

    _fallback = None

    def render(scene: Scene, frame) -> jnp.ndarray:
        # Same envmap-VMEM-budget gate as render.make_renderer's
        # _mega_ok: the fused kernel keeps the map in VMEM, so oversized
        # maps route to the wavefront sharded renderer instead of
        # crashing in Mosaic's VMEM allocator.
        nonlocal _fallback
        env_bytes = int(np.prod(scene.env_packed.shape)) * 4
        if env_bytes > 8 * 2 ** 20:
            if _fallback is None:
                import logging

                logging.getLogger("refraction_tpu").warning(
                    "envmap %.1f MB exceeds the fused kernel's VMEM "
                    "budget; --devices falls back to the wavefront "
                    "sharded renderer", env_bytes / 2 ** 20)
                _fallback = make_sharded_renderer(cfg, mesh)
            return _fallback(scene, frame)
        return _render(scene, build_scalars(frame, cfg, offsets))

    return render


def make_mesh2d(n_devices: int | None = None, sample_devs: int = 2) -> Mesh:
    """2-D ``(samples, pixels)`` mesh: ``sample_devs`` must divide the
    device count; the pixel axis gets the rest."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(devs) % sample_devs:
        raise ValueError(
            f"{len(devs)} devices do not split into samples={sample_devs}")
    grid = np.asarray(devs).reshape(sample_devs, -1)
    return Mesh(grid, ("samples", "pixels"))


def make_sample_sharded_renderer(
    cfg: RenderConfig,
    mesh: Mesh,
    intersect_fn: Callable | None = None,
    interleave: bool = True,
):
    """Build a jitted (scene, frame) -> (H, W, 3) renderer over a 2-D
    ``(samples, pixels)`` mesh (``make_mesh2d``).

    The spp jittered sample set is sharded over the ``samples`` axis and
    the flattened image over ``pixels``; each device traces
    ``spp / samples_devs`` full wavefronts on its pixel shard and the
    per-device partial sums reduce with ONE ``psum`` over ``samples``
    (ICI collective), after which the mean over spp is taken. Equals the
    single-device sequential spp accumulation up to float-add
    reassociation (the psum tree reorders the sum).
    """
    env_fn = None
    mega = False
    if intersect_fn is None:
        backend = get_backend(cfg.backend, cfg.cluster_size)
        intersect_fn = backend.intersect
        env_fn = backend.env_contribution
        mega = backend.name == "pallas"
    from refraction_tpu.render import sample_offsets

    sdev = mesh.shape["samples"]
    pdev = mesh.shape["pixels"]
    if cfg.spp % sdev:
        raise ValueError(
            f"spp={cfg.spp} must be a multiple of the samples axis ({sdev})")
    offsets = sample_offsets(cfg.spp)
    n = cfg.height * cfg.width
    unit = 1024 if mega else 8
    n_pad = _round_up(n, pdev * unit)
    scatter_units, gather_units = _unit_interleave(
        n_pad, unit, pdev if interleave else 1)
    ray_spec = P("samples", "pixels", None)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec),
        out_specs=P("pixels", None),
        check_vma=False,  # same rationale as make_sharded_renderer
    )
    def _trace(scene, o, d):
        acc = jnp.zeros((o.shape[1], 3), jnp.float32)
        for k in range(o.shape[0]):  # spp_local, static
            if mega:
                from refraction_tpu.integrator import render_pixels_mega

                acc = acc + render_pixels_mega(scene, o[k], d[k], cfg)
            else:
                acc = acc + render_pixels(
                    scene, o[k], d[k], cfg, intersect_fn, env_fn)
        return jax.lax.psum(acc, "samples")

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def _render(scene: Scene, proj_inv, origin):
        frame = CameraFrame(origin=origin, proj_inv=proj_inv)
        pad = n_pad - n
        o_all, d_all = [], []
        for s in range(cfg.spp):
            jitter = jnp.broadcast_to(jnp.asarray(offsets[s]), (n, 2))
            o, d = generate_rays(
                frame, cfg.width, cfg.height,
                jitter=None if cfg.spp == 1 else jitter, xp=jnp,
            )
            if pad:
                o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                d = jnp.concatenate([d, jnp.broadcast_to(
                    jnp.asarray([0.0, 1.0, 0.0], d.dtype), (pad, 3))])
            o_all.append(o)
            d_all.append(d)
        sh = NamedSharding(mesh, ray_spec)
        o_all = jax.lax.with_sharding_constraint(
            scatter_units(jnp.stack(o_all), axis=1), sh)
        d_all = jax.lax.with_sharding_constraint(
            scatter_units(jnp.stack(d_all), axis=1), sh)
        img = gather_units(_trace(scene, o_all, d_all))
        return (img[:n] / cfg.spp).reshape(cfg.height, cfg.width, 3)

    def render(scene: Scene, frame: CameraFrame):
        return _render(
            scene,
            jnp.asarray(frame.proj_inv, jnp.float32),
            jnp.asarray(frame.origin, jnp.float32),
        )

    return render


def make_trisharded_intersect(mesh: Mesh, axis: str = "pixels"):
    """IntersectFn where *triangles* are sharded over ``axis``.

    For scenes too large to replicate: every device sees all rays,
    intersects its contiguous triangle shard, and per-device (t, idx)
    candidates reduce across the mesh — min over t, ties to the lowest
    global triangle index (argmin over the device axis picks the lowest
    shard, and shards are contiguous ascending, so tie-breaking matches
    the single-device argmin-first contract exactly).

    Shading-side arrays (tri_norm) stay replicated in this version; only
    the intersection inputs shard. Triangle counts must divide evenly by
    the device count (scene padding handles this — pick cluster_size as a
    multiple of the device count).
    """

    def intersect(scene: Scene, origins, dirs, want_front, alive, tmin, tmax):
        del alive

        def local(tri_a, tri_e1, tri_e2, o, d, wf):  # noqa: ANN001
            t_local = tri_a.shape[0]
            shard_id = jax.lax.axis_index(axis)
            hit, t, idx = intersect_closest(
                o, d, tri_a, tri_e1, tri_e2, tmin, tmax, wf, jnp,
            )
            gidx = idx + shard_id.astype(jnp.int32) * t_local
            ts = jax.lax.all_gather(
                jnp.where(hit, t, jnp.float32(3e38)), axis
            )  # (ndev, N)
            gs = jax.lax.all_gather(gidx, axis)
            best_dev = jnp.argmin(ts, axis=0)
            ar = jnp.arange(ts.shape[1])
            t_best = ts[best_dev, ar]
            i_best = gs[best_dev, ar]
            return t_best < jnp.float32(1e37), t_best, i_best

        hit, t_best, i_best = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=(P(), P(), P()),
            # Outputs are deterministically identical on every device (same
            # all_gather + argmin everywhere); the static checker can't see
            # that, so varying-mesh-axis checking is disabled.
            check_vma=False,
        )(scene.tri_a, scene.tri_e1, scene.tri_e2, origins, dirs, want_front)
        return hit, t_best, i_best, None

    return intersect
