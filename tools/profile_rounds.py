#!/usr/bin/env python
"""Per-round timing breakdown of the monkey 1080p 4-bounce frame (dev tool)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from refraction_tpu.camera import CameraFrame, generate_rays, orbit_camera
from refraction_tpu.config import RenderConfig
from refraction_tpu.render import TILE_H, TILE_W, tile_order
from refraction_tpu.scene import load_scene, scene_to_device
from refraction_tpu.kernels.megakernel import GROUP, _SUB, mega_round

cfg = RenderConfig(width=1920, height=1080,
                   scene_path="/root/reference/monkey.obj",
                   max_refract_depth=4, backend="pallas", cluster_size=64)
scene, meta = load_scene(cfg)
scene = scene_to_device(scene)

h_pad = ((cfg.height + TILE_H - 1) // TILE_H) * TILE_H
w_pad = ((cfg.width + TILE_W - 1) // TILE_W) * TILE_W
frame = orbit_camera(0.01, cfg)
o, d = generate_rays(CameraFrame(origin=jnp.asarray(frame.origin, jnp.float32),
                                 proj_inv=jnp.asarray(frame.proj_inv, jnp.float32)),
                     cfg.width, cfg.height, xp=jnp)

def pad_tile(x):
    x = x.reshape(cfg.height, cfg.width, 3)
    x = jnp.pad(x, ((0, h_pad - cfg.height), (0, w_pad - cfg.width), (0, 0)), mode="edge")
    return tile_order(x.reshape(-1, 3), h_pad, w_pad)

o = pad_tile(o); d = pad_tile(d)
n = o.shape[0]; rows = n // 128
f32 = jnp.float32

def comp(x, i): return x[:, i].astype(f32).reshape(rows, 128)
state = {"ox": comp(o,0), "oy": comp(o,1), "oz": comp(o,2),
         "dx": comp(d,0), "dy": comp(d,1), "dz": comp(d,2),
         "cull": jnp.ones((rows,128),f32), "wgt": jnp.ones((rows,128),f32)}

env_h, env_w = scene.envmap.shape[0], scene.envmap.shape[1]
env_flat = scene.env_packed.reshape(-1, 128)
chunk_rows = _SUB * GROUP

def padded(x, target):
    p = target - x.shape[0]
    return jnp.concatenate([x, jnp.zeros((p,128), x.dtype)]) if p else x

def run_round(state, count, time_it=True):
    cur_rows = state["ox"].shape[0]
    tmin = cfg.primary_tmin if count == 0 else cfg.secondary_tmin
    tmax = cfg.primary_tmax if count == 0 else cfg.secondary_tmax
    limits = jnp.asarray([tmin, tmax, cfg.ior, cfg.fresnel_r0], f32)
    want_children = count < cfg.max_refract_depth
    want_reflect = want_children and count < cfg.max_reflect_depth
    pad_rows = ((cur_rows + chunk_rows - 1)//chunk_rows)*chunk_rows
    args = [padded(state[k], pad_rows) for k in ("ox","oy","oz","dx","dy","dz","cull","wgt")]
    kw = dict(env_h=env_h, env_w=env_w, want_reflect=want_reflect,
              want_children=want_children, interpret=False)
    res = mega_round(scene.tri_packed, scene.tri_norm_packed, scene.cluster_bounds,
                     scene.sub_bounds, env_flat, limits, *args, **kw)
    float(jnp.sum(res[0]))
    if time_it:
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = mega_round(scene.tri_packed, scene.tri_norm_packed, scene.cluster_bounds,
                           scene.sub_bounds, env_flat, limits, *args, **kw)
            float(jnp.sum(r[0]))
            ts.append(time.time()-t0)
        alive = int(jnp.sum((args[6][:cur_rows] != 0)))
        print(f"round {count}: rows={cur_rows} slots={cur_rows*128} alive={alive} "
              f"t={min(ts)*1e3:.2f} ms", flush=True)
    res = [r[:cur_rows] for r in res]
    if not want_children:
        return None
    hx, hy, hz = res[3], res[4], res[5]
    fxd, fyd, fzd, f_cull, f_wgt = res[6], res[7], res[8], res[9], res[10]
    new = {"ox":hx,"oy":hy,"oz":hz,"dx":fxd,"dy":fyd,"dz":fzd,"cull":f_cull,"wgt":f_wgt}
    if want_reflect:
        lxd, lyd, lzd, l_cull, l_wgt = res[11], res[12], res[13], res[14], res[15]
        new = {k: jnp.concatenate([new[k], v]) for k, v in
               zip(("ox","oy","oz","dx","dy","dz","cull","wgt"),
                   (hx,hy,hz,lxd,lyd,lzd,l_cull,l_wgt))}
    return new

for count in range(cfg.max_refract_depth + 1):
    state = run_round(state, count)
    if state is None:
        break
