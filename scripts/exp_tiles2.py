"""Round-4: isolate the fused kernel's per-tile floor on the knob.

Variants: raster-only vs fused-shade, tile_w sweep (fewer, wider tiles),
max_span=128 (kill the 109-jumbo global rescan)."""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, scenes, math3d
from physically_based_renderer_tpu.models.scene import flatten_scene_corners
from physically_based_renderer_tpu.ops import raster_pallas
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def t(label, fn, *args):
    try:
        r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
        print(f"{label:56s} {r.ms_per_iter:8.2f} ms", flush=True)
        return r.ms_per_iter
    except Exception as e:
        print(f"{label:56s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    which = sys.argv[1]
    if which == "knob":
        assets = scenes.AssetCache()
        scene = scenes.mori_knob_scene(assets=assets, environment="chelsea_stairs")
        scene = dataclasses.replace(scene, ibl=None, sky_map=None, env_map=None)
        cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)
    else:
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    geom = flatten_scene_corners(scene, textured=False)

    def raster_only(mats, c, th, tw, ms):
        s = dataclasses.replace(scene, materials=mats)
        g = flatten_scene_corners(s, textured=False)
        clip = math3d.transform_points_h(g.pos_w, c.view_proj())
        out = raster_pallas.rasterize_binned(
            clip, None, width=W, height=H, tile_h=th, tile_w=tw, max_span=ms,
            face_material=g.face_material,
            num_materials=s.materials.num_materials,
        )
        return out[0][0].astype(jnp.float32)

    import functools

    for th, tw, ms in [(4, 128, 64), (8, 128, 64), (4, 256, 64), (4, 512, 64),
                       (4, 128, 128), (2, 512, 64)]:
        t(f"{which} raster-only th={th} tw={tw} ms={ms}",
          jax.jit(functools.partial(raster_only, th=th, tw=tw, ms=ms)),
          scene.materials, cam)

    def fwd(mats, c, **kw):
        s = dataclasses.replace(scene, materials=mats)
        return render(s, c, width=W, height=H, **kw)[..., 0]

    for th, tw in [(4, 128), (4, 256), (4, 512), (2, 512)]:
        t(f"{which} fused-shade th={th} tw={tw}",
          jax.jit(functools.partial(fwd, tile_h=th, tile_w=tw)),
          scene.materials, cam)


if __name__ == "__main__":
    main()
