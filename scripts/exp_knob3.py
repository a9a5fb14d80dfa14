"""Round-4: isolate the knob regression after the big2 binning change."""

from __future__ import annotations

import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, scenes, math3d
from physically_based_renderer_tpu.models.scene import flatten_scene_corners
from physically_based_renderer_tpu.ops import raster_pallas
from physically_based_renderer_tpu.ops.raster import setup_corners
from physically_based_renderer_tpu.ops.raster_bin import bin_triangles
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def t(label, fn, *args):
    try:
        r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
        print(f"{label:58s} {r.ms_per_iter:8.2f} ms", flush=True)
        return r.ms_per_iter
    except Exception as e:
        print(f"{label:58s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    assets = scenes.AssetCache()
    scene = scenes.mori_knob_scene(assets=assets, environment="chelsea_stairs")
    scene = dataclasses.replace(scene, ibl=None, sky_map=None, env_map=None)
    cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)

    def bin_only(mats, c, th, ms, b2s, b2c):
        s = dataclasses.replace(scene, materials=mats)
        g = flatten_scene_corners(s, textured=False)
        clip = math3d.transform_points_h(g.pos_w, c.view_proj())
        st = setup_corners(clip, W, H, True, None)
        cc = jnp.concatenate(
            [g.attrs * st.inv_w[..., None], st.inv_w[..., None]], axis=-1
        )
        b = bin_triangles(
            st, width=W, height=H, tile_h=th, tile_w=128, max_span=ms,
            big2_span=b2s, big2_cap=b2c,
            face_material=g.face_material, corner_channels=cc,
        )
        return b.packed[0]


    def raster_only(mats, c, th, ms, b2s, b2c):
        s = dataclasses.replace(scene, materials=mats)
        g = flatten_scene_corners(s, textured=False)
        clip = math3d.transform_points_h(g.pos_w, c.view_proj())
        out = raster_pallas.rasterize_binned(
            clip, None, width=W, height=H, tile_h=th, tile_w=128, max_span=ms,
            big2_span=b2s, big2_cap=b2c,
            face_material=g.face_material,
            num_materials=s.materials.num_materials,
        )
        return out[0][0].astype(jnp.float32)

    for th, ms, b2s, b2c in [(4, 64, 128, 512), (4, 32, 128, 512), (8, 64, 128, 512), (4, 64, 160, 256)]:
        t(f"knob raster-only th={th} ms={ms} b2=({b2s},{b2c})",
          jax.jit(functools.partial(raster_only, th=th, ms=ms, b2s=b2s, b2c=b2c)),
          scene.materials, cam)

    def fwd(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render(s, c, width=W, height=H)[..., 0]




if __name__ == "__main__":
    main()

