"""Stage profile of the north-star scene's base cost (mori_knob, no sky/IBL
— those are profiled separately in profile_ibl.py): binning/setup vs the
fused gbuf kernel vs the XLA shade/compose tail. Run exclusively on TPU."""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, math3d, scenes
from physically_based_renderer_tpu.models.scene import flatten_scene_corners
from physically_based_renderer_tpu.ops import raster_pallas
from physically_based_renderer_tpu.ops.raster import setup_corners
from physically_based_renderer_tpu.ops.raster_bin import bin_triangles
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080


def t(label, fn, *args):
    r = time_device_loop(fn, *args, iters=5, pixels=W * H)
    print(f"{label:42s} {r.ms_per_iter:7.1f} ms {r.pixels_per_s/1e6:7.1f} Mpix/s")
    return r.ms_per_iter


def main():
    assets = scenes.AssetCache()
    knob = scenes.mori_knob_scene(assets=assets, environment="chelsea_stairs")
    knob = dataclasses.replace(knob, sky_map=None, env_map=None)
    cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)

    # 1. geometry flatten + clip transform
    def flat(sc, c):
        geom = flatten_scene_corners(sc, textured=False)
        clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
        return clip[..., 0]

    t("flatten + clip", flat, knob, cam)

    # 2. + setup + binning (with gbuf corner channels)
    def binned_fn(sc, c):
        geom = flatten_scene_corners(sc, textured=False)
        clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
        st = setup_corners(clip, W, H, True, None)
        ch = jnp.concatenate(
            [geom.attrs * st.inv_w[..., None], st.inv_w[..., None]], axis=-1
        )
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128,
            face_material=geom.face_material, corner_channels=ch,
        )
        return b.packed[0]

    t("+ setup + bin (gbuf channels)", binned_fn, knob, cam)

    # 3. full gbuf kernel path (raster+interp)
    def gbuf(sc, c):
        geom = flatten_scene_corners(sc, textured=False)
        clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
        attrs, depth, tid, mid = raster_pallas.rasterize_binned_gbuffer(
            clip, None, geom.attrs, width=W, height=H,
            face_material=geom.face_material,
            num_materials=sc.materials.num_materials,
        )
        return attrs[..., 0]

    t("+ gbuf kernel (raster+interp)", gbuf, knob, cam)

    # 4. full render fwd (adds shade + compose)
    def full(sc, c):
        return render(sc, c, width=W, height=H)[..., 0]

    t("full fwd (no sky/ibl)", full, knob, cam)


if __name__ == "__main__":
    main()
