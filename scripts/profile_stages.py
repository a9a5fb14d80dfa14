"""Stage-level timing of the raster/deferred pipeline on the real chip.

Compares the fused G-buffer kernel against the unfused (id kernel + XLA
gather interp) path, plus component stages, using the on-device scan-loop
methodology from utils/profiling.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, math3d, scenes
from physically_based_renderer_tpu.models.scene import flatten_scene
from physically_based_renderer_tpu.ops import raster, raster_pallas
from physically_based_renderer_tpu.ops.raster import setup_triangles
from physically_based_renderer_tpu.ops.raster_bin import bin_triangles
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def main():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    camera = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    geom = flatten_scene(scene)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)
    packed = jnp.concatenate([geom.pos_w, geom.normal_w], axis=-1)
    nm = scene.materials.num_materials

    def t(name, fn, *args, pixels=None):
        r = time_device_loop(fn, *args, iters=ITERS, pixels=pixels)
        print(f"{name:42s} {r.ms_per_iter:8.2f} ms")
        return r.ms_per_iter

    # 1. binning alone (id-kernel fields)
    def bin_only(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material,
        )
        return b.packed[0]

    t("bin (16 fields)", bin_only, clip)

    # 2. binning with gbuf plane fields
    def bin_gbuf(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        ca = packed[geom.tris]
        ch = jnp.concatenate([ca * st.inv_w[..., None], st.inv_w[..., None]], -1)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material, corner_channels=ch,
        )
        return b.packed[0]

    t("bin (40 fields, planes)", bin_gbuf, clip)

    # 3. old path: id kernel + gather interp
    def old_path(c):
        tri_id, mat = raster_pallas.rasterize_binned(
            c, geom.tris, width=W, height=H,
            face_material=geom.face_material, num_materials=nm,
        )
        attrs, _d, _m = raster.interpolate_packed(
            packed, c, geom.tris, tri_id, width=W, height=H
        )
        return attrs[..., 0]

    t("id kernel + XLA interp", old_path, clip)

    # 3b. id kernel alone
    def idk(c):
        tri_id, mat = raster_pallas.rasterize_binned(
            c, geom.tris, width=W, height=H,
            face_material=geom.face_material, num_materials=nm,
        )
        return tri_id.astype(jnp.float32)

    t("id kernel alone", idk, clip)

    # 4. fused gbuf kernel
    def fused(c):
        attrs, _d, _t, _m = raster_pallas.rasterize_binned_gbuffer(
            c, geom.tris, packed, width=W, height=H,
            face_material=geom.face_material, num_materials=nm,
        )
        return attrs[..., 0]

    t("fused gbuf kernel", fused, clip)

    # 5. end-to-end render fwd
    def fwd(c_pos):
        cam = Camera.create(position=c_pos, aspect=W / H)
        img = render(scene, cam, width=W, height=H)
        return img[..., 0]

    t("render fwd (fused)", fwd, jnp.asarray((0.0, -3.0, -18.0)), pixels=W * H)


if __name__ == "__main__":
    main()
