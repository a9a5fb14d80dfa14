"""Round-2 sweep: corner-major binning + fused gbuf precision/tile sizes."""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
ITERS = 10


def main():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    camera = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    geom = flatten_scene_corners(scene, textured=False)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)  # (T,3,4)
    nm = scene.materials.num_materials

    def t(name, fn, *args):
        r = time_device_loop(fn, *args, iters=ITERS)
        print(f"{name:46s} {r.ms_per_iter:8.2f} ms")
        return r.ms_per_iter

    def bin_corner(c):
        st = setup_corners(c, W, H, True, None)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material,
        )
        return b.packed[0]

    t("bin corner-major (16 fields)", bin_corner, clip)

    def idk(c):
        tri_id, mat = raster_pallas.rasterize_binned(
            c, None, width=W, height=H,
            face_material=geom.face_material, num_materials=nm,
        )
        return tri_id.astype(jnp.float32)

    t("id kernel corner-major", idk, clip)

    for prec in ("default",):
        for th in (16,):
            def fused(c, _p=prec, _t=th):
                attrs, _d, _tid, _m = raster_pallas.rasterize_binned_gbuffer(
                    c, None, geom.attrs, width=W, height=H, tile_h=_t,
                    face_material=geom.face_material, num_materials=nm,
                    mm_precision=_p,
                )
                return attrs[..., 0]

            t(f"fused gbuf {prec} tile_h={th}", fused, clip)

    # end-to-end fwd at chosen configs
    for prec in ("highest", "default"):
        def fwd(cpos, _p=prec):
            cam = dataclasses.replace(camera, position=cpos)
            img = render(scene, cam, width=W, height=H,
                         raster_backend="pallas_gbuf", gbuf_precision=_p)
            return img[..., 0]

        t(f"render fwd gbuf {prec}", fwd, jnp.asarray((0.0, -3.0, -18.0)))

    def loss_fn(materials, cam):
        s = dataclasses.replace(scene, materials=materials)
        img = render(s, cam, width=W, height=H,
                     raster_backend="pallas_gbuf", gbuf_precision="default")
        return jnp.mean(img[..., :3] ** 2)

    grad_full = jax.grad(loss_fn, allow_int=True)

    def full_bwd(cpos):
        cam = dataclasses.replace(camera, position=cpos)
        g = grad_full(scene.materials, cam)
        return g.roughness[:1]

    t("render fwd+bwd gbuf default", full_bwd, jnp.asarray((0.0, -3.0, -18.0)))


if __name__ == "__main__":
    main()
