"""Round-3 stage budget: the CURRENT default render() path (corner-major +
fused G-buffer kernel) at 1080p on the analytic sphere grid.

Run on the TPU host: python scripts/profile_r3.py
"""

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
from physically_based_renderer_tpu.ops import raster_pallas, sky as sky_ops, tonemap as tonemap_ops
from physically_based_renderer_tpu.ops.raster import setup_corners
from physically_based_renderer_tpu.ops.raster_bin import bin_triangles
from physically_based_renderer_tpu.renderer import render, shade_pixels
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def main():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    camera = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    vp = camera.view_proj()
    geom = flatten_scene_corners(scene, textured=False)
    clip = math3d.transform_points_h(geom.pos_w, vp)
    packed = geom.attrs  # (T,3,6)
    nm = scene.materials.num_materials

    def t(name, fn, *args):
        r = time_device_loop(fn, *args, iters=ITERS)
        print(f"{name:46s} {r.ms_per_iter:8.2f} ms")
        return r.ms_per_iter

    # 0. geometry: flatten + clip transform
    def geo(mats):
        s = dataclasses.replace(scene, materials=mats)
        g = flatten_scene_corners(s, textured=False)
        c = math3d.transform_points_h(g.pos_w, vp)
        return c[..., 0]

    t("flatten corners + clip xform", geo, scene.materials)

    # 1. setup_corners alone
    def setup(c):
        st = setup_corners(c, W, H, True, None)
        return st.xy[..., 0]

    t("setup_corners", setup, clip)

    # 2. bin with gbuf channels (7ch untextured)
    def bin_gbuf(c):
        st = setup_corners(c, W, H, True, None)
        ch = jnp.concatenate([packed * st.inv_w[..., None], st.inv_w[..., None]], -1)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material, corner_channels=ch,
        )
        return b.packed[0]

    t("setup + bin (gbuf fields)", bin_gbuf, clip)

    # 3. full fused gbuf kernel (incl. setup+bin)
    def fused(c):
        attrs, _d, _t, _m = raster_pallas.rasterize_binned_gbuffer(
            c, None, packed, width=W, height=H,
            face_material=geom.face_material, num_materials=nm,
        )
        return attrs[..., 0]

    t("setup+bin+fused gbuf kernel", fused, clip)

    # 4. shading stage alone, on a fixed gbuf
    attrs, depth, tri_id, mat_id = raster_pallas.rasterize_binned_gbuffer(
        clip, None, packed, width=W, height=H,
        face_material=geom.face_material, num_materials=nm,
    )

    def shade(a):
        hdr, op, _keep = shade_pixels(
            pos_w=a[..., 0:3], normal_w=a[..., 3:6],
            tangent_w=a[..., 3:6], bitangent_w=a[..., 3:6],
            uv=a[..., 0:2] * 0.0, material_id=mat_id,
            materials=scene.materials, atlas=None, lights=scene.lights,
            ambient=scene.ambient, eye=camera.position,
        )
        return hdr[..., 0]

    t("shade_pixels (XLA)", shade, attrs)

    # 5. tonemap+compose tail alone
    def tail(a):
        hdr = a[..., 0:3]
        fg = tonemap_ops.tonemap(hdr)
        bg = jnp.broadcast_to(scene.clear_color, (H, W, 3))
        m = (tri_id >= 0)[..., None].astype(jnp.float32)
        rgb = m * fg + (1 - m) * bg
        return rgb[..., 0]

    t("tonemap+compose (XLA)", tail, attrs)

    # 6. full render fwd
    def full(mats, cam):
        s = dataclasses.replace(scene, materials=mats)
        img = render(s, cam, width=W, height=H)
        return img[..., 0]

    ms_fwd = t("FULL render fwd", full, scene.materials, camera)

    # 7. full fwd+bwd
    def loss(mats, cam):
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(render(s, cam, width=W, height=H)[..., :3] ** 2)

    gf = jax.grad(loss, allow_int=True)

    def fwdbwd(mats, cam):
        g = gf(mats, cam)
        return g.roughness[:1]

    ms_fb = t("FULL render fwd+bwd", fwdbwd, scene.materials, camera)
    print(f"\nfwd Mpix/s: {W*H/ms_fwd/1e3:.1f}   fwd+bwd Mpix/s: {W*H/ms_fb/1e3:.1f}")


if __name__ == "__main__":
    main()
