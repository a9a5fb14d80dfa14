"""Dissect render_soft's backward: which pullback dominates?

Re-implements the render_soft body with stop_gradient toggles:
    python scripts/exp_softbwd.py all|no_sd|no_attrs|no_depth|only_sd
"""

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
from physically_based_renderer_tpu.ops import raster, raster_pallas, raster_soft
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
K = 3
SG = jax.lax.stop_gradient


def soft_img(scene, cam, mode):
    geom = flatten_scene_corners(scene, textured=False)
    clip = math3d.transform_points_h(geom.pos_w, cam.view_proj())
    ids, _zs = raster_soft.peel_layers(
        clip, None, width=W, height=H, num_layers=K, edge_margin_px=3.0
    )
    mats = scene.materials
    mat_props = jnp.concatenate(
        [mats.diffuse, mats.metallic[:, None], mats.fresnel_r0,
         mats.roughness[:, None], mats.opacity[:, None]], axis=-1)
    L = scene.lights
    colors, depths, sdists, valids = [], [], [], []
    for k in range(K):
        tid = ids[k]
        a_clip = SG(clip) if mode in ("no_attrs", "only_sd") else clip
        attrs, depth, mask = raster.interpolate_corners(
            geom.attrs if mode not in ("no_attrs", "only_sd") else SG(geom.attrs),
            a_clip, tid, width=W, height=H, clamp=True,
        )
        rgba = raster_pallas.shade_fused(
            attrs[..., :6], geom.face_material[jnp.maximum(tid, 0)], mask,
            mat_props, L.strength, L.direction, L.position, L.spot_power,
            scene.ambient, cam.position,
            num_dir=L.num_dir, num_point=L.num_point, num_spot=L.num_spot,
        )
        sd_clip = SG(clip) if mode == "no_sd" else clip
        sd = raster_soft.signed_distance_px(sd_clip, None, tid, width=W, height=H)
        d = jnp.where(mask, depth, jnp.inf)
        if mode == "no_depth":
            d = SG(d)
        colors.append(rgba[..., :3])
        depths.append(d)
        sdists.append(sd)
        valids.append(mask)
    bg = jnp.broadcast_to(scene.clear_color, (H, W, 3))
    return raster_soft.soft_composite(
        jnp.stack(colors), jnp.stack(depths), jnp.stack(sdists),
        jnp.stack(valids), bg, sigma=1.0, gamma=1e-2,
    )


def main(mode):
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    draw = scene.draws[0]

    def loss(t, c):
        w = draw.worlds.at[:, 3, 0].add(t)
        s = dataclasses.replace(scene, draws=(dataclasses.replace(draw, worlds=w),))
        return jnp.mean(soft_img(s, c, mode)[..., :3] ** 2)

    r = time_device_loop(jax.grad(loss), jnp.float32(0.0), cam, iters=5,
                         pixels=W * H)
    print(f"soft bwd [{mode}]  {r.ms_per_iter:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
