"""Round-5 experiment: row-layout fused shade kernel vs v1 (eval floor).

Measures the KERNEL path only (rasterize_binned_shade[_row] called with the
same args renderer.render builds), 1080p fwd, device-side scan timing.
Run ONE part per process (axon contention, PERF.md):

    python scripts/exp_row.py grid_v1|grid_row|knob_v1|knob_row|knob_row_nojumbo|...
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, math3d, scenes
from physically_based_renderer_tpu.models.scene import flatten_scene_corners
from physically_based_renderer_tpu.ops import raster_pallas, raster_row
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def t(label, fn, *args):
    r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
    print(
        f"{label:44s} {r.ms_per_iter:8.2f} ms  {r.pixels_per_s / 1e6:7.1f} Mpix/s",
        flush=True,
    )
    return r.ms_per_iter


def kernel_args(scene, cam):
    geom = flatten_scene_corners(scene, textured=False)
    clip_of = lambda c: math3d.transform_points_h(geom.pos_w, c.view_proj())
    mats = scene.materials
    mat_props = jnp.concatenate(
        [
            mats.diffuse,
            mats.metallic[:, None],
            mats.fresnel_r0,
            mats.roughness[:, None],
            mats.opacity[:, None],
        ],
        axis=-1,
    )
    L = scene.lights
    kw = dict(
        width=W,
        height=H,
        num_materials=mats.num_materials,
        num_dir=L.num_dir,
        num_point=L.num_point,
        num_spot=L.num_spot,
    )
    return geom, clip_of, mat_props, L, kw


def grid_setup():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    return scene, cam, dict(max_span=16)


def knob_setup():
    assets = scenes.AssetCache()
    scene = scenes.mori_knob_scene(
        assets=assets, environment="chelsea_stairs"
    ).with_ibl()
    cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)
    return scene, cam, dict(max_span=64)


def run(which):
    if which.startswith("grid"):
        scene, cam, bkw = grid_setup()
        sh9 = None
    else:
        scene, cam, bkw = knob_setup()
        sh9 = scene.ibl.irradiance_sh9
    geom, clip_of, mat_props, L, kw = kernel_args(scene, cam)
    if "nojumbo" in which:
        bkw = dict(bkw, big2_span=4096, big2_cap=256)
    if "s16" in which:
        kw = dict(kw, sparse_s=16)
    if "smax128" in which:
        kw = dict(kw, sparse_max=127)
    if "smax0" in which:
        kw = dict(kw, sparse_max=0)
    th = 4
    if "th2" in which:
        th = 2
    if "th16" in which:
        th = 16
    if "th8" in which:
        th = 8
    bkw = dict(bkw, tile_h=th)

    impl = (
        raster_row.rasterize_binned_shade_row
        if "row" in which
        else raster_pallas.rasterize_binned_shade
    )

    def fwd(cam_pos, clip):
        out = impl(
            clip,
            geom.attrs,
            geom.face_material,
            mat_props,
            L.strength,
            L.direction,
            L.position,
            L.spot_power,
            scene.ambient,
            cam_pos,
            sh9,
            tile_h=bkw.get("tile_h", 4),
            max_span=bkw.get("max_span", 16),
            big2_span=bkw.get("big2_span", 0),
            big2_cap=bkw.get("big2_cap", None),
            apply_tonemap=sh9 is None,
            **kw,
        )
        return out[0]

    clip = clip_of(cam)
    t(which, fwd, cam.position, clip)


if __name__ == "__main__":
    run(sys.argv[1])
