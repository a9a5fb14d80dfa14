"""Round-5 textured-path stage budget (pbr scene, quad-f32, 1080p).

    python scripts/profile_tex.py [gbuf|sample|full|fullbwd|mips]
Run one part per process (axon contention).
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
from physically_based_renderer_tpu.ops import raster_pallas
from physically_based_renderer_tpu.ops.texture_combined import sample_combined_quad
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080


def t(label, fn, *args, iters=10):
    r = time_device_loop(fn, *args, iters=iters, pixels=W * H)
    print(f"{label:44s} {r.ms_per_iter:8.2f} ms  {r.pixels_per_s/1e6:7.1f} Mpix/s",
          flush=True)


def main(which):
    assets = scenes.AssetCache()
    scene = scenes.pbr_scene(assets=assets).with_combined_textures(mode="quad")
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    if which == "gbuf":
        geom = flatten_scene_corners(scene, textured=True)
        clip = math3d.transform_points_h(geom.pos_w, cam.view_proj())

        def f(c):
            a, d, tid, mid = raster_pallas.rasterize_binned_gbuffer(
                c, None, geom.attrs, width=W, height=H,
                face_material=geom.face_material,
                num_materials=scene.materials.num_materials,
            )
            return a[..., 0]

        t("gbuf kernel (raster+interp, 15ch)", f, clip)
    # NOTE: the scene is always a jit ARGUMENT below — a closed-over scene
    # embeds the ~500 MB quad pages as HLO constants (tunnel 413, PERF.md).
    elif which == "sample":
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) / H,
            jnp.arange(W, dtype=jnp.float32) / W, indexing="ij",
        )
        uv = jnp.stack([xx * 3.0, yy * 3.0], axis=-1)
        mid = (xx * 59).astype(jnp.int32)

        def f(q, u):
            return sample_combined_quad(q, mid, u)[..., 0]

        t("sample_combined_quad (1 gather)", f, scene.combined_atlas, uv)
    elif which in ("full", "full_row"):
        bk = "pallas_gbuf_row" if which == "full_row" else "auto"

        def f(sc, c):
            return render(sc, c, width=W, height=H, raster_backend=bk)[..., 0]

        t(f"render fwd [{bk}]", f, scene, cam)
    elif which in ("fullbwd", "fullbwd_row"):
        bk = "pallas_gbuf_row" if which == "fullbwd_row" else "auto"

        def loss(mats, sc, c):
            s = dataclasses.replace(sc, materials=mats)
            return jnp.mean(
                render(s, c, width=W, height=H, raster_backend=bk)[..., :3] ** 2
            )

        gf = jax.grad(loss, allow_int=True)
        t(f"render fwd+bwd (mat grads) [{bk}]",
          lambda m, sc, c: gf(m, sc, c).roughness, scene.materials, scene, cam)
    elif which == "texbwd":
        def loss(q, sc, c):
            s = dataclasses.replace(sc, combined_atlas=q)
            return jnp.mean(render(s, c, width=W, height=H)[..., :3] ** 2)

        gf = jax.grad(loss)
        t("render fwd+bwd (TEXEL grads)",
          lambda q, sc, c: gf(q, sc, c).pages, scene.combined_atlas, scene, cam)
    elif which == "mips":
        def f(sc, c):
            return render(sc, c, width=W, height=H, mip_lod=True)[..., 0]

        t("render fwd, trilinear mips", f, scene, cam)


if __name__ == "__main__":
    main(sys.argv[1])
