"""Round-4: the first BACKWARD stage budget (VERDICT r3 weak #2).

Measures the pieces of the fused-path backward at 1080p:
  * shade_backward — the Pallas recompute-in-bwd kernel (both modes)
  * _scatter_props_by_id — the one-hot MXU table-grad contraction
  * want_gbuf residual delta — fused fwd kernel with vs without the
    attrs residual output (grid scene)
"""

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
from physically_based_renderer_tpu.ops.shade_core import pack_shading_uniforms
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def t(label, fn, *args):
    try:
        r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
        print(f"{label:52s} {r.ms_per_iter:8.2f} ms", flush=True)
        return r.ms_per_iter
    except Exception as e:
        print(f"{label:52s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m = 56
    mat = jax.random.uniform(k1, (m, 9))
    mid = jax.random.randint(k2, (H, W), 0, m, jnp.int32)
    hit = jax.random.uniform(k3, (H, W)) > 0.4
    attrs = jax.random.normal(k4, (H, W, 6))
    ls = jax.random.uniform(k1, (4, 3))
    ld = jax.random.normal(k2, (4, 3))
    lp = jnp.zeros((4, 3))
    lsp = jnp.zeros((4,))
    amb = jnp.asarray([0.03, 0.03, 0.03])
    eye = jnp.asarray([0.0, 0.0, -5.0])
    sh9 = jax.random.normal(k3, (9, 3)) * 0.1

    for ibl in (False, True):
        c_out = 11 if ibl else 4
        g = jax.random.normal(k4, (H, W, c_out))
        uni = pack_shading_uniforms(ls, ld, lp, lsp, amb, eye, sh9 if ibl else None)

        @jax.jit
        def bwd(g_, a_, mid_, hit_, mat_, uni_, ibl=ibl):
            ga, gp, gu = raster_pallas.shade_backward(
                g_, a_, mid_, hit_, mat_, uni_,
                num_dir=4, num_point=0, num_spot=0, ibl=ibl,
                apply_tonemap=not ibl,
            )
            return ga[..., 0]

        t(f"shade_backward kernel ibl={ibl}", bwd, g, attrs, mid, hit, mat, uni)

    gp = jax.random.normal(k1, (H, W, 9))

    @jax.jit
    def scat(gp_, mid_):
        return raster_pallas._scatter_props_by_id(gp_, mid_, m, 9)[0, 0]

    t("_scatter_props_by_id (M=56)", scat, gp, mid)

    # want_gbuf delta on the grid
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    def fwd_kernel(mats, c, want_gbuf):
        s = dataclasses.replace(scene, materials=mats)
        geom = flatten_scene_corners(s, textured=False)
        clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
        mat_props = jnp.concatenate(
            [s.materials.diffuse, s.materials.metallic[:, None],
             s.materials.fresnel_r0, s.materials.roughness[:, None],
             s.materials.opacity[:, None]], axis=-1)
        li = s.lights
        out = raster_pallas.rasterize_binned_shade(
            clip, geom.attrs, geom.face_material, mat_props,
            li.strength, li.direction, li.position, li.spot_power,
            s.ambient, c.position,
            width=W, height=H, num_materials=s.materials.num_materials,
            num_dir=li.num_dir, num_point=li.num_point, num_spot=li.num_spot,
            want_gbuf=want_gbuf,
        )
        return out[0][..., 0]

    t("grid fwd kernel want_gbuf=False",
      jax.jit(functools.partial(fwd_kernel, want_gbuf=False)),
      scene.materials, cam)
    t("grid fwd kernel want_gbuf=True",
      jax.jit(functools.partial(fwd_kernel, want_gbuf=True)),
      scene.materials, cam)


if __name__ == "__main__":
    main()
