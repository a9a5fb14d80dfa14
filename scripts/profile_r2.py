"""Round-2 deep profile: binning sub-stages + backward breakdown (real TPU)."""

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
from physically_based_renderer_tpu.models.scene import flatten_scene
from physically_based_renderer_tpu.ops import raster, raster_pallas
from physically_based_renderer_tpu.ops.raster import setup_triangles
from physically_based_renderer_tpu.ops.raster_bin import (
    bin_triangles,
    pack_triangle_fields,
)
from physically_based_renderer_tpu.renderer import render, shade_pixels
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
    T = geom.tris.shape[0]
    print(f"T={T}, V={geom.pos_w.shape[0]}, materials={nm}")

    def t(name, fn, *args):
        r = time_device_loop(fn, *args, iters=ITERS)
        print(f"{name:46s} {r.ms_per_iter:8.2f} ms")
        return r.ms_per_iter

    # --- binning sub-stages -------------------------------------------------
    def s1(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        return st.xy[:, 0, 0]

    t("setup_triangles (corner gather)", s1, clip)

    def s2(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        f = pack_triangle_fields(st, geom.face_material)
        return f[:, 0]

    t("setup + pack_fields", s2, clip)

    # representative pre-gather: PAIRS random rows from a (T, 16) table
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
    ftab = jnp.zeros((T, 16), jnp.float32)

    def s3(f):
        return f[idx].T[0]

    t("pre-gather (T,16) rows + transpose", s3, ftab)

    def s3b(f):
        return f[idx][:, 0]

    t("pre-gather (T,16) rows, no transpose", s3b, ftab)

    # sort of 3T keys (the slot sort)
    keys3 = jax.random.randint(key, (3 * T,), 0, 1 << 30, dtype=jnp.int32)

    def s4(k):
        return jnp.sort(k)[:1]

    t("sort 3T int32 keys", s4, keys3)

    def s5(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material,
        )
        return b.packed[0]

    t("bin FULL (16 fields)", s5, clip)

    def s5b(c):
        st = setup_triangles(c, geom.tris, W, H, True, None)
        b = bin_triangles(
            st, width=W, height=H, tile_h=16, tile_w=128, chunk=128,
            face_material=geom.face_material, pairs_cap=98304,
        )
        return b.packed[0]

    t("bin FULL, pairs_cap=96k", s5b, clip)

    # --- shading fwd / bwd (from a fixed G-buffer) --------------------------
    tri_id, mat_id = raster_pallas.rasterize_binned(
        clip, geom.tris, width=W, height=H,
        face_material=geom.face_material, num_materials=nm,
    )
    attrs, _d, _m = raster.interpolate_packed(
        packed, clip, geom.tris, tri_id, width=W, height=H
    )
    attrs = jax.block_until_ready(attrs)
    mat_id = jax.block_until_ready(mat_id)

    def shade_only(mats, a):
        hdr, _, _keep = shade_pixels(
            pos_w=a[..., 0:3], normal_w=a[..., 3:6], tangent_w=a[..., 3:6],
            bitangent_w=a[..., 3:6], uv=a[..., 0:2] * 0.0,
            material_id=mat_id, materials=mats, atlas=None,
            lights=scene.lights, ambient=scene.ambient, eye=camera.position,
        )
        return hdr

    t("shade fwd (gather props)", lambda a: shade_only(scene.materials, a)[..., 0], attrs)

    def shade_loss(mats, a):
        return jnp.mean(shade_only(mats, a) ** 2)

    gfn = jax.grad(shade_loss, allow_int=True)

    def shade_bwd(a):
        g = gfn(scene.materials, a)
        return g.roughness[:1]

    t("shade fwd+bwd (material grads)", shade_bwd, attrs)

    # --- full render fwd+bwd -------------------------------------------------
    def loss_fn(materials, cam):
        s = dataclasses.replace(scene, materials=materials)
        img = render(s, cam, width=W, height=H)
        return jnp.mean(img[..., :3] ** 2)

    grad_full = jax.grad(loss_fn, allow_int=True)

    def full_bwd(cpos):
        cam = dataclasses.replace(camera, position=cpos)
        g = grad_full(scene.materials, cam)
        return g.roughness[:1]

    t("render fwd+bwd (materials)", full_bwd, jnp.asarray((0.0, -3.0, -18.0)))


if __name__ == "__main__":
    main()
