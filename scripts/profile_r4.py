"""Round-4 stage profiling: first BACKWARD budgets (VERDICT r3 weak #2) plus
the XLA-tail piece costs that decide the fused-IBL kernel design.

Run one part per process (axon inflation — PERF.md):
    python scripts/profile_r4.py grid|knob|tail
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 10


def t(label, fn, *args):
    r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
    print(
        f"{label:48s} {r.ms_per_iter:8.2f} ms  {r.pixels_per_s / 1e6:7.1f} Mpix/s",
        flush=True,
    )
    return r.ms_per_iter


def fwd(scene, **kw):
    def f(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render(s, c, width=W, height=H, **kw)[..., 0]

    return f


def fwdbwd(scene, **kw):
    def loss(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(render(s, c, width=W, height=H, **kw)[..., :3] ** 2)

    gf = jax.grad(loss, allow_int=True)

    def f(mats, c):
        g = gf(mats, c)
        return g.roughness[:1]

    return f


def part_grid():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    # Binning alone (the setup+bin prefix of the fused kernel path)
    from physically_based_renderer_tpu import math3d
    from physically_based_renderer_tpu.models.scene import flatten_scene_corners
    from physically_based_renderer_tpu.ops.raster import setup_corners
    from physically_based_renderer_tpu.ops.raster_bin import bin_triangles

    def bin_only(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        geom = flatten_scene_corners(s, textured=False)
        clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
        st = setup_corners(clip, W, H, True, None)
        cc = jnp.concatenate(
            [geom.attrs * st.inv_w[..., None], st.inv_w[..., None]], axis=-1
        )
        b = bin_triangles(
            st, width=W, height=H, tile_h=4, tile_w=128, max_span=16,
            face_material=geom.face_material, corner_channels=cc,
        )
        return b.packed[0]

    t("grid binning+pack only", jax.jit(bin_only), scene.materials, cam)
    t("grid fwd (pallas_shade)", jax.jit(fwd(scene)), scene.materials, cam)
    t("grid fwd+bwd", jax.jit(fwdbwd(scene)), scene.materials, cam)
    t("grid fwd gbuf-backend", jax.jit(fwd(scene, raster_backend="pallas_gbuf")),
      scene.materials, cam)


def part_knob():
    assets = scenes.AssetCache()
    knob = scenes.mori_knob_scene(
        assets=assets, environment="chelsea_stairs"
    ).with_ibl()
    cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)

    t("knob full fwd", jax.jit(fwd(knob)), knob.materials, cam)
    t("knob full fwd+bwd", jax.jit(fwdbwd(knob)), knob.materials, cam)
    no_sky = dataclasses.replace(knob, sky_map=None, env_map=None)
    t("knob no-sky fwd", jax.jit(fwd(no_sky)), no_sky.materials, cam)
    t("knob no-sky fwd+bwd", jax.jit(fwdbwd(no_sky)), no_sky.materials, cam)
    plain = dataclasses.replace(knob, ibl=None, sky_map=None, env_map=None)
    t("knob plain fwd (pallas_shade)", jax.jit(fwd(plain)), plain.materials, cam)
    t("knob plain fwd+bwd", jax.jit(fwdbwd(plain)), plain.materials, cam)
    t("knob plain fwd gbuf-backend",
      jax.jit(fwd(plain, raster_backend="pallas_gbuf")), plain.materials, cam)


def part_tail():
    """Standalone XLA tail pieces at 1080p scale."""
    import numpy as np

    assets = scenes.AssetCache()
    knob = scenes.mori_knob_scene(
        assets=assets, environment="chelsea_stairs"
    ).with_ibl()
    ibl = knob.ibl
    key = jax.random.PRNGKey(1)
    n = jax.random.normal(key, (H, W, 3), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    v = jnp.roll(n, 1, axis=0)
    albedo = jnp.abs(n)
    f0 = albedo * 0.5
    metallic = albedo[..., 0]
    rough = albedo[..., 1]

    from physically_based_renderer_tpu.ops.ibl import ambient_ibl
    from physically_based_renderer_tpu.ops import sky as sky_ops

    @jax.jit
    def amb(n_, v_):
        return ambient_ibl(ibl, n_, v_, albedo, f0, metallic, rough)[..., 0]

    t("XLA ambient_ibl (SH9 + quad spec)", amb, n, v)

    sky_src = knob.sky_map if knob.sky_map is not None else knob.env_map
    print(f"  sky_src: dtype={sky_src.dtype} shape={sky_src.shape}")
    sp_f16 = ibl.specular_stack_f16
    print(f"  spec_stack_f16: {sp_f16.dtype} {sp_f16.shape}; "
          f"irr_sh9={ibl.irradiance_sh9 is not None}")

    @jax.jit
    def sky(n_):
        return sky_ops.sample_sky(sky_src, n_)[..., 0]

    t("XLA sample_sky", sky, n)

    mats = knob.materials
    print(f"  num_materials={mats.num_materials}")
    from physically_based_renderer_tpu.ops.fetch import fetch_columns

    mid = jax.random.randint(key, (H, W), 0, mats.num_materials, jnp.int32)
    tbl = jnp.concatenate(
        [mats.diffuse, mats.metallic[:, None], mats.fresnel_r0,
         mats.roughness[:, None], mats.opacity[:, None]], axis=-1,
    )

    @jax.jit
    def fetch(tbl_, mid_):
        return fetch_columns(tbl_, mid_)[..., 0]

    t("XLA fetch_columns (M=5)", fetch, tbl, mid)


if __name__ == "__main__":
    {"grid": part_grid, "knob": part_knob, "tail": part_tail}[sys.argv[1]]()
