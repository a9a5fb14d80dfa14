"""Round-4b: the fused-IBL north-star path + fused backward on real TPU."""

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
    try:
        r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
        print(
            f"{label:48s} {r.ms_per_iter:8.2f} ms  {r.pixels_per_s/1e6:7.1f} Mpix/s",
            flush=True,
        )
        return r.ms_per_iter
    except Exception as e:
        print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


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


def main():
    which = sys.argv[1]
    if which == "knob":
        assets = scenes.AssetCache()
        knob = scenes.mori_knob_scene(
            assets=assets, environment="chelsea_stairs"
        ).with_ibl()
        cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)
        t("knob IBL-fused fwd", jax.jit(fwd(knob)), knob.materials, cam)
        t("knob IBL-fused fwd+bwd", jax.jit(fwdbwd(knob)), knob.materials, cam)
        t("knob IBL-fused th=8 fwd", jax.jit(fwd(knob, tile_h=8)),
          knob.materials, cam)
        t("knob IBL-fused th=8 fwd+bwd", jax.jit(fwdbwd(knob, tile_h=8)),
          knob.materials, cam)
    elif which == "grid":
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
        t("grid fused fwd", jax.jit(fwd(scene)), scene.materials, cam)
        t("grid fused fwd+bwd (pallas bwd)", jax.jit(fwdbwd(scene)),
          scene.materials, cam)


if __name__ == "__main__":
    main()
