"""Round-4: 1080p perf rows for the remaining render modes (VERDICT ask #6):
render_soft (K=3), render_layered (2+2), render_ssaa (2x) on the grid scene."""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.renderer import (
    render, render_layered, render_soft, render_ssaa,
)
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
ITERS = 5


def t(label, fn, *args):
    try:
        r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
        print(f"{label:44s} {r.ms_per_iter:8.2f} ms  {r.pixels_per_s/1e6:7.1f} Mpix/s",
              flush=True)
        return r.ms_per_iter
    except Exception as e:
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    def f_soft(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render_soft(s, c, width=W, height=H, num_layers=3)[..., 0]

    def f_layered(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render_layered(s, c, width=W, height=H,
                              solid_layers=2, transparent_layers=2)[..., 0]

    def f_ssaa(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render_ssaa(s, c, width=W, height=H, factor=2)[..., 0]

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "soft"):
        t("render_soft K=3 fwd", jax.jit(f_soft), scene.materials, cam)
    if which in ("all", "layered"):
        t("render_layered 2+2 fwd", jax.jit(f_layered), scene.materials, cam)
    if which in ("all", "ssaa"):
        t("render_ssaa 2x (4xMSAA-equiv) fwd", jax.jit(f_ssaa),
          scene.materials, cam)


if __name__ == "__main__":
    main()
