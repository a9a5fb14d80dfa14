"""Round-4: per-tile floor of the fused shade kernel — tile_h sweep on the
floor-dominated knob (12k tris) and the slot-dominated grid (195k tris),
plus extraction-precision cost."""

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
    print(f"{label:52s} {r.ms_per_iter:8.2f} ms", flush=True)
    return r.ms_per_iter


def fwd(scene, **kw):
    def f(mats, c):
        s = dataclasses.replace(scene, materials=mats)
        return render(s, c, width=W, height=H, **kw)[..., 0]

    return f


def main():
    which = sys.argv[1]
    if which == "knob":
        assets = scenes.AssetCache()
        scene = scenes.mori_knob_scene(assets=assets, environment="chelsea_stairs")
        scene = dataclasses.replace(scene, ibl=None, sky_map=None, env_map=None)
        cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)
    else:
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    for th in (4, 8, 16):
        t(f"{which} pallas_shade tile_h={th}",
          jax.jit(fwd(scene, tile_h=th)), scene.materials, cam)
    t(f"{which} pallas_shade th=8 prec=high",
      jax.jit(fwd(scene, tile_h=8, gbuf_precision="high")),
      scene.materials, cam)
    t(f"{which} pallas_shade th=4 prec=high",
      jax.jit(fwd(scene, tile_h=4, gbuf_precision="high")),
      scene.materials, cam)


if __name__ == "__main__":
    main()
