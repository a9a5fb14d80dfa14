"""Extended benchmark: every BASELINE.json config at 1080p, fwd and fwd+bwd,
plus row-sharding scaling on available devices. Writes PERF.md-ready lines.

Run on the TPU host: python scripts/bench_full.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, ".")

from physically_based_renderer_tpu import Camera, scenes  # noqa: E402
from physically_based_renderer_tpu.renderer import render  # noqa: E402

W, H = 1920, 1080
K = 8


def time_loop(fn, *args) -> float:
    @jax.jit
    def loop(*a):
        def body(c, _):
            return fn(c, *a), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / K * 1000.0


def bench_scene(name, scene, cam):
    def fwd(c, scene, cam):
        cam2 = dataclasses.replace(cam, position=cam.position + c * 0.0)
        img = render(scene, cam2, width=W, height=H)
        return c + img[0, 0, 0] * 0.0 + 1e-12

    ms_f = time_loop(fwd, scene, cam)

    def loss(mats, scene, cam2):
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(render(s, cam2, width=W, height=H)[..., :3] ** 2)

    grad_fn = jax.grad(loss, allow_int=True)

    def fwdbwd(c, scene, cam):
        cam2 = dataclasses.replace(cam, position=cam.position + c * 0.0)
        g = grad_fn(scene.materials, scene, cam2)
        return c + g.roughness[0] * 0.0 + 1e-12

    ms_fb = time_loop(fwdbwd, scene, cam)
    px = W * H
    print(
        json.dumps(
            {
                "config": name,
                "fwd_ms": round(ms_f, 2),
                "fwd_Mpix_s": round(px / ms_f / 1e3, 1),
                "fwdbwd_ms": round(ms_fb, 2),
                "fwdbwd_Mpix_s": round(px / ms_fb / 1e3, 1),
            }
        ),
        flush=True,
    )


def main():
    cam_grid = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)

    # config 2: analytic sphere grid (195k tris)
    bench_scene("sphere_grid_analytic", scenes.red_sphere_grid_scene(slices=64, stacks=32), cam_grid)

    # config 2 full: textured PBR scene (58 spheres + textures)
    try:
        s = scenes.pbr_scene(texture_size=512).with_combined_textures(packed=True)
        bench_scene("pbr_scene_textured_packed", s, cam_grid)
        s = scenes.pbr_scene(texture_size=512).with_combined_textures()
        bench_scene("pbr_scene_textured_combined", s, cam_grid)
        bench_scene("pbr_scene_textured_separate", scenes.pbr_scene(texture_size=512), cam_grid)
    except Exception as e:
        print(f"# pbr_scene skipped: {e}", flush=True)

    # config 3: rustediron sphere
    try:
        s = scenes.rustediron_sphere_scene(texture_size=512).with_combined_textures(packed=True)
        bench_scene("rustediron_sphere", s, Camera.create(position=(0, 0, -3.0), aspect=W / H))
    except Exception as e:
        print(f"# rustediron skipped: {e}", flush=True)

    # config 4: mori_knob
    try:
        s = scenes.mori_knob_scene(texture_size=256)
        bench_scene("mori_knob", s, Camera.create(position=(0.0, 0.8, -3.0), pitch=-0.2, aspect=W / H))
    except Exception as e:
        print(f"# mori_knob skipped: {e}", flush=True)

    # config 5: IBL (mori_knob + Chelsea_Stairs env)
    try:
        s = scenes.mori_knob_scene(texture_size=256, environment="chelsea_stairs").with_ibl()
        bench_scene("mori_knob_ibl", s, Camera.create(position=(0.0, 0.8, -3.0), pitch=-0.2, aspect=W / H))
    except Exception as e:
        print(f"# ibl skipped: {e}", flush=True)


if __name__ == "__main__":
    main()
