"""Round-5: render_soft backward story (VERDICT r4 ask #4).

Measures the K=3 differentiable-visibility render at 1080p — forward AND
fwd+bwd with GEOMETRY gradients (a world-translation parameter, the mode's
reason to exist) — before/after the fused-shading peels.

    python scripts/profile_soft.py [layers]
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
from physically_based_renderer_tpu.renderer import render_soft
from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080
K = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    draw = scene.draws[0]

    def with_offset(t):
        w = draw.worlds.at[:, 3, 0].add(t)  # translate x — silhouette moves
        return dataclasses.replace(
            scene, draws=(dataclasses.replace(draw, worlds=w),)
        )

    for fused in (len(sys.argv) <= 2 or sys.argv[2] != "naive",):
        tag = "fused" if fused else "naive"

        def fwd(t, c):
            return render_soft(
                with_offset(t), c, width=W, height=H, num_layers=K,
                fused_shading=fused,
            )

        def loss(t, c):
            img = fwd(t, c)
            return jnp.mean(img[..., :3] ** 2)

        gf = jax.grad(loss)

        if "bwdonly" not in sys.argv:
            r = time_device_loop(
                lambda t, c: fwd(t, c)[..., 0], jnp.float32(0.0), cam,
                iters=5, pixels=W * H,
            )
            print(f"soft K={K} {tag} fwd     {r.ms_per_iter:8.2f} ms "
                  f"{r.pixels_per_s / 1e6:7.1f} Mpix/s", flush=True)
        r = time_device_loop(
            gf, jnp.float32(0.0), cam, iters=5, pixels=W * H,
        )
        print(f"soft K={K} {tag} fwd+bwd {r.ms_per_iter:8.2f} ms "
              f"{r.pixels_per_s / 1e6:7.1f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
