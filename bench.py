"""Benchmark: 1080p shaded pixels/s/chip, forward+backward (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the whole timing loop runs ON DEVICE as one lax.scan program
(K fwd+bwd steps with a carry-dependent input perturbation so XLA cannot
CSE or hoist the iterations), bracketed by a single host sync. This is the
only honest way to time through the axon tunnel, whose per-dispatch latency
(~100 ms) and unreliable block_until_ready would otherwise dominate.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the reference-equivalent real-time bar: its 60 fps frame cap
(d3dApp.cpp:104-114) at 1080p, forward-only ⇒ 124.4 Mpix/s. We report
forward+BACKWARD throughput against that bar, so vs_baseline ≥ 1.0 means we
out-render the reference's real-time budget while also computing gradients.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the fwd+bwd program takes minutes to compile
# through the TPU tunnel; cached recompiles are ~free across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BASELINE_PIXELS_PER_S = 1920 * 1080 * 60.0  # 60 fps @ 1080p, forward-only

WIDTH, HEIGHT = 1920, 1080
ITERS = 10


def main() -> None:
    from physically_based_renderer_tpu import Camera, scenes
    from physically_based_renderer_tpu.renderer import render

    # Flagship workload: the 58-sphere PBR scene geometry (~195k tris) with
    # analytic materials (texture assets may not be present on the bench host).
    scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
    camera = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)

    def loss_fn(materials, cam):
        s = dataclasses.replace(scene, materials=materials)
        img = render(s, cam, width=WIDTH, height=HEIGHT)
        return jnp.mean(img[..., :3] ** 2)

    grad_fn = jax.grad(loss_fn, allow_int=True)

    @jax.jit
    def bench_loop(materials, cam):
        def body(carry, _):
            # carry-dependent zero-perturbation defeats CSE/hoisting while
            # changing no values.
            cam2 = dataclasses.replace(cam, position=cam.position + carry * 0.0)
            g = grad_fn(materials, cam2)
            return carry + g.roughness[0] * 0.0 + 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return acc

    acc = bench_loop(scene.materials, camera)  # compile + warm
    float(acc)
    t0 = time.perf_counter()
    acc = bench_loop(scene.materials, camera)
    float(acc)  # host roundtrip = full sync
    dt = (time.perf_counter() - t0) / ITERS

    pixels_per_s = WIDTH * HEIGHT / dt
    print(
        json.dumps(
            {
                "metric": "1080p shaded pixels/s/chip (fwd+bwd)",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
