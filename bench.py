"""Benchmark: 1080p shaded pixels/s/chip, forward+backward (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the reference-equivalent real-time bar: its 60 fps frame cap
(d3dApp.cpp:104-114) at 1080p, forward-only ⇒ 124.4 Mpix/s. We report
forward+BACKWARD throughput against that bar, so vs_baseline ≥ 1.0 means we
out-render the reference's real-time budget while also computing gradients.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_PIXELS_PER_S = 1920 * 1080 * 60.0  # 60 fps @ 1080p, forward-only

WIDTH, HEIGHT = 1920, 1080
WARMUP = 2
ITERS = 8


def main() -> None:
    import dataclasses

    from physically_based_renderer_tpu import Camera, scenes
    from physically_based_renderer_tpu.renderer import render

    # Flagship workload: the 58-sphere PBR scene geometry (230k tris) with
    # analytic materials (texture assets may not be present on the bench host).
    scene = scenes.pbr_scene(texture_size=256)
    camera = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)

    def loss_fn(materials):
        s = dataclasses.replace(scene, materials=materials)
        img = render(s, camera, width=WIDTH, height=HEIGHT)
        return jnp.mean(img[..., :3] ** 2)

    fwd_bwd = jax.jit(jax.grad(loss_fn, allow_int=True))

    # Warmup / compile
    for _ in range(WARMUP):
        g = fwd_bwd(scene.materials)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = fwd_bwd(scene.materials)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    pixels_per_s = WIDTH * HEIGHT * ITERS / dt
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
