"""Benchmark: 1080p shaded pixels/s/chip, forward+backward (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.

The headline metric is the NORTH-STAR workload — mori_knob + Chelsea_Stairs
IBL at 1080p, forward+backward (mori_knob's MTL binds no texture maps: 5
analytic materials + full IBL) — when assets are present, falling back to
the analytic sphere grid otherwise. Textured throughput is covered by the
``pbr_textured_*`` configs and ``rustediron_ibl`` (textured sphere + sIBL
environment, the reference's own ``Samples/rusted_iron_pbr.png`` content). ``configs`` carries every
BASELINE config measured this run (pixels/s each), plus the single-chip
sharded-vs-unsharded overhead ratio (the available scaling proxy on a
1-chip host).

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

# Persistent compile cache: the fwd+bwd programs take minutes to compile
# through the TPU tunnel; cached recompiles are ~free across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BASELINE_PIXELS_PER_S = 1920 * 1080 * 60.0  # 60 fps @ 1080p, forward-only

WIDTH, HEIGHT = 1920, 1080
ITERS = 10


def time_fwd_bwd(scene, camera, iters=ITERS):
    """Pixels/s for one fwd+bwd step (gradients w.r.t. the material bank).

    The scene is a jit ARGUMENT, not a closure: closed-over scenes embed
    every texture page as an HLO constant, and a few hundred MB of constants
    exceeds the axon tunnel's compile-request size limit (HTTP 413)."""
    from physically_based_renderer_tpu.renderer import render

    def loss_fn(materials, sc, cam):
        s = dataclasses.replace(sc, materials=materials)
        img = render(s, cam, width=WIDTH, height=HEIGHT)
        return jnp.mean(img[..., :3] ** 2)

    grad_fn = jax.grad(loss_fn, allow_int=True)

    @jax.jit
    def bench_loop(sc, cam):
        def body(carry, _):
            # carry-dependent zero-perturbation defeats CSE/hoisting while
            # changing no values.
            cam2 = dataclasses.replace(cam, position=cam.position + carry * 0.0)
            g = grad_fn(sc.materials, sc, cam2)
            return carry + g.roughness[0] * 0.0 + 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    acc = bench_loop(scene, camera)  # compile + warm
    float(acc)
    t0 = time.perf_counter()
    acc = bench_loop(scene, camera)
    float(acc)  # host roundtrip = full sync
    dt = (time.perf_counter() - t0) / iters
    return WIDTH * HEIGHT / dt


def time_sharded_overhead(scene, camera, iters=ITERS):
    """Single-chip shard_map render vs plain render — the forward-path
    sharding overhead ratio (≤1.0 is free; the available scaling proxy
    without a multi-chip host)."""
    from physically_based_renderer_tpu.parallel import sharded
    from physically_based_renderer_tpu.renderer import render

    mesh = sharded.make_render_mesh(jax.devices()[:1])

    def plain(sc, cam):
        return render(sc, cam, width=WIDTH, height=HEIGHT)[..., 0].sum()

    def shmap(sc, cam):
        return sharded.render_sharded(
            sc, cam, mesh=mesh, width=WIDTH, height=HEIGHT
        )[..., 0].sum()

    def loop(fn):
        @jax.jit
        def run(sc, cam):
            def body(carry, _):
                cam2 = dataclasses.replace(cam, position=cam.position + carry * 0.0)
                return carry + fn(sc, cam2) * 0.0 + 1e-12, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc

        float(run(scene, camera))  # compile + warm
        t0 = time.perf_counter()
        float(run(scene, camera))
        return (time.perf_counter() - t0) / iters

    return loop(shmap) / loop(plain)


def time_tri_sharded_overhead(scene, camera, iters=ITERS):
    """Single-chip triangle-sharded render vs plain render — the primitive-
    parallel (ring/sequence-parallel analog) overhead proxy. The default
    band reduce-scatter merge rasters each band through the row-layout
    G-buffer kernel and shades through the fused shading kernel, so at n=1
    the structure is ~the single-chip fast path (measured 0.98×; the old
    id-merge + re-interpolation structure measured 4.61×)."""
    from physically_based_renderer_tpu.parallel import sharded
    from physically_based_renderer_tpu.renderer import render

    mesh = sharded.make_tri_mesh(jax.devices()[:1])

    def plain(sc, cam):
        return render(sc, cam, width=WIDTH, height=HEIGHT)[..., 0].sum()

    def tri(sc, cam):
        return sharded.render_tri_sharded(
            sc, cam, mesh=mesh, width=WIDTH, height=HEIGHT
        )[..., 0].sum()

    def loop(fn):
        @jax.jit
        def run(sc, cam):
            def body(carry, _):
                cam2 = dataclasses.replace(cam, position=cam.position + carry * 0.0)
                return carry + fn(sc, cam2) * 0.0 + 1e-12, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc

        float(run(scene, camera))  # compile + warm
        t0 = time.perf_counter()
        float(run(scene, camera))
        return (time.perf_counter() - t0) / iters

    return loop(tri) / loop(plain)


def time_sharded_train_overhead(scene, camera, iters=ITERS):
    """Single-chip shard_map TRAIN-STEP vs plain fwd+bwd step — the proxy
    that includes the scaling-relevant backward psum gradient all-reduce
    (the ≥80% multi-host gate is about exactly this path), not just the
    forward render. ≤~1.0 means the sharding machinery (shard_map partition
    + grad psum) is free at n=1."""
    from physically_based_renderer_tpu.parallel import sharded
    from physically_based_renderer_tpu.renderer import render

    mesh = sharded.make_render_mesh(jax.devices()[:1])
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    sh_step = sharded.make_train_step(mesh=mesh, width=WIDTH, height=HEIGHT)

    def plain_step(sc, cam, tgt):
        def loss_fn(materials):
            s = dataclasses.replace(sc, materials=materials)
            img = render(s, cam, width=WIDTH, height=HEIGHT)
            return jnp.mean((img[..., :3] - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(sc.materials)
        new_mats = jax.tree.map(
            lambda p, g: p - 0.1 * g
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            sc.materials,
            grads,
        )
        return dataclasses.replace(sc, materials=new_mats), loss

    def loop(step_fn):
        @jax.jit
        def run(sc, cam, tgt):
            def body(carry, _):
                cam2 = dataclasses.replace(cam, position=cam.position + carry * 0.0)
                _s2, loss = step_fn(sc, cam2, tgt)
                return carry + loss * 0.0 + 1e-12, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc

        float(run(scene, camera, target))  # compile + warm
        t0 = time.perf_counter()
        float(run(scene, camera, target))
        return (time.perf_counter() - t0) / iters

    return loop(sh_step) / loop(jax.jit(plain_step))


def _run_config(name: str) -> None:
    """Measure ONE config and print its JSON line. Invoked in a fresh
    subprocess per config: the axon tunnel's device state is not reliably
    reusable across large back-to-back programs — measuring several 1080p
    fwd+bwd pipelines in one process inflated the LAST config ~14×
    (1151 ms vs 81 ms exclusive) from accumulated device buffers/compiled
    programs. Process isolation restores exclusive-run numbers; the
    persistent compile cache keeps repeat subprocess launches cheap."""
    from physically_based_renderer_tpu import Camera, scenes

    if name == "sphere_grid_analytic":
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_fwd_bwd(scene, cam)
    elif name == "sharded_overhead_1chip":
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_sharded_overhead(scene, cam)
    elif name == "sharded_train_overhead_1chip":
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_sharded_train_overhead(scene, cam)
    elif name == "tri_sharded_overhead_1chip":
        scene = scenes.red_sphere_grid_scene(slices=64, stacks=32)
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_tri_sharded_overhead(scene, cam)
    elif name == "pbr_textured_f32":
        # mode="quad": f32 QUAD-packed pages — ONE row gather per sample
        # with bit-exact f32 forward AND exact texel gradients (the same
        # values/grads as the 4-gather f32 path, tests pin equality).
        assets = scenes.AssetCache()
        scene = scenes.pbr_scene(assets=assets).with_combined_textures(mode="quad")
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_fwd_bwd(scene, cam)
    elif name == "pbr_textured_half":
        assets = scenes.AssetCache()
        scene = scenes.pbr_scene(assets=assets).with_combined_textures(mode="half")
        cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=WIDTH / HEIGHT)
        value = time_fwd_bwd(scene, cam)
    elif name == "rustediron_ibl":
        # Textured + IBL — the reference's own Samples/rusted_iron_pbr.png
        # content (BASELINE configs 3+5): rustediron maps on a sphere against
        # the Chelsea_Stairs sIBL environment. Rides pallas_gbuf + the merged
        # spec/sky gather (render ibl_merged auto).
        assets = scenes.AssetCache()
        scene = scenes.rustediron_sphere_scene(
            assets=assets, environment="chelsea_stairs"
        ).with_ibl().with_combined_textures(mode="quad")
        cam = Camera.create(position=(0.0, 0.0, -2.5), aspect=WIDTH / HEIGHT)
        value = time_fwd_bwd(scene, cam)
    elif name == "mori_knob_ibl":
        # mori_knob's MTL binds no texture maps (5 scalar materials) — IBL
        # is the load-bearing extension here (BASELINE configs 4+5).
        assets = scenes.AssetCache()
        scene = scenes.mori_knob_scene(
            assets=assets, environment="chelsea_stairs"
        ).with_ibl()
        cam = Camera.create(
            position=(0.0, 0.8, -2.2), pitch=0.02, aspect=WIDTH / HEIGHT
        )
        value = time_fwd_bwd(scene, cam)
    else:
        raise SystemExit(f"unknown config {name!r}")
    print(json.dumps({"config": name, "value": round(float(value), 4)}))


CONFIGS = [
    "sphere_grid_analytic",
    "sharded_overhead_1chip",
    "sharded_train_overhead_1chip",
    "tri_sharded_overhead_1chip",
    "pbr_textured_f32",
    "pbr_textured_half",
    "rustediron_ibl",
    "mori_knob_ibl",
]


def main() -> None:
    import os
    import subprocess
    import sys

    from physically_based_renderer_tpu import scenes

    try:
        have_assets = scenes.AssetCache().root is not None
    except Exception:
        have_assets = False

    results: dict[str, object] = {}
    first = True
    for name in CONFIGS:
        # Let the tunnel settle between large back-to-back device programs:
        # a config launched immediately after a heavy predecessor measured
        # up to 16× slow (PERF.md round-3/4 contention notes).
        if not first:
            time.sleep(10)
        first = False
        if not have_assets and name not in (
            "sphere_grid_analytic",
            "sharded_overhead_1chip",
            "sharded_train_overhead_1chip",
            "tri_sharded_overhead_1chip",
        ):
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", name],
                capture_output=True,
                text=True,
                timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            results[name] = json.loads(line)["value"]
        except Exception as e:
            results[name] = f"error: {type(e).__name__}"

    northstar = results.get("mori_knob_ibl")
    if isinstance(northstar, (int, float)):
        metric = "1080p mori_knob+IBL pixels/s/chip (fwd+bwd)"
        value = northstar
    else:
        metric = "1080p shaded pixels/s/chip (fwd+bwd, analytic grid)"
        value = results["sphere_grid_analytic"]

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 1),
                "unit": "pixels/s",
                "vs_baseline": round(float(value) / BASELINE_PIXELS_PER_S, 4),
                "configs": results,
            }
        )
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        _run_config(sys.argv[2])
    else:
        main()
