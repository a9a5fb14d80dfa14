"""Differential profiling of the north-star config (mori_knob + IBL,
1080p, fwd+bwd) — finds where the backward cost lives by toggling one
feature at a time. Run on the real TPU chip (exclusively — see PERF.md)."""

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
ITERS = 5


def t(label, fn, *args):
    r = time_device_loop(fn, *args, iters=ITERS, pixels=W * H)
    print(f"{label:45s} {r.ms_per_iter:8.1f} ms  {r.pixels_per_s/1e6:7.1f} Mpix/s")
    return r.ms_per_iter


def main():
    assets = scenes.AssetCache()
    knob = scenes.mori_knob_scene(assets=assets, environment="chelsea_stairs").with_ibl()
    cam = Camera.create(position=(0.0, 0.8, -2.2), pitch=0.02, aspect=W / H)

    def fwd(scene):
        def f(mats, c):
            s = dataclasses.replace(scene, materials=mats)
            return render(s, c, width=W, height=H)[..., 0]

        return f

    def fwdbwd(scene):
        def loss(mats, c):
            s = dataclasses.replace(scene, materials=mats)
            return jnp.mean(render(s, c, width=W, height=H)[..., :3] ** 2)

        gf = jax.grad(loss, allow_int=True)

        def f(mats, c):
            g = gf(mats, c)
            return g.roughness[:1]

        return f

    # 1. the full north-star config
    t("full fwd", fwd(knob), knob.materials, cam)
    t("full fwd+bwd", fwdbwd(knob), knob.materials, cam)

    # 2. no IBL (constant ambient), sky still on
    no_ibl = dataclasses.replace(knob, ibl=None)
    t("no-IBL fwd", fwd(no_ibl), no_ibl.materials, cam)
    t("no-IBL fwd+bwd", fwdbwd(no_ibl), no_ibl.materials, cam)

    # 3. no sky (clear color), IBL on
    no_sky = dataclasses.replace(knob, sky_map=None, env_map=None)
    t("no-sky fwd", fwd(no_sky), no_sky.materials, cam)
    t("no-sky fwd+bwd", fwdbwd(no_sky), no_sky.materials, cam)

    # 4. neither
    plain = dataclasses.replace(knob, ibl=None, sky_map=None, env_map=None)
    t("plain fwd", fwd(plain), plain.materials, cam)
    t("plain fwd+bwd", fwdbwd(plain), plain.materials, cam)


if __name__ == "__main__":
    main()
