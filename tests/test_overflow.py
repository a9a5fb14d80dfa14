"""Binning-capacity overflow: loud detection + auto-heal on ALL backends.

The in-jit ``jax.debug.print`` warning can't run on the axon TPU tunnel
(no host callbacks — ``raster_bin._backend_supports_callbacks``), so
overflow must be detectable host-side: ``renderer.check_raster_capacity``
reports it from the real pair counts and suggests a working cap, and
``app.RenderLoop`` applies that automatically on the first frame.
"""

import numpy as np

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.app import RenderLoop
from physically_based_renderer_tpu.renderer import check_raster_capacity, render
from physically_based_renderer_tpu.utils.config import RenderConfig

W, H = 128, 64


def test_check_raster_capacity_reports_overflow():
    scene = scenes.red_sphere_grid_scene(slices=16, stacks=8)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    tiny = check_raster_capacity(
        scene, cam, width=W, height=H, pairs_cap=128
    )
    assert tiny["overflowed"]
    assert tiny["num_pairs"] > 128
    assert tiny["suggested_pairs_cap"] >= tiny["num_pairs"]
    assert tiny["suggested_pairs_cap"] % 128 == 0

    ok = check_raster_capacity(
        scene, cam, width=W, height=H, pairs_cap=tiny["suggested_pairs_cap"]
    )
    assert not ok["overflowed"]


def test_suggested_cap_renders_correctly():
    """A tiny cap drops triangles (wrong image); the suggested cap restores
    the exact jnp-reference image through the Pallas path."""
    scene = scenes.red_sphere_grid_scene(slices=16, stacks=8)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    ref = np.asarray(render(scene, cam, width=W, height=H, raster_backend="jnp"))

    stats = check_raster_capacity(scene, cam, width=W, height=H, pairs_cap=128)
    fixed = np.asarray(
        render(
            scene,
            cam,
            width=W,
            height=H,
            raster_backend="pallas_shade_interpret",
            raster_pairs_cap=stats["suggested_pairs_cap"],
        )
    )
    np.testing.assert_allclose(fixed, ref, atol=2e-4)


def test_render_loop_autoheals_overflow():
    scene = scenes.red_sphere_grid_scene(slices=16, stacks=8)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    cfg = RenderConfig(width=W, height=H, raster_pairs_cap=128)
    loop = RenderLoop(scene, cam, config=cfg)
    frame = loop.step()
    assert frame.shape == (H, W, 4)
    assert loop.config.raster_pairs_cap > 128  # auto-raised on first frame


def test_render_checked_raises_on_overflow():
    """The checkify debug path (SURVEY §5 sanitizer plan): forcing a binning
    overflow through render_checked raises loudly instead of silently
    dropping triangles; a sufficient cap passes and renders."""
    import pytest
    from jax.experimental import checkify

    from physically_based_renderer_tpu.renderer import render_checked

    scene = scenes.red_sphere_grid_scene(slices=16, stacks=8)
    cam = Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)
    with pytest.raises(checkify.JaxRuntimeError, match="overflow"):
        render_checked(
            scene, cam, width=W, height=H, raster_pairs_cap=128,
            raster_backend="jnp",
        )

    img = render_checked(scene, cam, width=W, height=H, raster_backend="jnp")
    assert img.shape == (H, W, 4)
    assert bool(np.isfinite(np.asarray(img)).all())
