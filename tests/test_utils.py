"""Aux subsystem tests: checkpoint round-trip, config, profiling harness,
image IO (PNG + RGBE HDR round-trips)."""

import os

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import scenes
from physically_based_renderer_tpu.utils import checkpoint, image_io
from physically_based_renderer_tpu.utils.config import RenderConfig
from physically_based_renderer_tpu.utils.profiling import TimingResult, device_summary


def test_checkpoint_roundtrip(tmp_path):
    scene = scenes.analytic_sphere_scene(slices=8, stacks=4)
    import dataclasses

    modified = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            scene.materials, roughness=scene.materials.roughness * 0.123
        ),
    )
    path = str(tmp_path / "params.npz")
    checkpoint.save_scene_params(path, modified)
    restored = checkpoint.load_scene_params(path, scene)
    np.testing.assert_allclose(
        np.asarray(restored.materials.roughness),
        np.asarray(modified.materials.roughness),
    )
    np.testing.assert_allclose(
        np.asarray(restored.lights.strength), np.asarray(scene.lights.strength)
    )


def test_pytree_none_leaves(tmp_path):
    tree = {"a": jnp.ones((3,)), "b": None}
    path = str(tmp_path / "t.npz")
    checkpoint.save_pytree(path, tree)
    out = checkpoint.load_pytree(path, tree)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
    assert out["b"] is None


def test_render_config_hashable():
    c = RenderConfig(width=640, height=480)
    assert hash(c)
    kw = c.render_kwargs()
    assert kw["width"] == 640


def test_timing_result():
    t = TimingResult(ms_per_iter=20.0, iters=5, pixels=1000)
    assert abs(t.fps - 50.0) < 1e-9
    assert abs(t.pixels_per_s - 50000.0) < 1e-6
    assert "ms" in str(t)


def test_device_summary():
    s = device_summary()
    assert "backend=cpu" in s


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    image_io.save_png(p, img)
    back = image_io.load_image(p)
    assert back.shape == (16, 16, 3)
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 1, (8, 12, 3)) ** 2 * 50.0).astype(np.float32)
    p = str(tmp_path / "x.hdr")
    image_io.save_hdr(p, img)
    back = image_io.load_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: per-pixel precision is
    # maxc/256 (truncating mantissa) — tolerate one ulp of that.
    maxc = img.max(axis=-1, keepdims=True)
    assert (np.abs(back - img) <= maxc / 128.0 + 1e-6).all()


def test_load_reference_hdr():
    root = image_io.find_asset_root()
    if root is None:
        return
    path = os.path.join(root, "Chelsea_Stairs", "Chelsea_Stairs_Env.hdr")
    if not os.path.exists(path):
        return
    env = image_io.load_hdr(path)
    assert env.ndim == 3 and env.shape[2] == 3
    assert np.isfinite(env).all() and env.max() > 1.0  # genuine HDR
