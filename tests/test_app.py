"""Frame-loop harness tests."""

import numpy as np

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.app import FrameInput, RenderLoop, turntable_inputs
from physically_based_renderer_tpu.utils.config import RenderConfig


def test_loop_steps_and_moves_camera():
    scene = scenes.analytic_sphere_scene(slices=8, stacks=4)
    cam = Camera.create(aspect=64 / 48)
    loop = RenderLoop(scene, cam, RenderConfig(width=64, height=48))
    f0 = loop.step(FrameInput(), dt=1 / 60)
    assert f0.shape == (48, 64, 4)
    p0 = np.asarray(loop.camera.position)
    loop.step(FrameInput(forward=1.0), dt=1 / 60)
    p1 = np.asarray(loop.camera.position)
    assert p1[2] > p0[2]  # moved toward +z (forward)
    loop.step(FrameInput(mouse_dx=40.0), dt=1 / 60)
    assert float(loop.camera.yaw) > 0.0


def test_turntable_sequence(tmp_path):
    scene = scenes.analytic_sphere_scene(slices=8, stacks=4)
    cam = Camera.create(aspect=1.0)
    loop = RenderLoop(scene, cam, RenderConfig(width=48, height=48))
    frames = loop.run_sequence(turntable_inputs(3), out_dir=str(tmp_path))
    assert len(frames) == 3
    import os

    assert os.path.exists(tmp_path / "frame_0002.png")
    # yaw advanced 3 × 2°
    np.testing.assert_allclose(float(loop.camera.yaw), np.radians(6.0), rtol=1e-5)


def test_render_wireframe():
    from physically_based_renderer_tpu.renderer import render_wireframe

    scene = scenes.analytic_sphere_scene(slices=12, stacks=6)
    cam = Camera.create(aspect=1.0)
    img = np.asarray(render_wireframe(scene, cam, width=96, height=96))
    dark = (img[..., :3] < 0.1).all(-1)
    grey = np.abs(img[..., :3] - 0.5).max(-1) < 1e-6
    assert dark.any() and grey.any()
    # wire pixels are a sparse subset of the sphere's area
    assert 0.005 < dark.mean() < 0.2


def test_render_ssaa_smooths_edges():
    from physically_based_renderer_tpu import render
    from physically_based_renderer_tpu.renderer import render_ssaa

    scene = scenes.analytic_sphere_scene(slices=12, stacks=6)
    cam = Camera.create(aspect=1.0)
    hard = np.asarray(render(scene, cam, width=64, height=64))
    aa = np.asarray(render_ssaa(scene, cam, width=64, height=64, factor=2))
    assert aa.shape == hard.shape
    # SSAA produces intermediate values at silhouettes that the hard image lacks
    def frac_intermediate(img):
        d = np.abs(img[..., :3] - 0.5).max(-1)
        return ((d > 0.01) & (d < 0.2)).mean()
    assert frac_intermediate(aa) > frac_intermediate(hard)
