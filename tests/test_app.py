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
