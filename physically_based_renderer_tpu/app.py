"""Frame-loop harness — the TPU-native analog of the reference app runtime.

Replaces ``D3DApp::Run``'s Win32 message pump + swap chain
(``d3dApp.cpp:72-124``) with a headless frame loop: per-frame camera input
(WASD/mouse semantics of ``PBRApp::OnKeyboardInput`` / ``OnMouseMove``,
``PBRApp.cpp:376-402``), a jitted render step, fps/mspf stats
(``CalculateFrameStats``, ``d3dApp.cpp:598-628``) and PNG "present".
Useful for turntable/animation sequences and for driving benchmarks.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterable

import numpy as np

from .camera import Camera
from .models.scene import Scene
from .renderer import render
from .utils.config import RenderConfig
from .utils.image_io import save_png


@dataclasses.dataclass
class FrameInput:
    """One frame's input events (the message-pump payload)."""

    forward: float = 0.0  # W/S axis in [-1, 1]
    side: float = 0.0  # A/D axis in [-1, 1]
    mouse_dx: float = 0.0  # pixels
    mouse_dy: float = 0.0


@dataclasses.dataclass
class FrameStats:
    """Rolling fps / ms-per-frame, recomputed once per second
    (CalculateFrameStats semantics)."""

    frames: int = 0
    window_start: float = dataclasses.field(default_factory=time.perf_counter)
    fps: float = 0.0
    mspf: float = 0.0

    def tick(self) -> bool:
        self.frames += 1
        now = time.perf_counter()
        elapsed = now - self.window_start
        if elapsed >= 1.0:
            self.fps = self.frames / elapsed
            self.mspf = 1000.0 * elapsed / self.frames
            self.frames = 0
            self.window_start = now
            return True
        return False


class RenderLoop:
    """Headless run loop: feed inputs, get frames.

    ``fps_lock`` mirrors the reference's F3 toggle (60 / 120 / None for
    uncapped, ``d3dApp.cpp:104-114``)."""

    def __init__(
        self,
        scene: Scene,
        camera: Camera,
        config: RenderConfig | None = None,
        fps_lock: float | None = None,
        check_capacity: bool = True,
    ):
        self.scene = scene
        self.camera = camera
        self.config = config or RenderConfig()
        self.fps_lock = fps_lock
        self.stats = FrameStats()
        self._last_time = time.perf_counter()
        self._capacity_checked = not check_capacity

    def step(self, inp: FrameInput | None = None, dt: float | None = None) -> np.ndarray:
        """Advance one frame: apply input to the camera, render, return the
        frame as a numpy (H, W, 4) array."""
        now = time.perf_counter()
        if dt is None:
            dt = now - self._last_time
        self._last_time = now

        if inp is not None:
            cam = self.camera
            if inp.mouse_dx or inp.mouse_dy:
                cam = cam.on_mouse_move(inp.mouse_dx, inp.mouse_dy)
            if inp.forward or inp.side:
                cam = cam.move(inp.forward, inp.side, dt=dt)
            self.camera = cam

        if not self._capacity_checked:
            # Loud overflow guard (works where in-jit debug callbacks don't,
            # i.e. the axon TPU tunnel): size the binning pair capacity from
            # the first frame's real pair count, with headroom.
            from .renderer import check_raster_capacity

            stats = check_raster_capacity(
                self.scene,
                self.camera,
                width=self.config.width,
                height=self.config.height,
                tile_h=self.config.tile_h,
                tile_w=self.config.tile_w,
                pairs_cap=self.config.raster_pairs_cap,
            )
            if stats["overflowed"]:
                import logging

                logging.getLogger("pbr_tpu").warning(
                    "raster binning overflow: %d pairs > cap %d; raising "
                    "raster_pairs_cap to %d",
                    stats["num_pairs"],
                    stats["pairs_cap"],
                    stats["suggested_pairs_cap"],
                )
                self.config = dataclasses.replace(
                    self.config, raster_pairs_cap=stats["suggested_pairs_cap"]
                )
            self._capacity_checked = True

        img = render(self.scene, self.camera, **self.config.render_kwargs())
        frame = np.asarray(img)
        self.stats.tick()

        if self.fps_lock:
            budget = 1.0 / self.fps_lock
            spent = time.perf_counter() - now
            if spent < budget:
                time.sleep(budget - spent)
        return frame

    def run_sequence(
        self,
        inputs: Iterable[FrameInput],
        out_dir: str | None = None,
        on_frame: Callable[[int, np.ndarray], None] | None = None,
        dt: float = 1.0 / 60.0,
    ) -> list[np.ndarray]:
        """Render a scripted input sequence; optionally write frame PNGs."""
        frames = []
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        for i, inp in enumerate(inputs):
            frame = self.step(inp, dt=dt)
            frames.append(frame)
            if out_dir:
                save_png(os.path.join(out_dir, f"frame_{i:04d}.png"), frame)
            if on_frame:
                on_frame(i, frame)
        return frames


def turntable_inputs(num_frames: int, degrees_per_frame: float = 2.0) -> list[FrameInput]:
    """Mouse-drag sequence that orbits the camera yaw (0.25°/px sensitivity,
    PBRApp.cpp:377-378)."""
    px_per_frame = degrees_per_frame / 0.25
    return [FrameInput(mouse_dx=px_per_frame) for _ in range(num_frames)]
