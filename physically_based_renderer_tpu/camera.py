"""FPS-style camera, left-handed / z-forward, mirroring the reference camera.

Reference: ``Source/App/Camera.{h,cpp}`` — fovY π/4, near 0.1, far 100,
start position (0,0,-5) (``PBRApp.cpp:652-659``); yaw/pitch mouse look with
pitch clamped to ±(π/2 − 0.1) (``Camera.cpp:89``); WASD movement at
5 units/s (``PBRApp.cpp:394-402``); projection via ``XMMatrixPerspectiveFovLH``
and view via ``XMMatrixLookToLH`` (``Camera.cpp:104-112``).

Implemented as an immutable pytree dataclass — "moving" the camera returns a
new camera, so camera parameters are differentiable inputs to the renderer
(pose optimization works with plain ``jax.grad``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from . import math3d

PITCH_LIMIT = math.pi / 2.0 - 0.1  # Camera.cpp:89
MOVE_SPEED = 5.0  # units/s, PBRApp.cpp:394
MOUSE_RADIANS_PER_PIXEL = math.radians(0.25)  # PBRApp.cpp:377-378


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jnp.ndarray  # (3,)
    yaw: jnp.ndarray  # scalar, radians; 0 → +z
    pitch: jnp.ndarray  # scalar, radians; clamped ±PITCH_LIMIT
    fov_y: float = dataclasses.field(default=math.pi / 4.0, metadata=dict(static=True))
    aspect: float = dataclasses.field(default=1200.0 / 800.0, metadata=dict(static=True))
    near: float = dataclasses.field(default=0.1, metadata=dict(static=True))
    far: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @staticmethod
    def create(
        position=(0.0, 0.0, -5.0),
        yaw=0.0,
        pitch=0.0,
        fov_y=math.pi / 4.0,
        aspect=1200.0 / 800.0,
        near=0.1,
        far=100.0,
    ) -> "Camera":
        return Camera(
            position=jnp.asarray(position, dtype=jnp.float32),
            yaw=jnp.asarray(yaw, dtype=jnp.float32),
            pitch=jnp.asarray(pitch, dtype=jnp.float32),
            fov_y=fov_y,
            aspect=aspect,
            near=near,
            far=far,
        )

    # -- basis -------------------------------------------------------------
    @property
    def forward(self) -> jnp.ndarray:
        return math3d.yaw_pitch_to_cartesian(self.yaw, self.pitch)

    @property
    def side(self) -> jnp.ndarray:
        # Horizontal strafe direction (ignores pitch), LH: side = up × forward.
        flat_fwd = math3d.yaw_pitch_to_cartesian(self.yaw, jnp.zeros_like(self.pitch))
        return math3d.normalize(jnp.cross(jnp.asarray([0.0, 1.0, 0.0]), flat_fwd))

    @property
    def world_up(self) -> jnp.ndarray:
        return jnp.asarray([0.0, 1.0, 0.0], dtype=jnp.float32)

    # -- matrices ----------------------------------------------------------
    def view_matrix(self) -> jnp.ndarray:
        return math3d.look_to_lh(self.position, self.forward, self.world_up)

    def projection_matrix(self) -> jnp.ndarray:
        return math3d.perspective_fov_lh(self.fov_y, self.aspect, self.near, self.far)

    def view_proj(self) -> jnp.ndarray:
        return self.view_matrix() @ self.projection_matrix()

    # -- input -------------------------------------------------------------
    def rotate(self, dyaw, dpitch) -> "Camera":
        new_pitch = jnp.clip(self.pitch + dpitch, -PITCH_LIMIT, PITCH_LIMIT)
        return dataclasses.replace(self, yaw=self.yaw + dyaw, pitch=new_pitch)

    def on_mouse_move(self, dx_pixels, dy_pixels) -> "Camera":
        return self.rotate(
            dx_pixels * MOUSE_RADIANS_PER_PIXEL, dy_pixels * MOUSE_RADIANS_PER_PIXEL
        )

    def move(self, forward_amt=0.0, side_amt=0.0, dt=1.0 / 60.0) -> "Camera":
        delta = (self.forward * forward_amt + self.side * side_amt) * (MOVE_SPEED * dt)
        return dataclasses.replace(self, position=self.position + delta)

    def with_aspect(self, width: int, height: int) -> "Camera":
        return dataclasses.replace(self, aspect=float(width) / float(height))
