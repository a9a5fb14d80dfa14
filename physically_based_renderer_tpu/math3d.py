"""Pure-JAX 3D math with the reference's left-handed, row-vector conventions.

TPU-native replacement for the reference's DirectXMath shim
(``Source/App/MathUtil.h:18-383`` and ``Source/3rdParty/FrankLuna/MathHelper.h``).
Everything is a plain ``jnp`` array so the whole layer is differentiable and
traceable; matrices follow the HLSL row-vector convention used throughout the
reference shaders (``mul(float4(pos,1), M)`` — ``Default.hlsl:27,38``), i.e.
points transform as ``v @ M`` and compose left-to-right: ``v @ (world @ view_proj)``.

Left-handed, z-forward: +x right, +y up, +z into the screen, matching
``XMMatrixPerspectiveFovLH`` / ``XMMatrixLookToLH`` (``MathUtil.h:224-236``).
NDC depth is in [0, 1] (DirectX convention), y-up in clip space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Vectors
# ---------------------------------------------------------------------------

def normalize(v: Array, axis: int = -1, eps: float = 1e-20) -> Array:
    """Safe normalize along ``axis`` (returns ~0 for the zero vector)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps))


def dot(a: Array, b: Array, axis: int = -1, keepdims: bool = False) -> Array:
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def length(v: Array, axis: int = -1, keepdims: bool = False) -> Array:
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=keepdims), 1e-20))


def lerp(a: Array, b: Array, t: Array) -> Array:
    return a + (b - a) * t


def saturate(x: Array) -> Array:
    return jnp.clip(x, 0.0, 1.0)


def yaw_pitch_to_cartesian(yaw: Array, pitch: Array) -> Array:
    """Forward direction from yaw/pitch; mirrors ``MathUtil.h:349-364``.

    yaw=0, pitch=0 → +z (forward in the LH convention); yaw rotates toward +x.
    """
    cp = jnp.cos(pitch)
    return jnp.stack([cp * jnp.sin(yaw), jnp.sin(pitch), cp * jnp.cos(yaw)], axis=-1)


def spherical_to_cartesian(radius: Array, theta: Array, phi: Array) -> Array:
    """Mirrors ``MathUtil.h:375-383`` / sphere-mesh parametrisation:
    x = r sinφ cosθ, y = r cosφ, z = r sinφ sinθ."""
    sp = jnp.sin(phi)
    return jnp.stack(
        [radius * sp * jnp.cos(theta), radius * jnp.cos(phi), radius * sp * jnp.sin(theta)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# 4x4 matrices (row-vector convention: v_row @ M)
# ---------------------------------------------------------------------------

def identity4() -> Array:
    return jnp.eye(4, dtype=jnp.float32)


def translation(x, y, z) -> Array:
    """Row-vector translation: last ROW carries the offset (``MathUtil.h`` SetupTranslation)."""
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[3, 0].set(x).at[3, 1].set(y).at[3, 2].set(z)


def scaling(x, y, z) -> Array:
    return jnp.diag(jnp.asarray([x, y, z, 1.0], dtype=jnp.float32))


def rotation_y(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )


def rotation_x(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray(
        [[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )


def rotation_z(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray(
        [[c, s, 0, 0], [-s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )


def perspective_fov_lh(fov_y, aspect, near, far) -> Array:
    """Row-vector LH perspective, NDC z in [0,1]; matches
    ``XMMatrixPerspectiveFovLH`` used at ``Camera.cpp:104-107``."""
    h = 1.0 / jnp.tan(fov_y * 0.5)
    w = h / aspect
    zr = far / (far - near)
    return jnp.asarray(
        [
            [w, 0.0, 0.0, 0.0],
            [0.0, h, 0.0, 0.0],
            [0.0, 0.0, zr, 1.0],
            [0.0, 0.0, -near * zr, 0.0],
        ],
        dtype=jnp.float32,
    )


def look_to_lh(eye: Array, forward: Array, up: Array) -> Array:
    """Row-vector LH view matrix; matches ``XMMatrixLookToLH``
    (``Camera.cpp:109-112``)."""
    f = normalize(forward)
    s = normalize(jnp.cross(up, f))  # side = up × forward (LH)
    u = jnp.cross(f, s)
    rot = jnp.stack([s, u, f], axis=-1)  # columns are s,u,f
    top = jnp.concatenate([rot, jnp.zeros((3, 1), dtype=rot.dtype)], axis=1)
    last = jnp.concatenate(
        [jnp.stack([-dot(s, eye), -dot(u, eye), -dot(f, eye)]), jnp.ones((1,), rot.dtype)]
    )
    return jnp.concatenate([top, last[None, :]], axis=0)


def look_at_lh(eye: Array, target: Array, up: Array) -> Array:
    return look_to_lh(eye, target - eye, up)


def transform_points(points: Array, m: Array) -> Array:
    """[..., 3] points through a 4x4 row-vector matrix (w=1), no divide."""
    return points @ m[:3, :3] + m[3, :3]


def transform_points_h(points: Array, m: Array) -> Array:
    """[..., 3] → homogeneous [..., 4] through a 4x4 row-vector matrix."""
    out3 = points @ m[:3, :3] + m[3, :3]
    w = points @ m[:3, 3] + m[3, 3]
    return jnp.concatenate([out3, w[..., None]], axis=-1)


def transform_vectors(vectors: Array, m: Array) -> Array:
    """Directions through the upper-left 3x3 (``mul(n, (float3x3)g_World)``,
    ``Default.hlsl:31``). NOTE: like the reference, no inverse-transpose —
    only correct under uniform scale/rotation, kept for parity."""
    return vectors @ m[:3, :3]


def inverse(m: Array) -> Array:
    return jnp.linalg.inv(m)
