"""Equirect sky / environment lookup.

TPU-native replacement for ``Source/Shaders/Skybox.hlsl``. The reference draws
a 5000-scaled sphere mesh centered on the camera with the ``.xyww`` far-plane
trick and CULL_NONE + LESS_EQUAL depth (PSO at ``PBRApp.cpp:856-875``); the
visible result is exactly "for each background pixel, look up the equirect
env map in the view-ray direction". We compute that analytically: unproject
each pixel to a world-space ray and sample — no sky geometry, no extra
raster pass, same image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import math3d
from .texture import sample_equirect

INV_2PI = 0.1591  # the reference's literal constants (LightingUtil.hlsl:219)
INV_PI = 0.3183


def world_to_sky_uv(direction: jnp.ndarray) -> jnp.ndarray:
    """Equirect direction → uv, exact semantics of ``WorldToSkyUV``
    (LightingUtil.hlsl:216-225): atan2/asin scaled by the reference's
    truncated 1/2π, 1/π constants, v flip, u flip, +0.25 u offset.
    u may exit [0,1]; the wrap sampler handles it (as on the GPU)."""
    d = direction
    u = jnp.arctan2(d[..., 2], d[..., 0]) * INV_2PI + 0.5
    v = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) * INV_PI + 0.5
    v = 1.0 - v
    u = 1.0 - u
    u = u + 0.25
    return jnp.stack([u, v], axis=-1)


def camera_ray_directions(
    inv_view_proj: jnp.ndarray,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """World-space unit view-ray direction for every pixel center (rows, W, 3)
    covering global rows [y_offset, y_offset+rows) of a width×height viewport.

    Unprojects NDC points at z=0 and z=1 through the row-vector inverse
    view-projection (the reference carries g_InvViewProj in cbPass for this,
    Core.hlsl:42)."""
    if rows is None:
        rows = height
    py = (
        jnp.asarray(y_offset, jnp.float32)
        + jax.lax.broadcasted_iota(jnp.float32, (rows, width), 0)
        + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.float32, (rows, width), 1) + 0.5
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = 1.0 - py / height * 2.0

    def unproject(z):
        # Full-f32 matmul: TPU default (bf16) precision NaNs this path —
        # the homogeneous w at deep NDC z comes from a near-total
        # cancellation in the inverse matrix's last column, and bf16-rounded
        # operands make it land on exactly 0 (observed: every sky pixel NaN
        # on the axon TPU backend while CPU renders were fine).
        ndc = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, z)], axis=-1)
        out3 = jnp.einsum(
            "...i,ij->...j",
            ndc,
            inv_view_proj[:3, :3],
            precision=jax.lax.Precision.HIGHEST,
        ) + inv_view_proj[3, :3]
        w = jnp.einsum(
            "...i,i->...",
            ndc,
            inv_view_proj[:3, 3],
            precision=jax.lax.Precision.HIGHEST,
        ) + inv_view_proj[3, 3]
        return out3 / w[..., None]

    # z=0.5 instead of the far plane z=1: same ray, but w(z=1) is itself a
    # catastrophic cancellation (≈1e-9 of its terms' magnitude) that f32
    # resolves to noise; mid-depth w is O(1) for any reasonable near/far.
    near_pt = unproject(0.0)
    mid_pt = unproject(0.5)
    return math3d.normalize(mid_pt - near_pt)


# Above this texel count the per-frame pair_equirect roll+concat (a full 2×
# copy of the map) costs more than the two extra bilinear gathers it saves;
# large sky maps sample through the plain 4-gather path instead.
_PAIR_MAX_TEXELS = 1 << 21  # 2M texels ≈ a 2048×1024 map


def sample_sky(env: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Radiance from the equirect env map along unit directions (..., 3).

    Small maps sample through the paired-row layout (2 gathers instead of 4 —
    the pairing concat is a tiny per-frame copy, the gathers are per-pixel);
    large maps (hi-res backgrounds) skip the pairing copy and take the plain
    4-gather path, which is cheaper than duplicating the whole map in HBM
    every frame."""
    from .texture import (
        pair_equirect,
        sample_equirect,
        sample_equirect_paired,
        sample_equirect_quad_u8,
    )

    uv = world_to_sky_uv(directions)
    if env.dtype == jnp.uint32:  # quad-packed u8 LDR background: ONE gather
        return sample_equirect_quad_u8(env, uv)
    if env.shape[-1] > 4:  # already paired (baked at scene build)
        return sample_equirect_paired(env, uv)[..., :3]
    if env.shape[0] * env.shape[1] <= _PAIR_MAX_TEXELS:
        return sample_equirect_paired(pair_equirect(env), uv)[..., :3]
    return sample_equirect(env, uv)[..., :3]
