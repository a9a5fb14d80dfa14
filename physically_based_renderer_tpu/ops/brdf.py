"""Cook-Torrance PBR BRDF + punctual-light evaluation, vectorised over pixels.

TPU-native re-derivation of the reference BRDF library
(``Source/Shaders/LightingUtil.hlsl:35-225``). All functions are pure,
elementwise over arbitrary leading pixel batch dims (they map onto the TPU
VPU and fuse into the shading kernel), and fully differentiable w.r.t. every
material / light / geometric input.

Numerical parity notes (kept deliberately identical to the HLSL):
  * GGX roughness is clamped to ≥ 0.05          (LightingUtil.hlsl:51)
  * Smith k = (r+1)²/8 "direct lighting" remap  (LightingUtil.hlsl:66-67)
  * specular denominator + 1e-3 guard           (LightingUtil.hlsl:95)
  * kD = (1-F)(1-metallic)                      (LightingUtil.hlsl:98-100)
  * point/spot hard range cutoff at d > 100     (LightingUtil.hlsl:131,154)
  * attenuation 1/max(d,0.01)²                  (LightingUtil.hlsl:35-40)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import math3d
from ..math3d import dot, normalize, saturate

PI = 3.14159265359  # literal used by the reference (LightingUtil.hlsl:59,103)
MAX_LIGHTS = 16  # LightingUtil.hlsl:7
LIGHT_RANGE = 100.0  # implicit falloff range, LightingUtil.hlsl:131
MIN_ROUGHNESS = 0.05
ATTEN_MIN_DIST = 0.01


# ---------------------------------------------------------------------------
# Light set: structure-of-arrays pytree, static type counts (like the
# NUM_DIR/POINT/SPOT_LIGHTS shader macros, Core.hlsl:2-12 — counts specialise
# the jitted kernel instead of branching per pixel).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lights:
    """Packed punctual lights. Layout order matches ComputeLighting's loop:
    directional first, then point, then spot (LightingUtil.hlsl:170-200)."""

    strength: jnp.ndarray  # (L, 3)
    direction: jnp.ndarray  # (L, 3) directional/spot
    position: jnp.ndarray  # (L, 3) point/spot
    spot_power: jnp.ndarray  # (L,)
    num_dir: int = dataclasses.field(default=0, metadata=dict(static=True))
    num_point: int = dataclasses.field(default=0, metadata=dict(static=True))
    num_spot: int = dataclasses.field(default=0, metadata=dict(static=True))

    @staticmethod
    def build(directional=(), point=(), spot=()) -> "Lights":
        """directional: [(direction, strength)], point: [(position, strength)],
        spot: [(position, direction, strength, spot_power)]."""
        strengths, directions, positions, powers = [], [], [], []
        for d, s in directional:
            directions.append(d), strengths.append(s)
            positions.append((0.0, 0.0, 0.0)), powers.append(0.0)
        for p, s in point:
            positions.append(p), strengths.append(s)
            directions.append((0.0, 0.0, 1.0)), powers.append(0.0)
        for p, d, s, pw in spot:
            positions.append(p), directions.append(d)
            strengths.append(s), powers.append(pw)
        n = max(len(strengths), 1)
        return Lights(
            strength=jnp.asarray(strengths, jnp.float32).reshape(n if strengths else 1, 3)
            if strengths
            else jnp.zeros((1, 3), jnp.float32),
            direction=jnp.asarray(directions, jnp.float32)
            if directions
            else jnp.zeros((1, 3), jnp.float32),
            position=jnp.asarray(positions, jnp.float32)
            if positions
            else jnp.zeros((1, 3), jnp.float32),
            spot_power=jnp.asarray(powers, jnp.float32)
            if powers
            else jnp.zeros((1,), jnp.float32),
            num_dir=len(directional),
            num_point=len(point),
            num_spot=len(spot),
        )

    @staticmethod
    def default_scene_lights() -> "Lights":
        """The four hardcoded directional lights + nothing else
        (PBRApp.cpp:480-487)."""
        s = (0.25, 0.25, 0.25)
        c = 0.57735
        return Lights.build(
            directional=[
                ((c, c, c), s),
                ((c, -c, c), s),
                ((-c, c, c), s),
                ((-c, -c, c), s),
            ]
        )


# ---------------------------------------------------------------------------
# Material sample: per-pixel shading inputs (the HLSL ``Material`` struct,
# LightingUtil.hlsl:19-33). Each field is (..., C) over pixel batch dims.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialSample:
    diffuse_albedo: jnp.ndarray  # (..., 3)
    metallic: jnp.ndarray  # (...,)
    fresnel_r0: jnp.ndarray  # (..., 3)
    roughness: jnp.ndarray  # (...,)


# ---------------------------------------------------------------------------
# BRDF terms
# ---------------------------------------------------------------------------


def calc_attenuation(d: jnp.ndarray) -> jnp.ndarray:
    """Quadratic falloff, 1/max(d,0.01)² (LightingUtil.hlsl:35-40)."""
    d_sat = jnp.maximum(d, ATTEN_MIN_DIST)
    return 1.0 / (d_sat * d_sat)


def fresnel_schlick(h: jnp.ndarray, v: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    """F0 + (1-F0)(1-saturate(H·V))^5 (LightingUtil.hlsl:43-47)."""
    cos_theta = saturate(dot(h, v, keepdims=True))
    return f0 + (1.0 - f0) * jnp.power(1.0 - cos_theta, 5.0)


def distribution_ggx(n: jnp.ndarray, h: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """GGX/Trowbridge-Reitz NDF with the reference's r≥0.05 clamp
    (LightingUtil.hlsl:49-62)."""
    r = jnp.maximum(roughness, MIN_ROUGHNESS)
    a = r * r
    a2 = a * a
    ndoth = jnp.maximum(dot(n, h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(ndotv: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Schlick-GGX with k=(r+1)²/8 (LightingUtil.hlsl:64-73)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness) -> jnp.ndarray:
    """Smith height-correlated-ish product form (LightingUtil.hlsl:75-83)."""
    ndotv = jnp.maximum(dot(n, v), 0.0)
    ndotl = jnp.maximum(dot(n, l), 0.0)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(ndotl, roughness)


def brdf_cook_torrance(
    mat: MaterialSample,
    radiance: jnp.ndarray,
    n: jnp.ndarray,
    v: jnp.ndarray,
    l: jnp.ndarray,
    h: jnp.ndarray,
) -> jnp.ndarray:
    """(kD·albedo/π + DGF/(4 NdotV NdotL + 1e-3)) · radiance · NdotL
    (LightingUtil.hlsl:85-104)."""
    ndf = distribution_ggx(n, h, mat.roughness)
    g = geometry_smith(n, v, l, mat.roughness)
    f = fresnel_schlick(h, v, mat.fresnel_r0)

    denom = 4.0 * jnp.maximum(dot(n, v), 0.0) * jnp.maximum(dot(n, l), 0.0) + 1e-3
    specular = (ndf * g)[..., None] * f / denom[..., None]

    kd = (1.0 - f) * (1.0 - mat.metallic)[..., None]
    ndotl = jnp.maximum(dot(n, l), 0.0)
    return (kd * mat.diffuse_albedo / PI + specular) * radiance * ndotl[..., None]


# ---------------------------------------------------------------------------
# Per-light-type evaluators
# ---------------------------------------------------------------------------


def compute_directional_light(strength, direction, mat, n, v) -> jnp.ndarray:
    """LightingUtil.hlsl:109-119."""
    l = -direction
    l = jnp.broadcast_to(l, v.shape)
    h = normalize(v + l)
    return brdf_cook_torrance(mat, strength, n, v, l, h)


def compute_point_light(strength, position, mat, pos, n, v) -> jnp.ndarray:
    """LightingUtil.hlsl:124-142 (hard 100-unit range cutoff)."""
    to_light = position - pos
    d = math3d.length(to_light)
    in_range = (d <= LIGHT_RANGE).astype(pos.dtype)
    l = to_light / jnp.maximum(d, 1e-20)[..., None]
    h = normalize(v + l)
    radiance = strength * calc_attenuation(d)[..., None]
    return in_range[..., None] * brdf_cook_torrance(mat, radiance, n, v, l, h)


def compute_spot_light(strength, position, direction, spot_power, mat, pos, n, v):
    """LightingUtil.hlsl:147-167."""
    to_light = position - pos
    d = math3d.length(to_light)
    in_range = (d <= LIGHT_RANGE).astype(pos.dtype)
    l = to_light / jnp.maximum(d, 1e-20)[..., None]
    h = normalize(v + l)
    atten = calc_attenuation(d)
    atten = atten * jnp.power(jnp.maximum(dot(-l, direction), 0.0), spot_power)
    radiance = strength * atten[..., None]
    return in_range[..., None] * brdf_cook_torrance(mat, radiance, n, v, l, h)


def compute_lighting(
    lights: Lights,
    mat: MaterialSample,
    pos: jnp.ndarray,
    n: jnp.ndarray,
    v: jnp.ndarray,
    shadow_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Sum over the static light list (LightingUtil.hlsl:170-200). The Python
    loop unrolls at trace time into a fixed fused expression — the XLA-native
    analog of the NUM_*_LIGHTS macro specialisation."""
    result = jnp.zeros_like(mat.diffuse_albedo)
    i = 0
    for _ in range(lights.num_dir):
        result = result + shadow_factor * compute_directional_light(
            lights.strength[i], lights.direction[i], mat, n, v
        )
        i += 1
    for _ in range(lights.num_point):
        result = result + compute_point_light(
            lights.strength[i], lights.position[i], mat, pos, n, v
        )
        i += 1
    for _ in range(lights.num_spot):
        result = result + compute_spot_light(
            lights.strength[i],
            lights.position[i],
            lights.direction[i],
            lights.spot_power[i],
            mat,
            pos,
            n,
            v,
        )
        i += 1
    return result


def normal_sample_to_world_space(normal_map_sample, n, t, b) -> jnp.ndarray:
    """Tangent→world normal mapping; NOT renormalised, matching the reference
    (LightingUtil.hlsl:203-214)."""
    nt = 2.0 * normal_map_sample - 1.0
    return nt[..., 0:1] * t + nt[..., 1:2] * b + nt[..., 2:3] * n
