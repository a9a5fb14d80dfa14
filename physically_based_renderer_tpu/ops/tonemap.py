"""Tonemapping / output transform — exact parity with the reference PS tail.

Reference: Reinhard x/(1+x) then gamma 1/2.2 (``Default.hlsl:152-155`` and
``Skybox.hlsl:44-47``). Kept as a separate op so HDR-space buffers stay
available for IBL/optimisation losses; differentiable everywhere (the pow is
guarded at 0).
"""

from __future__ import annotations

import jax.numpy as jnp

INV_GAMMA = 1.0 / 2.2


def reinhard(color: jnp.ndarray) -> jnp.ndarray:
    """x / (1 + x) (Default.hlsl:153)."""
    return color / (color + 1.0)


def gamma_encode(color: jnp.ndarray) -> jnp.ndarray:
    """pow(x, 1/2.2) (Default.hlsl:155) with a 0-guard for grad safety."""
    return jnp.power(jnp.maximum(color, 1e-8), INV_GAMMA)


def tonemap(color: jnp.ndarray) -> jnp.ndarray:
    """Reinhard + gamma, the reference's full output transform."""
    return gamma_encode(reinhard(jnp.maximum(color, 0.0)))


def to_uint8(color: jnp.ndarray) -> jnp.ndarray:
    """Display-encoded float [0,1] → uint8 (the RGBA8 backbuffer write)."""
    return jnp.clip(jnp.round(color * 255.0), 0, 255).astype(jnp.uint8)
