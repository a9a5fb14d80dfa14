"""Quad-packed u8 sky background: texel selection parity with the f32
equirect sampler (ops/texture.sample_equirect, wrap semantics of the
reference's g_SamLinearWrap sky sampler, Core.hlsl:22)."""

import jax.numpy as jnp
import numpy as np

from physically_based_renderer_tpu.ops.texture import (
    quad_pack_equirect_u8,
    sample_equirect,
    sample_equirect_quad_u8,
)


def _u8_grid(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.float32) / 255.0


def test_quad_u8_matches_f32_sampler():
    env = jnp.asarray(_u8_grid(16, 32))
    words = quad_pack_equirect_u8(env)
    assert words.shape == (16, 32, 4) and words.dtype == jnp.uint32

    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform(-0.5, 1.5, size=(257, 2)).astype(np.float32))
    a = np.asarray(sample_equirect(env, uv, wrap_v=True))
    b = np.asarray(sample_equirect_quad_u8(words, uv))
    # source data is u8-quantized, so the packed path is bit-exact up to
    # float accumulation order
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_quad_u8_roundtrip_exact_at_texel_centers():
    env = jnp.asarray(_u8_grid(8, 16, seed=2))
    words = quad_pack_equirect_u8(env)
    ys, xs = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 16.0, (ys + 0.5) / 8.0], axis=-1).astype(np.float32)
    )
    out = np.asarray(sample_equirect_quad_u8(words, uv))
    np.testing.assert_allclose(out, np.asarray(env), atol=1e-6)


def test_render_with_quad_packed_sky():
    """render() composes the packed sky for background pixels."""
    import dataclasses

    from physically_based_renderer_tpu import Camera, scenes
    from physically_based_renderer_tpu.renderer import render

    scene = scenes.analytic_sphere_scene((0.8, 0.2, 0.2), 0.4, 0.1, slices=12, stacks=6)
    env = jnp.asarray(_u8_grid(16, 32, seed=3))
    cam = Camera.create(aspect=1.0)

    ref = render(
        dataclasses.replace(scene, sky_map=env), cam, width=64, height=64
    )
    packed = render(
        dataclasses.replace(scene, sky_map=quad_pack_equirect_u8(env)),
        cam,
        width=64,
        height=64,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(packed), atol=1e-5)
