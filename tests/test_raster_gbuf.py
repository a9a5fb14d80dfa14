"""Fused raster+G-buffer backend (pallas_gbuf) vs the unfused jnp pipeline.

Covers the ADVICE round-1 gap: forward parity (analytic + textured 14-channel
attrs + row-band case) and the custom-VJP backward (material grads AND
geometry/world-matrix grads through the interpolation recompute)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, render, scenes

W, H = 128, 96


def _textured_scene():
    from test_texture_combined import _textured_scene as ts

    return ts()


def test_gbuf_forward_matches_jnp_analytic():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=W / H)
    a = render(scene, cam, width=W, height=H, raster_backend="jnp")
    b = render(scene, cam, width=W, height=H, raster_backend="pallas_gbuf_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gbuf_forward_matches_jnp_textured():
    scene = _textured_scene()
    cam = Camera.create(aspect=W / H)
    a = np.asarray(
        render(scene, cam, width=W, height=H, raster_backend="jnp",
               mip_lod=False)
    )
    b = np.asarray(
        render(scene, cam, width=W, height=H,
               raster_backend="pallas_gbuf_interpret", mip_lod=False)
    )
    diff = np.abs(a - b)
    # Plane-evaluated vs bary-interpolated UVs differ by fp32 ulps; where a
    # bilinear tap sits exactly on a texel boundary the sampled value moves
    # by one filtering step. Allow a handful of such pixels, tight elsewhere.
    assert (diff > 1e-5).mean() < 1e-3, f"{(diff > 1e-5).mean():.5%} pixels off"
    assert diff.max() < 1e-2
    assert np.median(diff) < 1e-6
    # With mips ON (the textured default) the uv ulps also shift the
    # derivative-based lod, moving a few more boundary taps a level — still
    # bounded, just looser.
    am = np.asarray(render(scene, cam, width=W, height=H, raster_backend="jnp"))
    bm = np.asarray(
        render(scene, cam, width=W, height=H,
               raster_backend="pallas_gbuf_interpret")
    )
    dm = np.abs(am - bm)
    assert (dm > 1e-5).mean() < 5e-3, f"{(dm > 1e-5).mean():.5%} pixels off"
    # isolated pixels may flip a whole mip level (lod at an integer
    # boundary) — bound the bulk, not the max
    assert np.quantile(dm, 0.999) < 1e-2


def test_gbuf_band_matches_full_frame():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=W / H)
    full = render(scene, cam, width=W, height=H, raster_backend="pallas_gbuf_interpret")
    band = render(
        scene, cam, width=W, height=H, rows=32, y_offset=48,
        raster_backend="pallas_gbuf_interpret",
    )
    np.testing.assert_allclose(np.asarray(band), np.asarray(full)[48:80], atol=1e-6)


def _grads(scene, cam, backend, wrt):
    def loss_mats(materials):
        s = dataclasses.replace(scene, materials=materials)
        img = render(s, cam, width=W, height=H, raster_backend=backend)
        return jnp.mean(img[..., :3] ** 2)

    def loss_worlds(worlds):
        d = dataclasses.replace(scene.draws[0], worlds=worlds)
        s = dataclasses.replace(scene, draws=(d,) + scene.draws[1:])
        img = render(s, cam, width=W, height=H, raster_backend=backend)
        return jnp.mean(img[..., :3] ** 2)

    if wrt == "materials":
        return jax.grad(loss_mats, allow_int=True)(scene.materials)
    return jax.grad(loss_worlds)(scene.draws[0].worlds)


def test_gbuf_material_grads_match_jnp():
    scene = scenes.analytic_sphere_scene(slices=12, stacks=6)
    cam = Camera.create(aspect=W / H)
    ga = _grads(scene, cam, "jnp", "materials")
    gb = _grads(scene, cam, "pallas_gbuf_interpret", "materials")
    np.testing.assert_allclose(
        np.asarray(ga.roughness), np.asarray(gb.roughness), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ga.diffuse), np.asarray(gb.diffuse), rtol=1e-4, atol=1e-7
    )


def test_gbuf_world_grads_match_jnp():
    """Geometry gradients flow through the fused kernel's custom VJP
    (interpolation recompute) identically to the unfused path."""
    scene = scenes.analytic_sphere_scene(slices=12, stacks=6)
    cam = Camera.create(aspect=W / H)
    ga = _grads(scene, cam, "jnp", "worlds")
    gb = _grads(scene, cam, "pallas_gbuf_interpret", "worlds")
    assert float(jnp.abs(ga).sum()) > 0
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-7)


def test_gbuf_textured_grads_match_jnp():
    scene = _textured_scene()
    cam = Camera.create(aspect=W / H)
    ga = _grads(scene, cam, "jnp", "materials")
    gb = _grads(scene, cam, "pallas_gbuf_interpret", "materials")
    np.testing.assert_allclose(
        np.asarray(ga.diffuse), np.asarray(gb.diffuse), rtol=1e-4, atol=1e-7
    )
