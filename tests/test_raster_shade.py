"""Fused raster+shade Pallas kernel (interpret mode) vs the jnp pipeline.

The ``pallas_shade`` backend collapses raster → interpolate → material fetch
→ Cook-Torrance → tonemap into one kernel (the reference's raster→PS
structure, ``Default.hlsl:47-161``, with no intermediate buffer). These tests
pin it against the unfused jnp path — same image, same gradients — including
the depth resolve, the in-kernel one-hot material fetch, every punctual
light type, band rendering, and the custom-VJP recompute backward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.models.scene import InstancedDraw, Scene
from physically_based_renderer_tpu.models.material import MaterialBuilder
from physically_based_renderer_tpu.models.mesh import sphere_mesh
from physically_based_renderer_tpu.ops.brdf import Lights
from physically_based_renderer_tpu.renderer import render

W, H = 128, 64


def _grid_scene():
    return scenes.red_sphere_grid_scene(slices=8, stacks=4)


def _cam():
    return Camera.create(position=(0.0, -3.0, -18.0), aspect=W / H)


def test_fused_shade_matches_jnp_forward():
    scene, cam = _grid_scene(), _cam()
    img_j = render(scene, cam, width=W, height=H, raster_backend="jnp")
    img_p = render(
        scene, cam, width=W, height=H, raster_backend="pallas_shade_interpret"
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=2e-4)


def test_fused_shade_matches_jnp_no_tonemap():
    scene, cam = _grid_scene(), _cam()
    img_j = render(
        scene, cam, width=W, height=H, raster_backend="jnp", apply_tonemap=False
    )
    img_p = render(
        scene,
        cam,
        width=W,
        height=H,
        raster_backend="pallas_shade_interpret",
        apply_tonemap=False,
    )
    # HDR-space values (specular peaks ≫ 1): f32 association-order noise of
    # the plane-evaluated interpolation is a touch larger than post-tonemap,
    # and isolated grazing-silhouette pixels (1/w → 0) amplify it further.
    a, b = np.asarray(img_p), np.asarray(img_j)
    np.testing.assert_allclose(a, b, atol=1e-2)
    assert (np.abs(a - b) > 1e-3).mean() < 1e-3  # <0.1% of values past 1e-3


def test_fused_shade_material_gradients_match():
    scene, cam = _grid_scene(), _cam()

    def loss(mats, backend):
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(
            render(s, cam, width=W, height=H, raster_backend=backend)[..., :3] ** 2
        )

    gj = jax.grad(lambda m: loss(m, "jnp"), allow_int=True)(scene.materials)
    gp = jax.grad(lambda m: loss(m, "pallas_shade_interpret"), allow_int=True)(
        scene.materials
    )
    for f in ("diffuse", "roughness", "metallic", "fresnel_r0"):
        a, b = np.asarray(getattr(gj, f)), np.asarray(getattr(gp, f))
        scale = max(np.abs(a).max(), 1e-12)
        # 5e-5·scale absolute floor: the fused backward kernel re-linearizes
        # shade_core in-kernel (different but equivalent op order than the
        # XLA pullback), which moves near-zero gradient elements by a few
        # 1e-9 — far below any optimization-relevant signal.
        np.testing.assert_allclose(b, a, atol=5e-5 * scale + 1e-10, rtol=2e-3)


def test_fused_shade_light_and_geometry_gradients():
    scene, cam = _grid_scene(), _cam()

    def loss_lights(strength):
        l = dataclasses.replace(scene.lights, strength=strength)
        s = dataclasses.replace(scene, lights=l)
        return jnp.mean(
            render(s, cam, width=W, height=H,
                   raster_backend="pallas_shade_interpret")[..., :3] ** 2
        )

    g = jax.grad(loss_lights)(scene.lights.strength)
    gj = jax.grad(
        lambda st: jnp.mean(
            render(
                dataclasses.replace(
                    scene, lights=dataclasses.replace(scene.lights, strength=st)
                ),
                cam, width=W, height=H, raster_backend="jnp",
            )[..., :3] ** 2
        )
    )(scene.lights.strength)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj), rtol=1e-3, atol=1e-9)

    # world-matrix (vertex) gradients flow through the interpolation recompute
    def loss_world(worlds):
        d = dataclasses.replace(scene.draws[0], worlds=worlds)
        s = dataclasses.replace(scene, draws=(d,))
        return jnp.mean(
            render(s, cam, width=W, height=H,
                   raster_backend="pallas_shade_interpret")[..., :3] ** 2
        )

    gw = jax.grad(loss_world)(scene.draws[0].worlds)
    assert np.isfinite(np.asarray(gw)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_fused_shade_point_and_spot_lights():
    mb = MaterialBuilder()
    mb.add("m", diffuse=(0.8, 0.3, 0.2), roughness=0.4, metallic=0.3)
    lights = Lights.build(
        directional=[((0.577, 0.577, 0.577), (0.3, 0.25, 0.2))],
        point=[((1.5, 1.0, -2.0), (2.0, 1.5, 1.0))],
        spot=[((0.0, 2.0, -2.0), (0.0, -0.7, 0.7), (3.0, 3.0, 3.0), 8.0)],
    )
    scene = Scene(
        draws=(InstancedDraw.create(sphere_mesh(1.0, 12, 6), np.eye(4, dtype=np.float32), [0]),),
        materials=mb.build(),
        atlas=None,
        lights=lights,
        ambient=jnp.asarray([0.03, 0.03, 0.03]),
    )
    cam = Camera.create(aspect=1.0)
    img_j = render(scene, cam, width=64, height=64, raster_backend="jnp")
    img_p = render(
        scene, cam, width=64, height=64, raster_backend="pallas_shade_interpret"
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=2e-4)


def test_fused_shade_band_rendering():
    """rows/y_offset band API matches the full-frame render (screen-tile
    sharding contract)."""
    scene, cam = _grid_scene(), _cam()
    full = render(scene, cam, width=W, height=H, raster_backend="pallas_shade_interpret")
    band = render(
        scene, cam, width=W, height=H, rows=32, y_offset=16,
        raster_backend="pallas_shade_interpret",
    )
    np.testing.assert_allclose(np.asarray(band), np.asarray(full)[16:48], atol=1e-6)


def test_auto_backend_still_cpu_jnp():
    """auto on CPU keeps the jnp path (pallas compiled kernels are TPU-only)."""
    scene, cam = _grid_scene(), _cam()
    img = render(scene, cam, width=W, height=H)  # auto
    img_j = render(scene, cam, width=W, height=H, raster_backend="jnp")
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_j), atol=0)
