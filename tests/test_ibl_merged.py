"""Textured + IBL through the merged spec/sky gather (round-5 ask #3).

The reference's own ``Samples/rusted_iron_pbr.png`` content: a textured
sphere against an sIBL environment. The G-buffer path can now defer the
prefiltered-specular fetch into the SAME one merged row gather the
fused-IBL kernel uses (``render(ibl_merged=True)``); these tests pin that
path against the reference ``ambient_ibl`` formulation.
"""

import os

import numpy as np
import pytest

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.renderer import render

W, H = 160, 96
ASSETS = "/root/reference/Assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets absent"
)


def _scene():
    assets = scenes.AssetCache(texture_size=64)
    return scenes.rustediron_sphere_scene(
        assets=assets, environment="chelsea_stairs"
    ).with_ibl()


def _cam():
    return Camera.create(position=(0.0, 0.0, -3.0), aspect=W / H)


def test_merged_ibl_matches_ambient_ibl():
    scene, cam = _scene(), _cam()
    ref = render(
        scene, cam, width=W, height=H,
        raster_backend="pallas_gbuf_interpret", ibl_merged=False,
    )
    got = render(
        scene, cam, width=W, height=H,
        raster_backend="pallas_gbuf_interpret", ibl_merged=True,
    )
    # Same f16 specular stack, same SH9 irradiance, same env-BRDF approx —
    # only the gather route differs.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3)


def test_merged_ibl_jnp_backend_unaffected():
    """The jnp oracle path never takes the merged route (golden stability)."""
    scene, cam = _scene(), _cam()
    a = render(scene, cam, width=W, height=H, raster_backend="jnp")
    b = render(
        scene, cam, width=W, height=H, raster_backend="jnp", ibl_merged=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merged_ibl_has_gradients():
    """Texture texel + material gradients flow through the merged path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    scene, cam = _scene(), _cam()

    def loss(mats):
        s = dataclasses.replace(scene, materials=mats)
        img = render(
            s, cam, width=W, height=H,
            raster_backend="pallas_gbuf_interpret", ibl_merged=True,
        )
        return jnp.mean(img[..., :3] ** 2)

    g = jax.grad(loss, allow_int=True)(scene.materials)
    tot = float(jnp.abs(g.roughness).sum() + jnp.abs(g.diffuse).sum())
    assert np.isfinite(tot) and tot > 0.0
