"""Screen-space mip LOD: derivative-based level selection + stacked-pyramid
trilinear sampling (the anti-aliasing the reference's 1-mip texture loads
cannot do — ``WICTextureLoader.h:78``)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera
from physically_based_renderer_tpu.models.material import MaterialBuilder
from physically_based_renderer_tpu.models.mesh import sphere_mesh
from physically_based_renderer_tpu.models.scene import InstancedDraw, Scene
from physically_based_renderer_tpu.ops.brdf import Lights
from physically_based_renderer_tpu.ops.texture import (
    build_atlas,
    sample_atlas,
    sample_bilinear,
    sample_stacked_trilinear,
    screen_space_lod,
    stack_mips,
)
from physically_based_renderer_tpu.renderer import render


def test_screen_space_lod_matches_uniform_gradient():
    # uv advancing by d per pixel in x → footprint d·S texels → lod log2(d·S)
    h, w, s = 16, 32, 256
    for d, expect in ((4.0 / s, 2.0), (8.0 / s, 3.0)):
        u = jnp.arange(w, dtype=jnp.float32)[None, :] * d
        v = jnp.zeros((h, w), jnp.float32)
        uv = jnp.stack([jnp.broadcast_to(u, (h, w)), v], axis=-1)
        lod = np.asarray(screen_space_lod(uv, s))
        np.testing.assert_allclose(lod[:, :-1], expect, atol=1e-4)


def test_stacked_trilinear_matches_per_level_bilinear(rng):
    pages = [rng.uniform(0, 1, (64, 64, 4)).astype(np.float32) for _ in range(3)]
    atlas = build_atlas(pages, [False] * 3, size=64)
    flat = stack_mips(atlas.mips)
    n, s, nl = atlas.num_pages, atlas.size, atlas.num_levels

    uv = jnp.asarray(rng.uniform(-0.2, 1.2, (97, 2)), jnp.float32)
    page = jnp.asarray(rng.integers(0, 3, 97))
    for lod_val in (0.0, 1.0, 2.5, 1.3, float(nl + 3)):
        lod = jnp.full((97,), lod_val)
        got = np.asarray(
            sample_stacked_trilinear(flat, n, s, nl, page, uv, lod)
        )
        lc = min(max(lod_val, 0.0), nl - 1.0)
        l0, l1 = int(np.floor(lc)), min(int(np.floor(lc)) + 1, nl - 1)
        frac = lc - np.floor(lc)
        want = (1 - frac) * np.asarray(
            sample_bilinear(atlas.mips[l0], page, uv)
        ) + frac * np.asarray(sample_bilinear(atlas.mips[l1], page, uv))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_atlas_lod_path(rng):
    pages = [rng.uniform(0, 1, (32, 32, 4)).astype(np.float32)]
    atlas = build_atlas(pages, [False], size=32)
    uv = jnp.asarray(rng.uniform(0, 1, (50, 2)), jnp.float32)
    page = jnp.zeros((50,), jnp.int32)
    # lod=0 must equal the bilinear mip-0 path exactly
    a = np.asarray(sample_atlas(atlas, page, uv, lod=jnp.zeros((50,))))
    b = np.asarray(sample_atlas(atlas, page, uv))
    np.testing.assert_allclose(a, b, atol=1e-6)


def _checker_scene(mip_lod_unused=None):
    s = 128
    yy, xx = np.mgrid[0:s, 0:s]
    checker = (((xx // 2) + (yy // 2)) % 2).astype(np.float32)
    tex = np.stack([checker] * 3, axis=-1)
    atlas = build_atlas([tex], [False], size=s)
    mb = MaterialBuilder()
    mb.add("m", textures={"diffuse": 0}, roughness=1.0)
    return Scene(
        draws=(InstancedDraw.create(sphere_mesh(1.0, 24, 12), np.eye(4, dtype=np.float32), [0]),),
        materials=mb.build(),
        atlas=atlas,
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray([0.5, 0.5, 0.5]),
    )


def test_mip_lod_reduces_minification_aliasing():
    """A 2px checkerboard on a far sphere: mip-0 sampling aliases (high
    pixel-to-pixel variance), derivative LOD integrates toward the mean."""
    scene = _checker_scene()
    cam = Camera.create(position=(0.0, 0.0, -6.0), aspect=1.0)
    # mip_lod=False = the reference's 1-mip parity mode (the default is now
    # mips ON for textured scenes)
    img0 = np.asarray(
        render(scene, cam, width=96, height=96, mip_lod=False)
    )[..., 0]
    img1 = np.asarray(
        render(scene, cam, width=96, height=96, mip_lod=True)
    )[..., 0]
    # interior pixels of the sphere
    alpha = np.asarray(render(scene, cam, width=96, height=96))[..., 3]
    inner = alpha > 0.999

    def roughness_metric(im):
        dx = np.abs(np.diff(im, axis=1))[:, :-1]
        m = inner[:, :-2] & inner[:, 1:-1] & inner[:, 2:]
        return float(dx[m].mean())

    r0, r1 = roughness_metric(img0), roughness_metric(img1)
    assert r1 < 0.5 * r0, (r0, r1)  # ≥2× smoother with mips


def test_mip_lod_combined_pages():
    scene = _checker_scene().with_combined_textures()
    assert scene.combined_atlas.num_levels > 1
    cam = Camera.create(position=(0.0, 0.0, -6.0), aspect=1.0)
    img_sep = np.asarray(
        render(dataclasses.replace(scene, combined_atlas=None), cam,
               width=64, height=64, mip_lod=True)
    )
    img_comb = np.asarray(render(scene, cam, width=64, height=64, mip_lod=True))
    np.testing.assert_allclose(img_comb, img_sep, atol=3e-2)
