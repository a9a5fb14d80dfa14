"""Combined-atlas texture path must be bit-equivalent to per-slot sampling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, render, scenes
from physically_based_renderer_tpu.ops.texture_combined import build_combined

W, H = 128, 96


def _textured_scene():
    # Synthetic atlas so the test runs without the reference assets.
    rng = np.random.default_rng(0)
    from physically_based_renderer_tpu import InstancedDraw, MaterialBuilder, Scene, sphere_mesh
    from physically_based_renderer_tpu.ops.brdf import Lights
    from physically_based_renderer_tpu.ops.texture import build_atlas

    pages = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32) for _ in range(4)]
    atlas = build_atlas(pages, [True, False, False, False], size=32)
    mb = MaterialBuilder()
    mb.add(
        "tex",
        textures={"diffuse": 0, "metallic": 1, "roughness": 2, "normal": 3},
    )
    mb.add("plain", diffuse=(0.2, 0.9, 0.1), roughness=0.3)
    mesh = sphere_mesh(1.0, 16, 8)
    from physically_based_renderer_tpu.models.scene import translation_world

    return Scene(
        draws=(
            InstancedDraw.create(
                mesh,
                np.stack([translation_world(-1.2, 0, 0), translation_world(1.2, 0, 0)]),
                [0, 1],
            ),
        ),
        materials=mb.build(),
        atlas=atlas,
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray([0.03, 0.03, 0.03]),
    )


def test_combined_matches_separate():
    scene = _textured_scene()
    cam = Camera.create(aspect=W / H)
    a = render(scene, cam, width=W, height=H)
    b = render(scene.with_combined_textures(), cam, width=W, height=H)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_combined_pages_only_for_textured():
    scene = _textured_scene()
    combined = build_combined(scene.materials, scene.atlas)
    assert combined.pages.shape[0] == 1  # one textured material
    assert int(combined.material_page[0]) == 0
    assert int(combined.material_page[1]) == 0  # analytic shares page 0 (masked)


def test_combined_texel_gradients():
    scene = _textured_scene().with_combined_textures()
    cam = Camera.create(aspect=W / H)

    def loss(pages):
        c = dataclasses.replace(scene.combined_atlas, pages=pages)
        s = dataclasses.replace(scene, combined_atlas=c)
        # mip_lod=False: the 1-mip path samples `pages` directly (the lod
        # path samples the baked `mips` pyramid instead — tested below)
        return jnp.mean(render(s, cam, width=W, height=H, mip_lod=False)[..., :3])

    g = jax.grad(loss)(scene.combined_atlas.pages)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    def loss_mips(mips):
        c = dataclasses.replace(scene.combined_atlas, mips=mips)
        s = dataclasses.replace(scene, combined_atlas=c)
        return jnp.mean(render(s, cam, width=W, height=H)[..., :3])  # lod on

    gm = jax.grad(loss_mips)(scene.combined_atlas.mips)
    assert all(np.isfinite(np.asarray(g_)).all() for g_ in gm)
    assert sum(float(jnp.abs(g_).sum()) for g_ in gm) > 0


def test_parallax_displacement():
    """Displacement-mapped material shifts its sampled uv (the completed
    Default.hlsl:55-69 path); flat height map with scale 0 is a no-op."""
    rng = np.random.default_rng(3)
    from physically_based_renderer_tpu import InstancedDraw, MaterialBuilder, Scene, sphere_mesh
    from physically_based_renderer_tpu.ops.brdf import Lights
    from physically_based_renderer_tpu.ops.texture import build_atlas

    size = 32
    alb = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    height_map = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    atlas = build_atlas([alb, height_map], [False, False], size=size)

    def scene_with(height_scale):
        mb = MaterialBuilder()
        mb.add(
            "m",
            textures={"diffuse": 0, "displacement": 1},
            height_scale=height_scale,
        )
        return Scene(
            draws=(InstancedDraw.create(sphere_mesh(1.0, 16, 8), np.eye(4, dtype=np.float32), [0]),),
            materials=mb.build(),
            atlas=atlas,
            lights=Lights.default_scene_lights(),
            ambient=jnp.asarray([0.03, 0.03, 0.03]),
        )

    cam = Camera.create(aspect=1.0)
    img0 = np.asarray(render(scene_with(0.0), cam, width=64, height=64))
    img1 = np.asarray(render(scene_with(0.05), cam, width=64, height=64))
    diff = np.abs(img0 - img1).max()
    assert diff > 0.01, diff  # parallax visibly shifts texels
    # zero scale must equal a scene with no displacement at all
    mb = MaterialBuilder()
    mb.add("m", textures={"diffuse": 0})
    scene_plain = dataclasses.replace(scene_with(0.0), materials=mb.build())
    img_plain = np.asarray(render(scene_plain, cam, width=64, height=64))
    np.testing.assert_allclose(img0, img_plain, atol=1e-6)


def test_parallax_uv_clip():
    """Fragments whose displaced uv exits [0,1] are discarded — the four
    clip() calls of Default.hlsl:65-68. A huge height scale pushes edge-pixel
    uvs out of range; those pixels must fall through to the clear color."""
    rng = np.random.default_rng(5)
    from physically_based_renderer_tpu import InstancedDraw, MaterialBuilder, Scene, sphere_mesh
    from physically_based_renderer_tpu.ops.brdf import Lights
    from physically_based_renderer_tpu.ops.texture import build_atlas

    size = 16
    alb = rng.uniform(0.2, 1, (size, size, 3)).astype(np.float32)
    height_map = np.full((size, size, 3), 1.0, np.float32)  # max height
    atlas = build_atlas([alb, height_map], [False, False], size=size)

    def scene_with(height_scale):
        mb = MaterialBuilder()
        mb.add(
            "m",
            textures={"diffuse": 0, "displacement": 1},
            height_scale=height_scale,
        )
        return Scene(
            draws=(InstancedDraw.create(sphere_mesh(1.0, 16, 8), np.eye(4, dtype=np.float32), [0]),),
            materials=mb.build(),
            atlas=atlas,
            lights=Lights.default_scene_lights(),
            ambient=jnp.asarray([0.03, 0.03, 0.03]),
        )

    cam = Camera.create(aspect=1.0)
    clear = np.array([0.5, 0.5, 0.5])

    def bg_count(img):
        return int((np.abs(img[..., :3] - clear).max(-1) < 1e-6).sum())

    img0 = np.asarray(render(scene_with(0.0), cam, width=64, height=64))
    img_big = np.asarray(render(scene_with(5.0), cam, width=64, height=64))
    # Uniform height 1.0 × scale 5 displaces every uv far outside [0,1]:
    # the whole sphere is clipped away.
    assert bg_count(img_big) > bg_count(img0) + 100, (
        bg_count(img_big), bg_count(img0))
    # Scale 0 clips nothing (uv unchanged, in [0,1] for the sphere mapping).
    assert bg_count(img0) == bg_count(
        np.asarray(render(scene_with(0.0), cam, width=64, height=64))
    )


def test_half_combined_matches_f32_and_keeps_gradients():
    """f16-pair-packed pages: forward within f16 quantization of the f32
    path, texel/uv gradients equal to the f32 path's (recompute backward)."""
    scene = _textured_scene()
    from physically_based_renderer_tpu.ops.texture_combined import (
        build_combined,
        build_combined_half,
        sample_combined,
        sample_combined_half,
    )

    comb = build_combined(scene.materials, scene.atlas)
    half = build_combined_half(scene.materials, scene.atlas)
    rng = np.random.default_rng(7)
    uv = jnp.asarray(rng.uniform(-0.5, 1.5, size=(257, 2)), jnp.float32)
    mids = jnp.asarray(rng.integers(0, scene.materials.num_materials, size=257))

    a = np.asarray(sample_combined(comb, mids, uv))[..., :12]
    b = np.asarray(sample_combined_half(half, mids, uv))
    np.testing.assert_allclose(b, a, atol=2e-3)  # f16 quantization bound

    def loss_f32(pages, uv_):
        c = dataclasses.replace(comb, pages=pages)
        return jnp.sum(sample_combined(c, mids, uv_)[..., :12] ** 2)

    def loss_half(pages, uv_):
        h = dataclasses.replace(half, pages=pages)
        return jnp.sum(sample_combined_half(h, mids, uv_) ** 2)

    g32 = jax.grad(loss_f32, argnums=(0, 1))(comb.pages, uv)
    gh = jax.grad(loss_half, argnums=(0, 1))(half.pages, uv)
    # backward recomputes through f32 → gradients match up to the forward's
    # f16 perturbation entering the (smooth) cotangent
    for a_, b_ in zip(g32, gh):
        sc = max(float(jnp.abs(a_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                   atol=5e-3 * sc, rtol=2e-2)


def test_half_combined_render_matches_f32():
    scene32 = _textured_scene().with_combined_textures()
    scene16 = _textured_scene().with_combined_textures(mode="half")
    cam = Camera.create(aspect=W / H)
    a = np.asarray(render(scene32, cam, width=W, height=H))
    b = np.asarray(render(scene16, cam, width=W, height=H))
    d = np.abs(b - a)
    # f16 texels in display space; isolated specular-peak pixels amplify the
    # roughness quantization (GGX near mirror), so bound the bulk and the
    # outlier fraction separately.
    assert np.quantile(d, 0.999) < 6e-3, np.quantile(d, 0.999)
    assert (d > 6e-3).mean() < 2e-4, (d > 6e-3).mean()


def test_packed_combined_matches_f32_combined():
    """u8-packed pages reproduce the f32 combined sample within quantization
    tolerance (≤ ~2/255 per channel after the sRGB round trip)."""
    scene = _textured_scene()
    from physically_based_renderer_tpu.ops.texture_combined import (
        build_combined,
        build_combined_packed,
        sample_combined,
        sample_combined_packed,
    )

    comb = build_combined(scene.materials, scene.atlas)
    packed = build_combined_packed(scene.materials, scene.atlas)
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(-0.5, 1.5, size=(257, 2)), jnp.float32)
    mids = jnp.asarray(rng.integers(0, scene.materials.num_materials, size=257))
    a = np.asarray(sample_combined(comb, mids, uv))[..., :12]
    b = np.asarray(sample_combined_packed(packed, mids, uv))
    np.testing.assert_allclose(a, b, atol=0.012)


def test_packed_combined_render_close():
    scene = _textured_scene()
    cam = Camera.create(aspect=W / H)
    a = render(scene.with_combined_textures(), cam, width=W, height=H)
    b = render(scene.with_combined_textures(packed=True), cam, width=W, height=H)
    d = np.abs(np.asarray(a) - np.asarray(b)).max(-1)
    # u8 quantization of the normal map can swing peaky speculars by a lot
    # on isolated pixels; the image as a whole must match tightly.
    assert np.percentile(d, 99.5) < 0.02, np.percentile(d, 99.5)
    assert d.mean() < 1e-3, d.mean()
    assert (d > 0.05).mean() < 2e-3


def test_quad_combined_exact_forward_and_gradients():
    """f32 quad-packed pages: BIT-exact forward vs the 4-gather f32 path and
    identical texel/uv gradients — the fast EXACT path (one row gather)."""
    scene = _textured_scene()
    from physically_based_renderer_tpu.ops.texture_combined import (
        build_combined,
        build_combined_quad,
        sample_combined,
        sample_combined_quad,
    )

    comb = build_combined(scene.materials, scene.atlas)
    quad = build_combined_quad(scene.materials, scene.atlas)
    rng = np.random.default_rng(11)
    uv = jnp.asarray(rng.uniform(-0.5, 1.5, size=(257, 2)), jnp.float32)
    mids = jnp.asarray(rng.integers(0, scene.materials.num_materials, size=257))

    for wrap in (True, False):
        a = np.asarray(sample_combined(comb, mids, uv, wrap=wrap))[..., :12]
        b = np.asarray(sample_combined_quad(quad, mids, uv, wrap=wrap))
        # identical f32 taps and weights; only XLA fma-fusion order differs
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)

    def loss_f32(pages, uv_):
        c = dataclasses.replace(comb, pages=pages)
        return jnp.sum(sample_combined(c, mids, uv_)[..., :12] ** 2)

    def loss_quad(pages, uv_):
        q = dataclasses.replace(quad, pages=pages)
        return jnp.sum(sample_combined_quad(q, mids, uv_) ** 2)

    g32 = jax.grad(loss_f32, argnums=(0, 1))(comb.pages, uv)
    gq = jax.grad(loss_quad, argnums=(0, 1))(quad.pages, uv)
    for a_, b_ in zip(g32, gq):
        sc = max(float(jnp.abs(a_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                   atol=1e-6 * sc, rtol=1e-5)


def test_quad_combined_render_matches_f32():
    scene32 = _textured_scene().with_combined_textures()
    sceneq = _textured_scene().with_combined_textures(mode="quad")
    cam = Camera.create(aspect=W / H)
    a = np.asarray(render(scene32, cam, width=W, height=H))
    b = np.asarray(render(sceneq, cam, width=W, height=H))
    np.testing.assert_allclose(b, a, atol=3e-6)  # fma-order ulps only
