"""BASELINE.json config goldens: the JAX pipeline vs the extended numpy
oracle (per-face materials, textures, normal maps) at small resolutions,
plus pixel-gradient finite-difference gates.

Configs (BASELINE.json):
  1. analytic sphere               — tests/test_render_golden.py
  2. sphere grid (PBR.png sweep)   — here, oracle with 49 materials
  3. textured sphere (synthetic rustediron-like maps) — here
  4. mori_knob mesh, 5 materials   — here (reference assets)
  5. IBL                           — tests/test_ibl.py (quadrature + grads)
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_renderer as oracle
from physically_based_renderer_tpu import Camera, render, scenes
from physically_based_renderer_tpu.models.scene import flatten_scene

DIR_LIGHTS = [
    ((0.57735, 0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((0.57735, -0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((-0.57735, 0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((-0.57735, -0.57735, 0.57735), (0.25, 0.25, 0.25)),
]

ASSET_OBJ = "/root/reference/Assets/mori_knob/testObj.obj"


def _oracle_of_scene(scene, cam, width, height, materials):
    geom = flatten_scene(scene)
    vp = np.asarray(cam.view_proj(), np.float64)
    img, _ = oracle.render_general(
        np.asarray(geom.pos_w),
        np.asarray(geom.normal_w),
        np.asarray(geom.tangent_w),
        np.asarray(geom.bitangent_w),
        np.asarray(geom.uv),
        np.asarray(geom.tris),
        np.asarray(geom.face_material),
        materials,
        np.eye(4),
        vp,
        np.asarray(cam.position, np.float64),
        width,
        height,
        DIR_LIGHTS,
    )
    return img


def _check(img_jax, img_oracle, max_bad=0.01, tol=2e-2):
    diff = np.abs(np.asarray(img_jax)[..., :3] - img_oracle)
    bad = (diff.max(axis=-1) > tol).mean()
    assert bad < max_bad, f"{bad:.4%} pixels differ by > {tol}"


def test_config2_sphere_grid_matches_oracle():
    w, h = 192, 144
    scene = scenes.red_sphere_grid_scene(slices=16, stacks=8)
    cam = Camera.create(position=(0.0, -5.0, -16.0), aspect=w / h)
    img = render(scene, cam, width=w, height=h)
    mats = [
        dict(
            diffuse=(1.0, 0.0, 0.0),
            fresnel_r0=(0.04,) * 3,
            roughness=(i % 7) / 6.0,
            metallic=1.0 - (i // 7) / 6.0,
        )
        for i in range(49)
    ]
    expected = _oracle_of_scene(scene, cam, w, h, mats)
    _check(img, expected)


def _synthetic_textured_scene(size=32):
    rng = np.random.default_rng(7)
    from physically_based_renderer_tpu import InstancedDraw, MaterialBuilder, Scene, sphere_mesh
    from physically_based_renderer_tpu.ops.brdf import Lights
    from physically_based_renderer_tpu.ops.texture import build_atlas

    alb = rng.uniform(0.1, 0.9, (size, size, 3)).astype(np.float32)
    met = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    rough = rng.uniform(0.1, 1, (size, size, 3)).astype(np.float32)
    nrm = np.stack(
        [
            np.full((size, size), 0.5),
            np.full((size, size), 0.5),
            np.full((size, size), 1.0),
        ],
        axis=-1,
    ).astype(np.float32)
    # Perturb the normal map slightly
    nrm[..., :2] += rng.uniform(-0.2, 0.2, (size, size, 2)).astype(np.float32)
    atlas = build_atlas([alb, met, rough, nrm], [False, False, False, False], size=size)

    mb = MaterialBuilder()
    mb.add("rust", textures={"diffuse": 0, "metallic": 1, "roughness": 2, "normal": 3})
    scene = Scene(
        draws=(InstancedDraw.create(sphere_mesh(1.0, 16, 8), np.eye(4, dtype=np.float32), [0]),),
        materials=mb.build(),
        atlas=atlas,
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray([0.03, 0.03, 0.03]),
    )
    oracle_mats = [
        dict(
            tex_diffuse=np.asarray(atlas.mips[0][0], np.float64),
            tex_metallic=np.asarray(atlas.mips[0][1], np.float64),
            tex_roughness=np.asarray(atlas.mips[0][2], np.float64),
            tex_normal=np.asarray(atlas.mips[0][3], np.float64),
        )
    ]
    return scene, oracle_mats


def test_config3_textured_sphere_matches_oracle():
    w, h = 160, 120
    scene, oracle_mats = _synthetic_textured_scene()
    cam = Camera.create(aspect=w / h)
    img = render(scene, cam, width=w, height=h)
    expected = _oracle_of_scene(scene, cam, w, h, oracle_mats)
    _check(img, expected, max_bad=0.015)
    # combined-texture fast path hits the same golden
    img2 = render(scene.with_combined_textures(), cam, width=w, height=h)
    _check(img2, expected, max_bad=0.015)


def test_config3_texture_texel_grads_fd():
    scene, _ = _synthetic_textured_scene(size=16)
    cam = Camera.create(aspect=1.0)

    def loss(mip0):
        a = dataclasses.replace(scene.atlas, mips=(mip0,) + scene.atlas.mips[1:])
        s = dataclasses.replace(scene, atlas=a)
        return jnp.mean(render(s, cam, width=48, height=48)[..., :3])

    mip0 = scene.atlas.mips[0]
    g = jax.grad(loss)(mip0)
    assert np.isfinite(np.asarray(g)).all()
    # Directional FD (single-texel FD needs tiny eps near normal-map texels,
    # whose shading response is highly curved; a random direction averages
    # the curvature out). eps=1e-3 converges to the autodiff value.
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=mip0.shape), jnp.float32)
    eps = 1e-3
    fd = (float(loss(mip0 + eps * d)) - float(loss(mip0 - eps * d))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(g * d)), fd, rtol=0.1, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(ASSET_OBJ), reason="reference assets absent")
def test_config4_mori_knob_matches_oracle():
    w, h = 192, 144
    scene = scenes.mori_knob_scene(texture_size=64)
    cam = Camera.create(position=(0.0, 0.8, -3.0), pitch=-0.2, aspect=w / h)
    img = render(scene, cam, width=w, height=h)

    m = scene.materials
    mats = []
    for i in range(m.num_materials):
        mats.append(
            dict(
                diffuse=tuple(np.asarray(m.diffuse[i])),
                metallic=float(m.metallic[i]),
                fresnel_r0=tuple(np.asarray(m.fresnel_r0[i])),
                roughness=float(m.roughness[i]),
            )
        )
    expected = _oracle_of_scene(scene, cam, w, h, mats)
    _check(img, expected, max_bad=0.02)


@pytest.mark.skipif(not os.path.exists(ASSET_OBJ), reason="reference assets absent")
def test_config4_mori_knob_material_grads_fd():
    scene = scenes.mori_knob_scene(texture_size=32)
    cam = Camera.create(position=(0.0, 0.8, -3.0), pitch=-0.2, aspect=4 / 3)

    def loss(rough):
        mats = dataclasses.replace(
            scene.materials, roughness=scene.materials.roughness * rough
        )
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(render(s, cam, width=96, height=72)[..., :3])

    g = float(jax.grad(loss)(1.0))
    eps = 1e-2
    fd = (float(loss(1 + eps)) - float(loss(1 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=3e-2)
