"""Golden tests: the full JAX pipeline vs the independent numpy oracle
renderer (BASELINE config 1), plus gradient checks vs finite differences."""

import numpy as np
import jax
import jax.numpy as jnp

import reference_renderer as oracle
from physically_based_renderer_tpu import Camera, render, scenes
from physically_based_renderer_tpu.ops.brdf import Lights

W, H = 160, 120

DIR_LIGHTS = [
    ((0.57735, 0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((0.57735, -0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((-0.57735, 0.57735, 0.57735), (0.25, 0.25, 0.25)),
    ((-0.57735, -0.57735, 0.57735), (0.25, 0.25, 0.25)),
]


def _oracle_sphere(albedo, metallic, roughness, slices=24, stacks=12):
    from physically_based_renderer_tpu.models.mesh import sphere_mesh

    mesh = sphere_mesh(1.0, slices, stacks)
    cam = Camera.create(aspect=W / H)
    vp = np.asarray(cam.view_proj(), np.float64)
    f0 = (1 - metallic) * np.asarray([0.04] * 3) + metallic * np.asarray(albedo)
    img, depth = oracle.render_constant_material(
        np.asarray(mesh.positions),
        np.asarray(mesh.normals),
        np.asarray(mesh.tris),
        np.eye(4),
        vp,
        np.asarray([0.0, 0.0, -5.0]),
        W,
        H,
        albedo,
        metallic,
        f0,
        roughness,
        DIR_LIGHTS,
    )
    return img, depth


def test_analytic_sphere_matches_oracle():
    albedo, metallic, roughness = (1.0, 0.0, 0.0), 0.5, 0.5
    scene = scenes.analytic_sphere_scene(albedo, roughness, metallic, slices=24, stacks=12)
    cam = Camera.create(aspect=W / H)
    img = np.asarray(render(scene, cam, width=W, height=H))[..., :3]
    expected, _ = _oracle_sphere(albedo, metallic, roughness)

    diff = np.abs(img - expected)
    # Edge pixels may disagree (different but equally-valid tie rules); the
    # interior must match tightly. Allow <1% of pixels to differ.
    bad = (diff.max(axis=-1) > 2e-2).mean()
    assert bad < 0.01, f"{bad:.4%} pixels differ by >2e-2"
    # median error tiny
    assert np.median(diff) < 2e-3


def test_sphere_coverage_fraction():
    # r=1 sphere at origin, camera at z=-5, fov π/4: projected disc radius
    # ≈ h·r/z·(H/2) — sanity-check silhouette coverage vs analytic area.
    scene = scenes.analytic_sphere_scene(slices=48, stacks=24)
    cam = Camera.create(aspect=W / H)
    img = np.asarray(render(scene, cam, width=W, height=H))
    covered = (np.abs(img[..., :3] - 0.5).max(axis=-1) > 1e-6).sum()
    # Projected radius in pixels: the sphere silhouette from distance d=5 has
    # angular radius asin(1/5); pixel radius = tan(asin(1/5))/tan(fov/2)·(H/2)
    ang = np.arcsin(1.0 / 5.0)
    pix_r = np.tan(ang) / np.tan(cam.fov_y / 2) * (H / 2)
    expect = np.pi * pix_r**2
    assert abs(covered - expect) / expect < 0.05


def test_grad_matches_finite_difference_material():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=64 / 48)

    def loss_fn(rough, metal, albedo_r):
        mats = scene.materials
        import dataclasses

        mats = dataclasses.replace(
            mats,
            roughness=jnp.full_like(mats.roughness, rough),
            metallic=jnp.full_like(mats.metallic, metal),
            diffuse=mats.diffuse.at[:, 0].set(albedo_r),
        )
        s = dataclasses.replace(scene, materials=mats)
        img = render(s, cam, width=64, height=48)
        return jnp.mean(img[..., :3] ** 2)

    r0, m0, a0 = 0.4, 0.6, 0.9
    g = jax.grad(loss_fn, argnums=(0, 1, 2))(r0, m0, a0)
    eps = 1e-3
    for i, (name, base) in enumerate([("rough", (r0, m0, a0))]):
        pass
    args = [r0, m0, a0]
    for i in range(3):
        hi = list(args)
        lo = list(args)
        hi[i] += eps
        lo[i] -= eps
        fd = (float(loss_fn(*hi)) - float(loss_fn(*lo))) / (2 * eps)
        assert np.isfinite(float(g[i]))
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-2, atol=1e-6), i


def test_grad_matches_finite_difference_light():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=64 / 48)

    def loss_fn(strength_scale):
        import dataclasses

        lights = scene.lights
        lights = dataclasses.replace(lights, strength=lights.strength * strength_scale)
        s = dataclasses.replace(scene, lights=lights)
        img = render(s, cam, width=64, height=48)
        return jnp.mean(img[..., :3])

    g = jax.grad(loss_fn)(1.0)
    eps = 1e-3
    fd = (float(loss_fn(1.0 + eps)) - float(loss_fn(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=2e-2)


def test_grad_flows_to_world_matrices():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=64 / 48)

    def loss_fn(scale):
        import dataclasses

        draw = scene.draws[0]
        w = draw.worlds * jnp.asarray([scale, scale, scale, 1.0])[None, :, None]
        s = dataclasses.replace(
            scene, draws=(dataclasses.replace(draw, worlds=w),)
        )
        img = render(s, cam, width=64, height=48)
        return jnp.mean(img[..., :3])

    g = jax.grad(loss_fn)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0
