"""IBL tests: quadrature sanity on constant environments, round-trips,
LUT properties, env-map gradients (BASELINE config 5)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, render, scenes
from physically_based_renderer_tpu.ops import ibl as ibl_ops
from physically_based_renderer_tpu.ops.sky import world_to_sky_uv


def test_uv_direction_roundtrip(rng):
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    uv = world_to_sky_uv(jnp.asarray(d, jnp.float32))
    # NOTE: no mod-1 wrap here — the reference's truncated 1/2π constant
    # makes a full-period u wrap differ from 2π by ~2e-3 rad by design.
    back = ibl_ops.sky_uv_to_direction(uv[..., 0], uv[..., 1])
    np.testing.assert_allclose(np.asarray(back), d, atol=1e-4)


def test_solid_angles_sum_to_sphere():
    _, solid = ibl_ops.equirect_grid(64, 128)
    np.testing.assert_allclose(float(jnp.sum(solid)), 4 * np.pi, rtol=1e-3)


def test_irradiance_constant_env():
    # E(n) = ∫ L max(n·l,0) dω / π = L for constant L.
    env = jnp.full((32, 64, 3), 2.0)
    irr = ibl_ops.irradiance_map(env)
    np.testing.assert_allclose(np.asarray(irr), 2.0, rtol=2e-2)


def test_prefilter_constant_env():
    env = jnp.full((32, 64, 3), 3.0)
    levels = ibl_ops.prefilter_specular(env)
    for lvl in levels:
        np.testing.assert_allclose(np.asarray(lvl), 3.0, rtol=2e-2)


def test_irradiance_directional_env():
    # Env bright only near +y: irradiance at +y should exceed -y.
    h, w = 64, 128
    v = (np.arange(h) + 0.5) / h
    bright = (v < 0.15).astype(np.float32)  # v≈0 is +y (asin(y)=π/2 → v=0)
    env = jnp.asarray(np.broadcast_to(bright[:, None, None], (h, w, 3)) * 10.0)
    irr = np.asarray(ibl_ops.irradiance_map(env))
    top = irr[:4].mean()  # v small → +y directions
    bottom = irr[-4:].mean()
    assert top > 5 * bottom, (top, bottom)


def test_brdf_lut_properties():
    lut = np.asarray(ibl_ops.brdf_lut(size=32, num_samples=128))
    assert lut.shape == (32, 32, 2)
    assert np.isfinite(lut).all()
    assert (lut >= -1e-3).all() and (lut <= 1.5).all()
    # scale + bias ≈ total integrated visibility ≤ 1 (energy conservation)
    assert (lut.sum(-1) <= 1.05).all()


def test_env_gradients_flow():
    env0 = jnp.full((16, 32, 3), 1.0)

    def loss(env):
        irr = ibl_ops.irradiance_map(env, out_height=8, out_width=16, env_samples=16)
        return jnp.mean(irr**2)

    g = jax.grad(loss)(env0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_render_with_ibl():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    env = jnp.full((16, 32, 3), 0.8)
    scene = dataclasses.replace(scene, env_map=env).with_ibl()
    cam = Camera.create(aspect=1.0)
    img = render(scene, cam, width=64, height=64)
    assert np.isfinite(np.asarray(img)).all()
    # IBL ambient should brighten the sphere vs 0.03 constant ambient
    scene_no = dataclasses.replace(scene, ibl=None, env_map=None)
    img_no = render(scene_no, cam, width=64, height=64)
    assert float(img[..., :3].mean()) > float(img_no[..., :3].mean())


def test_render_ibl_env_grad():
    scene = scenes.analytic_sphere_scene(slices=12, stacks=6)
    env0 = jnp.full((16, 32, 3), 0.5)
    cam = Camera.create(aspect=1.0)

    def loss(env):
        s = dataclasses.replace(scene, env_map=env)
        s = dataclasses.replace(
            s,
            ibl=ibl_ops.IBLMaps(
                irradiance=ibl_ops.irradiance_map(env, 8, 16, env_samples=16),
                specular_levels=ibl_ops.prefilter_specular(env, 16, 32, 3, env_samples=16),
                lut=ibl_ops.brdf_lut(16, 64),
            ),
        )
        img = render(s, cam, width=48, height=48)
        return jnp.mean(img[..., :3])

    g = jax.grad(loss)(env0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_specular_stack_matches_levels():
    # The stacked one-gather path must match per-level sampling closely
    # (not bitwise: small levels get upsampled once for the stack).
    rng = np.random.default_rng(5)
    env = jnp.asarray(rng.uniform(0.1, 3.0, (32, 64, 3)).astype(np.float32))
    levels = ibl_ops.prefilter_specular(env, 32, 64, 4, env_samples=16)
    maps_stack = ibl_ops.IBLMaps(
        irradiance=ibl_ops.irradiance_map(env, 8, 16, env_samples=16),
        specular_levels=levels,
        lut=ibl_ops.brdf_lut(16, 64),
        specular_stack=ibl_ops.stack_specular_levels(levels),
    )
    maps_plain = dataclasses.replace(maps_stack, specular_stack=None)
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = jnp.asarray(d, jnp.float32)
    v = n  # head-on
    alb = jnp.full((128, 3), 0.5)
    f0 = jnp.full((128, 3), 0.04)
    met = jnp.full((128,), 0.3)
    rough = jnp.asarray(rng.uniform(0, 1, 128), jnp.float32)
    a = ibl_ops.ambient_ibl(maps_stack, n, v, alb, f0, met, rough)
    b = ibl_ops.ambient_ibl(maps_plain, n, v, alb, f0, met, rough)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.15, atol=5e-3)


def test_env_brdf_approx_matches_lut():
    lut = np.asarray(ibl_ops.brdf_lut(size=64, num_samples=512))
    nv = (np.arange(64) + 0.5) / 64
    r = (np.arange(64) + 0.5) / 64
    rr, vv = np.meshgrid(r, nv, indexing="ij")
    approx = np.asarray(
        ibl_ops.env_brdf_approx(jnp.asarray(vv, jnp.float32), jnp.asarray(rr, jnp.float32))
    )
    err = np.abs(approx - lut)
    # The Lazarov fit deviates a few % (worst near mirror-smooth surfaces);
    # gate the aggregate accuracy.
    core = (vv > 0.1)
    assert err[core].mean() < 0.05, err[core].mean()
    assert np.median(err[core]) < 0.03


def test_sh9_irradiance_matches_map():
    """Gather-free SH9 irradiance (Ramamoorthi closed form) vs the dense
    quadrature irradiance map: constant env exact, smooth env ≤ a few %."""
    env = jnp.full((32, 64, 3), 2.0)
    sh = ibl_ops.sh9_coeffs(env)
    d = np.random.default_rng(0).normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = jnp.asarray(d, jnp.float32)
    e = np.asarray(ibl_ops.sh9_irradiance(sh, n))
    np.testing.assert_allclose(e, 2.0, rtol=2e-2)

    # smooth directional env: one broad lobe around +y
    dirs, _ = ibl_ops.equirect_grid(32, 64)
    lobe = np.maximum(np.asarray(dirs)[:, 1], 0.0) ** 2
    env2 = jnp.asarray(
        np.broadcast_to(lobe[:, None], (32 * 64, 3)).reshape(32, 64, 3) * 5.0
    )
    sh2 = ibl_ops.sh9_coeffs(env2)
    e2 = np.asarray(ibl_ops.sh9_irradiance(sh2, n))
    # reference: sample the dense irradiance map along the same normals
    irr_map = ibl_ops.irradiance_map(env2)
    from physically_based_renderer_tpu.ops.ibl import sample_equirect_dir

    ref = np.asarray(sample_equirect_dir(irr_map, n))
    np.testing.assert_allclose(e2, ref, rtol=0.08, atol=5e-3)
