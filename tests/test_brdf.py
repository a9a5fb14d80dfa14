"""BRDF unit tests: closed-form values, energy sanity, oracle agreement
(SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp

import reference_renderer as oracle
from physically_based_renderer_tpu.ops import brdf


def _v(*xs):
    return jnp.asarray(xs, jnp.float32)


def test_fresnel_normal_incidence():
    f0 = _v(0.04, 0.04, 0.04)
    n = _v(0.0, 0.0, 1.0)
    f = brdf.fresnel_schlick(n, n, f0)
    np.testing.assert_allclose(np.asarray(f), [0.04] * 3, atol=1e-6)


def test_fresnel_grazing_goes_to_one():
    f0 = _v(0.04, 0.04, 0.04)
    h = _v(0.0, 0.0, 1.0)
    v = _v(1.0, 0.0, 0.0)
    f = brdf.fresnel_schlick(h, v, f0)
    np.testing.assert_allclose(np.asarray(f), [1.0] * 3, atol=1e-6)


def test_ggx_integrates_to_one():
    # ∫ D(h) (N·h) dω ≈ 1 over the hemisphere. Midpoint rule needs many
    # samples for the near-specular lobe (α² = r⁴ is tiny at r=0.3).
    n = 8192
    theta = (np.arange(n) + 0.5) * (np.pi / 2 / n)
    phi_weight = 2 * np.pi
    nrm = _v(0.0, 0.0, 1.0)
    for rough in [0.3, 0.7, 1.0]:
        h = jnp.stack(
            [jnp.sin(jnp.asarray(theta)), jnp.zeros(n), jnp.cos(jnp.asarray(theta))],
            axis=-1,
        ).astype(jnp.float32)
        d = brdf.distribution_ggx(jnp.broadcast_to(nrm, (n, 3)), h, jnp.full((n,), rough))
        integrand = np.asarray(d) * np.cos(theta) * np.sin(theta)
        total = integrand.sum() * (np.pi / 2 / n) * phi_weight
        assert abs(total - 1.0) < 2e-2, (rough, total)


def test_roughness_clamp():
    n = _v(0.0, 0.0, 1.0)
    d0 = brdf.distribution_ggx(n, n, jnp.asarray(0.0))
    d005 = brdf.distribution_ggx(n, n, jnp.asarray(0.05))
    np.testing.assert_allclose(float(d0), float(d005))


def test_smith_k_remap():
    g = brdf.geometry_schlick_ggx(jnp.asarray(1.0), jnp.asarray(0.0))
    k = (0.0 + 1.0) ** 2 / 8.0
    np.testing.assert_allclose(float(g), 1.0 / (1.0 * (1 - k) + k), atol=1e-6)


def test_attenuation():
    np.testing.assert_allclose(float(brdf.calc_attenuation(jnp.asarray(2.0))), 0.25)
    # min-distance clamp
    np.testing.assert_allclose(
        float(brdf.calc_attenuation(jnp.asarray(0.0))), 1.0 / (0.01**2)
    )


def test_brdf_matches_oracle(rng):
    for _ in range(20):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        l = rng.normal(size=3)
        l /= np.linalg.norm(l)
        h = v + l
        h /= np.linalg.norm(h)
        albedo = rng.uniform(0, 1, 3)
        metallic = float(rng.uniform())
        f0 = rng.uniform(0, 1, 3)
        rough = float(rng.uniform())
        radiance = rng.uniform(0, 2, 3)

        expected = oracle.brdf_cook_torrance(albedo, metallic, f0, rough, radiance, n, v, l, h)
        mat = brdf.MaterialSample(
            diffuse_albedo=_v(*albedo),
            metallic=jnp.asarray(metallic, jnp.float32),
            fresnel_r0=_v(*f0),
            roughness=jnp.asarray(rough, jnp.float32),
        )
        got = brdf.brdf_cook_torrance(mat, _v(*radiance), _v(*n), _v(*v), _v(*l), _v(*h))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_point_light_range_cutoff():
    mat = brdf.MaterialSample(
        diffuse_albedo=_v(1.0, 1.0, 1.0),
        metallic=jnp.asarray(0.0),
        fresnel_r0=_v(0.04, 0.04, 0.04),
        roughness=jnp.asarray(0.5),
    )
    n = _v(0.0, 0.0, -1.0)
    v = _v(0.0, 0.0, -1.0)
    pos = _v(0.0, 0.0, 0.0)
    near = brdf.compute_point_light(_v(1, 1, 1), _v(0, 0, -99.0), mat, pos, n, v)
    far = brdf.compute_point_light(_v(1, 1, 1), _v(0, 0, -101.0), mat, pos, n, v)
    assert float(jnp.sum(near)) > 0.0
    assert float(jnp.sum(far)) == 0.0


def test_compute_lighting_four_dir_lights(rng):
    lights = brdf.Lights.default_scene_lights()
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    eye = np.asarray([0.0, 0.0, -5.0])
    mat = brdf.MaterialSample(
        diffuse_albedo=jnp.full((5, 3), 0.8),
        metallic=jnp.full((5,), 0.3),
        fresnel_r0=jnp.full((5, 3), 0.04),
        roughness=jnp.full((5,), 0.4),
    )
    v = eye - pts
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    got = brdf.compute_lighting(
        lights, mat, jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(v, jnp.float32)
    )
    dl = [((0.57735, 0.57735, 0.57735), (0.25,) * 3),
          ((0.57735, -0.57735, 0.57735), (0.25,) * 3),
          ((-0.57735, 0.57735, 0.57735), (0.25,) * 3),
          ((-0.57735, -0.57735, 0.57735), (0.25,) * 3)]
    for i in range(5):
        expect = np.zeros(3)
        for direction, strength in dl:
            ln = -np.asarray(direction)
            hh = v[i] + ln
            hh = hh / np.linalg.norm(hh)
            expect += oracle.brdf_cook_torrance(
                np.full(3, 0.8), 0.3, np.full(3, 0.04), 0.4, np.asarray(strength),
                nrm[i], v[i], ln, hh,
            )
        np.testing.assert_allclose(np.asarray(got[i]), expect, rtol=1e-4, atol=1e-6)


def test_normal_map_identity():
    # A flat (0.5, 0.5, 1) sample must return the geometric normal.
    n = _v(0.0, 0.0, 1.0)
    t = _v(1.0, 0.0, 0.0)
    b = _v(0.0, 1.0, 0.0)
    out = brdf.normal_sample_to_world_space(_v(0.5, 0.5, 1.0), n, t, b)
    np.testing.assert_allclose(np.asarray(out), [0, 0, 1], atol=1e-6)
