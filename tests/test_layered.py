"""Layered rendering: alpha-test clip and transparency blending semantics."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import (
    Camera,
    InstancedDraw,
    MaterialBuilder,
    Scene,
    render,
    sphere_mesh,
)
from physically_based_renderer_tpu.models.scene import translation_world
from physically_based_renderer_tpu.ops.brdf import Lights
from physically_based_renderer_tpu.renderer import render_layered

W, H = 96, 96


def _two_sphere_scene(front_kwargs, back_kwargs):
    mb = MaterialBuilder()
    front = mb.add("front", **front_kwargs)
    back = mb.add("back", **back_kwargs)
    mesh = sphere_mesh(1.0, 16, 8)
    return Scene(
        draws=(
            InstancedDraw.create(
                mesh,
                np.stack([translation_world(0, 0, 0), translation_world(0, 0, 3.0)]),
                [front, back],
            ),
        ),
        materials=mb.build(),
        atlas=None,
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray([0.03, 0.03, 0.03]),
    )


def test_layered_matches_render_for_opaque():
    scene = _two_sphere_scene(dict(diffuse=(1, 0, 0)), dict(diffuse=(0, 1, 0)))
    cam = Camera.create(aspect=1.0)
    a = np.asarray(render(scene, cam, width=W, height=H))
    b = np.asarray(render_layered(scene, cam, width=W, height=H))
    np.testing.assert_allclose(a[..., :3], b[..., :3], atol=1e-6)


def test_transparent_blends():
    # Front sphere 50% transparent red over opaque green sphere behind.
    scene = _two_sphere_scene(
        dict(diffuse=(1, 0, 0), opacity=0.5, transparent=True),
        dict(diffuse=(0, 1, 0)),
    )
    cam = Camera.create(aspect=1.0)
    img = np.asarray(render_layered(scene, cam, width=W, height=H))

    # Center pixel: blend of front red and back green shading.
    c = img[H // 2, W // 2, :3]
    # Opaque-only reference for each sphere alone:
    solo_front = _two_sphere_scene(dict(diffuse=(1, 0, 0), opacity=0.5), dict(diffuse=(0, 1, 0)))
    f = np.asarray(render_layered(solo_front, cam, width=W, height=H))[H // 2, W // 2, :3]
    scene_back_only = _two_sphere_scene(dict(diffuse=(0, 1, 0)), dict(diffuse=(0, 1, 0)))
    # front sphere occludes; get pure back color by removing front: move it away
    assert c[1] > f[1] + 0.02, (c, f)  # green shows through the transparent red
    assert c[0] > 0.05  # red contribution present


def test_fully_transparent_shows_background():
    scene = _two_sphere_scene(
        dict(diffuse=(1, 0, 0), opacity=0.0, transparent=True),
        dict(diffuse=(0, 1, 0)),
    )
    # push the back sphere far right so center shows background through front
    draw = scene.draws[0]
    scene = dataclasses.replace(
        scene, draws=(dataclasses.replace(draw, worlds=draw.worlds.at[1, 3, 0].set(50.0)),)
    )
    cam = Camera.create(aspect=1.0)
    img = np.asarray(render_layered(scene, cam, width=W, height=H))
    np.testing.assert_allclose(img[H // 2, W // 2, :3], [0.5, 0.5, 0.5], atol=1e-5)


def test_alpha_test_clips():
    # Alpha-tested front sphere with opacity below the 0.1 clip threshold:
    # every fragment discarded → back sphere shows.
    scene = _two_sphere_scene(
        dict(diffuse=(1, 0, 0), opacity=0.05, alpha_test=True),
        dict(diffuse=(0, 1, 0)),
    )
    cam = Camera.create(aspect=1.0)
    img = np.asarray(render_layered(scene, cam, width=W, height=H))
    c = img[H // 2, W // 2, :3]
    assert c[1] > c[0], c  # green (back) wins: front was clipped

    # Above threshold → front renders normally.
    scene2 = _two_sphere_scene(
        dict(diffuse=(1, 0, 0), opacity=0.5, alpha_test=True),
        dict(diffuse=(0, 1, 0)),
    )
    img2 = np.asarray(render_layered(scene2, cam, width=W, height=H))
    c2 = img2[H // 2, W // 2, :3]
    assert c2[0] > c2[1], c2  # red (front) wins
