"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY.md §4.5):
sharded render == single-device render; sharded training step runs and
reduces loss; gradients psum correctly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, render, scenes
from physically_based_renderer_tpu.parallel import sharded

W, H = 128, 96


def test_sharded_render_matches_single_device():
    scene = scenes.analytic_sphere_scene(slices=24, stacks=12)
    cam = Camera.create(aspect=W / H)
    mesh = sharded.make_render_mesh()
    img_sharded = sharded.render_sharded(scene, cam, mesh=mesh, width=W, height=H)
    img_single = render(scene, cam, width=W, height=H)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), atol=1e-6
    )


def test_sharded_render_uses_all_devices():
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=W / H)
    mesh = sharded.make_render_mesh()
    img = sharded.render_sharded(scene, cam, mesh=mesh, width=W, height=H)
    assert len(img.sharding.device_set) == 8


def test_sharded_train_step_reduces_loss():
    cam = Camera.create(aspect=W / H)
    mesh = sharded.make_render_mesh()

    # Target: sphere with different material; start: grey sphere.
    target_scene = scenes.analytic_sphere_scene((0.9, 0.2, 0.1), 0.3, 0.8, slices=16, stacks=8)
    target = render(target_scene, cam, width=W, height=H)[..., :3]
    target = sharded.shard_target(target, mesh)

    scene = scenes.analytic_sphere_scene((0.5, 0.5, 0.5), 0.7, 0.2, slices=16, stacks=8)
    step = sharded.make_train_step(mesh=mesh, width=W, height=H, learning_rate=20.0)

    losses = []
    for _ in range(15):
        scene, loss = step(scene, cam, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses


def test_sharded_grads_match_single_device():
    cam = Camera.create(aspect=W / H)
    mesh = sharded.make_render_mesh()
    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)

    def loss_single(rough):
        mats = dataclasses.replace(
            scene.materials, roughness=jnp.full_like(scene.materials.roughness, rough)
        )
        s = dataclasses.replace(scene, materials=mats)
        img = render(s, cam, width=W, height=H)
        return jnp.mean(img[..., :3] ** 2)

    def loss_sharded(rough):
        mats = dataclasses.replace(
            scene.materials, roughness=jnp.full_like(scene.materials.roughness, rough)
        )
        s = dataclasses.replace(scene, materials=mats)
        img = sharded.render_sharded(s, cam, mesh=mesh, width=W, height=H)
        return jnp.mean(img[..., :3] ** 2)

    g1 = float(jax.jit(jax.grad(loss_single))(0.4))
    g2 = float(jax.jit(jax.grad(loss_sharded))(0.4))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_tri_sharded_matches_single_device():
    scene = scenes.analytic_sphere_scene(slices=24, stacks=12)
    cam = Camera.create(aspect=W / H)
    mesh = sharded.make_tri_mesh()
    import functools

    for merge in ("band", "ring", "allgather"):
        fn = jax.jit(
            functools.partial(
                sharded.render_tri_sharded, mesh=mesh, width=W, height=H, merge=merge
            )
        )
        img_sharded = fn(scene, cam)
        img_single = render(scene, cam, width=W, height=H, raster_backend="jnp")
        np.testing.assert_allclose(
            np.asarray(img_sharded), np.asarray(img_single), atol=1e-6,
            err_msg=merge,
        )


def test_scaling_harness_runs():
    from physically_based_renderer_tpu.parallel import distributed

    scene = scenes.analytic_sphere_scene(slices=8, stacks=4)
    cam = Camera.create(aspect=1.0)
    results = distributed.measure_scaling(
        scene, cam, width=128, height=64, device_counts=[1, 2], iters=2
    )
    assert len(results) == 2
    assert results[0].devices == 1 and results[1].devices == 2
    assert all(r.pixels_per_s > 0 for r in results)


def test_fetch_image():
    from physically_based_renderer_tpu.parallel import distributed

    scene = scenes.analytic_sphere_scene(slices=8, stacks=4)
    cam = Camera.create(aspect=1.0)
    mesh = sharded.make_render_mesh()
    img = sharded.render_sharded(scene, cam, mesh=mesh, width=128, height=64)
    host = distributed.fetch_image(img)
    assert host.shape == (64, 128, 4)
    assert np.isfinite(host).all()
