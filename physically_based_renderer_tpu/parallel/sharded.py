"""Multi-chip rendering and training via jax.sharding + shard_map.

The reference is single-GPU (SURVEY.md §2.3); this module supplies the
first-class TPU parallelism the north star demands:

  * **Screen-tile (row-band) data parallelism** — the framebuffer is cut into
    horizontal bands, one per chip along the mesh's "rows" axis. Geometry,
    materials, textures and lights are replicated; each chip rasterizes and
    shades only its band (depth/coverage resolve fully chip-local — no
    cross-chip communication in the forward pass at all).
  * **Parameter-gradient all-reduce** — differentiating through the
    shard_map'ed renderer transposes the replicated-input broadcast into a
    ``psum`` over ICI, so material/light/env gradients arrive fully reduced
    on every chip, overlapped with the backward pass by XLA's scheduler.

A camera-batch data-parallel axis and a triangle-sharded ring pass (the
ring-attention analog) are planned extensions of the same mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..models.scene import Scene
from ..renderer import render

ROWS_AXIS = "rows"


def make_render_mesh(devices=None) -> Mesh:
    """1-D device mesh over the screen-row axis."""
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh((len(devices),), (ROWS_AXIS,), devices=devices)


def render_sharded(
    scene: Scene,
    camera: Camera,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    **render_kwargs: Any,
) -> jnp.ndarray:
    """Render with the framebuffer row-sharded over ``mesh``'s rows axis.

    Returns the (H, W, 4) image, sharded P(rows) across devices. Height must
    divide evenly by the number of devices (pad upstream if needed)."""
    n = mesh.shape[ROWS_AXIS]
    assert height % n == 0, f"height {height} must divide over {n} devices"
    band = height // n

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(ROWS_AXIS),
    )
    def _render_band(scene_rep, cam_rep):
        i = jax.lax.axis_index(ROWS_AXIS)
        return render(
            scene_rep,
            cam_rep,
            width=width,
            height=height,
            rows=band,
            y_offset=i * band,
            **render_kwargs,
        )

    return _render_band(scene, camera)


def make_train_step(
    *,
    mesh: Mesh,
    width: int,
    height: int,
    learning_rate: float = 0.1,
    **render_kwargs: Any,
):
    """Build a jitted inverse-rendering SGD step, row-sharded over the mesh.

    The optimisation target is the differentiable parameter pytree
    (materials here; the same structure extends to lights/env/geometry).
    Returns ``step(scene, camera, target_image) -> (scene, loss)`` where
    ``target_image`` is (H, W, 3), sharded or shardable as P(rows).
    The loss reduction and parameter gradients cross chips via psum inserted
    by shard_map's transpose — the DP-grad all-reduce of SURVEY.md §2.3.
    """
    n = mesh.shape[ROWS_AXIS]
    assert height % n == 0
    band = height // n

    def loss_fn(materials, scene, camera, target):
        scene = dataclasses.replace(scene, materials=materials)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(ROWS_AXIS)),
            out_specs=P(),
        )
        def band_loss(scene_rep, cam_rep, target_band):
            i = jax.lax.axis_index(ROWS_AXIS)
            img = render(
                scene_rep,
                cam_rep,
                width=width,
                height=height,
                rows=band,
                y_offset=i * band,
                **render_kwargs,
            )
            err = jnp.mean((img[..., :3] - target_band) ** 2)
            return jax.lax.pmean(err, ROWS_AXIS)

        return band_loss(scene, camera, target)

    @jax.jit
    def step(scene, camera, target):
        # allow_int: the material pytree carries int32 texture-slot indices;
        # their grads come back as float0 and are skipped by the update rule.
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            scene.materials, scene, camera, target
        )
        new_mats = jax.tree.map(
            lambda p, g: p - learning_rate * g if jnp.issubdtype(p.dtype, jnp.floating) else p,
            scene.materials,
            grads,
        )
        return dataclasses.replace(scene, materials=new_mats), loss

    return step


def shard_target(target: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a (H, W, C) target image row-sharded on the mesh."""
    return jax.device_put(target, NamedSharding(mesh, P(ROWS_AXIS)))
