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
        check_vma=False,  # see make_train_step: custom_vjp material fetch
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
            # The shading stage's material fetch is a custom_vjp (ops/fetch.py)
            # whose backward's varying-axes type can't be statically inferred;
            # transpose semantics (psum of replicated-input cotangents) are
            # unchanged — only the static check is disabled.
            check_vma=False,
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
    """Place a (H, W, C) target image row-sharded on the mesh (over the
    mesh's first axis — works for both the rows and tris meshes)."""
    return jax.device_put(target, NamedSharding(mesh, P(mesh.axis_names[0])))


# ---------------------------------------------------------------------------
# Primitive (triangle) parallelism — the sequence-parallel / ring analog
# ---------------------------------------------------------------------------

TRIS_AXIS = "tris"


def make_tri_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh((len(devices),), (TRIS_AXIS,), devices=devices)


def render_tri_sharded(
    scene: Scene,
    camera: Camera,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    merge: str = "ring",
    **render_kwargs: Any,
) -> jnp.ndarray:
    """Render with TRIANGLES sharded over the mesh (SURVEY.md §2.3: the
    'primitive parallel' axis — triangles : tiles :: keys : queries in ring
    attention, with the depth resolve as the online running-reduce).

    Each device rasterizes the full frame against its triangle shard (raster
    work scales 1/N); the per-device (depth, id) buffers then merge to a
    global hard-visibility resolve either by

      * ``merge="ring"`` — N−1 ``ppermute`` steps passing (z, id) around the
        ICI ring with a running elementwise min-by-depth (streaming, O(HW)
        memory — the ring-attention pattern), or
      * ``merge="allgather"`` — one all_gather + argmin over the device axis
        (simpler, N× memory).

    Shading then runs row-sharded through :func:`renderer.shade_compose_band`
    — the SAME deferred tail ``render`` uses (one implementation, no drift).
    Geometry/material data stays replicated this round; the memory-sharded
    attribute-exchange variant is the planned extension.
    """
    from ..models.scene import flatten_scene_corners
    from ..renderer import shade_compose_band
    from .. import math3d
    from ..ops import raster

    n = mesh.shape[TRIS_AXIS]
    assert height % n == 0, f"height {height} must divide over {n} devices"
    band = height // n

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(TRIS_AXIS),
        check_vma=False,  # see make_train_step: custom_vjp material fetch
    )
    def _render(scene_rep: Scene, cam_rep: Camera):
        i = jax.lax.axis_index(TRIS_AXIS)
        textured = scene_rep.atlas is not None
        geom = flatten_scene_corners(scene_rep, textured=textured)
        vp = cam_rep.view_proj()
        clip = math3d.transform_points_h(geom.pos_w, vp)  # (T, 3, 4)

        # Triangle shard: static equal corner-major slices with a validity
        # mask so the last shard's padding is inert (zero-area, culled).
        num_t = geom.num_triangles
        shard = -(-num_t // n)
        start = i * shard
        clip_pad = jnp.pad(clip, ((0, shard * n - num_t), (0, 0), (0, 0)))
        local_clip = jax.lax.dynamic_slice_in_dim(clip_pad, start, shard, axis=0)
        local_idx = start + jnp.arange(shard, dtype=jnp.int32)
        local_valid = local_idx < num_t

        tid_local, z_local = raster.rasterize(
            local_clip,
            None,  # corner-major
            width=width,
            height=height,
            tri_mask=local_valid,
            return_depth=True,
            **render_kwargs,
        )
        tid_global = jnp.where(tid_local >= 0, tid_local + start, -1)

        if merge == "allgather":
            zs = jax.lax.all_gather(z_local, TRIS_AXIS)  # (n, H, W)
            ids = jax.lax.all_gather(tid_global, TRIS_AXIS)
            k = jnp.argmin(zs, axis=0)
            tid = jnp.take_along_axis(ids, k[None], axis=0)[0]
        else:  # ring running-min merge
            perm = [(j, (j + 1) % n) for j in range(n)]
            best_z, best_id = z_local, tid_global
            send_z, send_id = z_local, tid_global
            for _ in range(n - 1):
                send_z = jax.lax.ppermute(send_z, TRIS_AXIS, perm)
                send_id = jax.lax.ppermute(send_id, TRIS_AXIS, perm)
                take = send_z < best_z
                best_z = jnp.where(take, send_z, best_z)
                best_id = jnp.where(take, send_id, best_id)
            tid = best_id

        # Row-band shading of the merged id map (data parallel over pixels),
        # via render()'s own deferred tail.
        y0 = i * band
        tid_band = jax.lax.dynamic_slice_in_dim(tid, y0, band, axis=0)
        return shade_compose_band(
            scene_rep,
            cam_rep,
            geom,
            clip,
            tid_band,
            width=width,
            height=height,
            y_offset=y0,
        )

    return _render(scene, camera)
