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
    merge: str = "band",
    raster_backend: str = "auto",
    **render_kwargs: Any,
) -> jnp.ndarray:
    """Render with TRIANGLES sharded over the mesh (SURVEY.md §2.3: the
    'primitive parallel' axis — triangles : tiles :: keys : queries in ring
    attention, with the depth resolve as the online running-reduce).

    MEMORY-SHARDED: the corner-major geometry (clip positions, interpolation
    attributes, face materials) is partitioned P(tris) across the mesh —
    per-chip triangle storage is O(T/N), the reason primitive parallelism
    exists (triangle count ≫ per-chip memory). Merge strategies:

      * ``merge="band"`` (default) — a REDUCE-SCATTER ring over row bands:
        at step k, device i rasterizes band (i+k+1) mod N of the frame
        against its OWN shard straight into a G-buffer (the fused row-layout
        raster+interp kernel on TPU), merges it min-by-depth into the
        traveling (z, attrs, id, mat) band buffer, and passes the buffer one
        hop down the ICI ring; after N steps every device holds its own
        band fully resolved from ALL shards and shades it through the same
        fused shading kernel as the row-band DP path. No id-only pass, no
        post-merge re-interpolation — the closest structure to the
        single-chip fast path (ring-attention with bands as queries and
        triangle shards as keys/values, the G-buffer merge as the online
        reduce).
      * ``merge="ring"`` — full-frame id raster per shard, then N−1
        ``ppermute`` steps with a running elementwise min-by-depth on
        (z, id), then an N-step ring ATTRIBUTE exchange re-interpolates the
        winners (kept for comparison; 2 ring passes + an XLA gather
        interpolation).
      * ``merge="allgather"`` — one all_gather + argmin over the device axis
        (simpler, N× memory).

    Shading is row-band data-parallel with a RING ATTRIBUTE EXCHANGE: the
    winning triangles of a band live on arbitrary shards, so the attribute
    blocks circulate the ICI ring (N steps) and each device interpolates the
    pixels whose winner belongs to the resident block — the key/value
    rotation of ring attention, applied to vertex attributes. Material,
    light and texture banks stay replicated (they are small); only the O(T)
    arrays shard."""
    from ..models.scene import flatten_scene_corners
    from ..renderer import shade_compose_band_attrs
    from .. import math3d
    from ..ops import raster, raster_pallas

    n = mesh.shape[TRIS_AXIS]
    assert height % n == 0, f"height {height} must divide over {n} devices"
    band = height // n

    backend = raster_backend
    if backend == "auto":
        backend = "jnp" if jax.default_backend() == "cpu" else "pallas"

    # Build + clip-transform the corner geometry OUTSIDE shard_map with a
    # P(tris) sharding constraint: XLA partitions the (embarrassingly
    # triangle-parallel) flatten/transform einsums so each device builds and
    # HOLDS only its ~T/N rows — the memory axis, not just a compute split.
    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)  # (T, 3, 4)
    num_t = geom.num_triangles
    shard = -(-num_t // n)
    pad_t = shard * n - num_t

    def shard_tris(x):
        x = jnp.pad(x, ((0, pad_t),) + ((0, 0),) * (x.ndim - 1))
        return jax.device_put(x, NamedSharding(mesh, P(TRIS_AXIS)))

    clip_sh = shard_tris(clip)
    attrs_sh = shard_tris(geom.attrs)
    fm_sh = shard_tris(geom.face_material)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(TRIS_AXIS), P(TRIS_AXIS), P(TRIS_AXIS)),
        out_specs=P(TRIS_AXIS),
        check_vma=False,  # see make_train_step: custom_vjp material fetch
    )
    def _render(scene_rep: Scene, cam_rep: Camera, clip_loc, attrs_loc, fm_loc):
        i = jax.lax.axis_index(TRIS_AXIS)
        start = i * shard
        local_idx = start + jnp.arange(shard, dtype=jnp.int32)
        local_valid = local_idx < num_t

        if merge == "band":
            # Band reduce-scatter (docstring above). Shard-pad triangles are
            # all-zero rows → zero-area → culled by raster setup, so no
            # tri_mask is needed on the kernel path.
            nm = scene_rep.materials.num_materials
            c_attrs = attrs_loc.shape[-1]
            buf_z = jnp.full((band, width), jnp.inf, jnp.float32)
            buf_attrs = jnp.zeros((band, width, c_attrs), jnp.float32)
            buf_tid = jnp.full((band, width), -1, jnp.int32)
            buf_mat = jnp.zeros((band, width), jnp.int32)
            perm_down = [(j, (j - 1) % n) for j in range(n)]
            for k in range(n):
                b = (i + k + 1) % n
                y0 = b * band
                if backend == "pallas":
                    a_k, z_k, t_k, m_k = raster_pallas.raster_gbuffer(
                        clip_loc,
                        attrs_loc,
                        None,
                        fm_loc,
                        width=width,
                        height=height,
                        rows=band,
                        y_offset=y0,
                        tile_h=8,
                        max_span=16,
                        num_materials=nm,
                        row_layout=True,
                        **render_kwargs,
                    )
                else:
                    t_k = raster.rasterize(
                        clip_loc,
                        None,
                        width=width,
                        height=height,
                        rows=band,
                        y_offset=y0,
                        tri_mask=local_valid,
                        **render_kwargs,
                    )
                    a_k, z_k, _m = raster.interpolate_corners(
                        attrs_loc, clip_loc, t_k,
                        width=width, height=height, y_offset=y0,
                    )
                    m_k = fm_loc[jnp.maximum(t_k, 0)]
                hit_k = t_k >= 0
                z_k = jnp.where(hit_k, z_k, jnp.inf)
                take = z_k < buf_z
                buf_z = jnp.where(take, z_k, buf_z)
                buf_attrs = jnp.where(take[..., None], a_k, buf_attrs)
                buf_tid = jnp.where(take, jnp.where(hit_k, t_k + start, -1), buf_tid)
                buf_mat = jnp.where(take, m_k, buf_mat)
                if k < n - 1:
                    buf_z = jax.lax.ppermute(buf_z, TRIS_AXIS, perm_down)
                    buf_attrs = jax.lax.ppermute(buf_attrs, TRIS_AXIS, perm_down)
                    buf_tid = jax.lax.ppermute(buf_tid, TRIS_AXIS, perm_down)
                    buf_mat = jax.lax.ppermute(buf_mat, TRIS_AXIS, perm_down)
            return shade_compose_band_attrs(
                scene_rep,
                cam_rep,
                buf_attrs,
                buf_tid >= 0,
                buf_mat,
                width=width,
                height=height,
                y_offset=i * band,
                apply_tonemap=True,
            )

        if backend == "pallas":
            tid_local, _mat, z_local = raster_pallas.rasterize_binned(
                clip_loc,
                None,  # corner-major
                width=width,
                height=height,
                tri_mask=local_valid,
                face_material=fm_loc,
                num_materials=scene_rep.materials.num_materials,
                return_depth=True,
                **render_kwargs,
            )
        else:
            tid_local, z_local = raster.rasterize(
                clip_loc,
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

        # Row-band shading with ring attribute exchange: rotate the
        # (clip, attrs, owner) blocks around the ring; at each step
        # interpolate the band pixels whose winning triangle lives in the
        # resident block. N small masked interpolations ≡ one full one.
        y0 = i * band
        tid_band = jax.lax.dynamic_slice_in_dim(tid, y0, band, axis=0)
        hit = tid_band >= 0

        cur_clip, cur_attrs, cur_fm = clip_loc, attrs_loc, fm_loc
        cur_owner = i
        out_attrs = jnp.zeros(
            (band, width, attrs_loc.shape[-1]), jnp.float32
        )
        out_mask = jnp.zeros((band, width), bool)
        out_mat = jnp.zeros((band, width), jnp.int32)
        perm = [(j, (j + 1) % n) for j in range(n)]
        for _step in range(n):
            base = cur_owner * shard
            in_blk = hit & (tid_band >= base) & (tid_band < base + shard)
            tid_loc = jnp.where(in_blk, tid_band - base, -1)
            a, _d, m = raster.interpolate_corners(
                cur_attrs, cur_clip, tid_loc,
                width=width, height=height, y_offset=y0,
            )
            out_attrs = jnp.where(in_blk[..., None], a, out_attrs)
            out_mask = out_mask | (in_blk & m)
            out_mat = jnp.where(
                in_blk, cur_fm[jnp.maximum(tid_loc, 0)], out_mat
            )
            if _step < n - 1:
                cur_clip = jax.lax.ppermute(cur_clip, TRIS_AXIS, perm)
                cur_attrs = jax.lax.ppermute(cur_attrs, TRIS_AXIS, perm)
                cur_fm = jax.lax.ppermute(cur_fm, TRIS_AXIS, perm)
                cur_owner = (cur_owner - 1) % n

        return shade_compose_band_attrs(
            scene_rep,
            cam_rep,
            out_attrs,
            out_mask,
            out_mat,
            width=width,
            height=height,
            y_offset=y0,
        )

    return _render(scene, camera, clip_sh, attrs_sh, fm_sh)
