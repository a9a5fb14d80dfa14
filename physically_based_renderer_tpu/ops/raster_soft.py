"""Soft (differentiable-visibility) rasterization via depth peeling.

The capability the reference's HW rasterizer fundamentally lacks (SURVEY.md
§7 hard parts): gradients w.r.t. geometry THROUGH visibility. Approach —
a SoftRas-style aggregation over K depth-peeled layers:

  1. K hard raster passes, each with a z-floor set to the previous layer's
     depth (strictly-greater test) → the K nearest fragments per pixel.
     Integer ids are non-differentiable and that's fine — they play the role
     of the sampling structure, like top-k indices in attention.
  2. Per layer, a differentiable signed distance d(pixel, triangle edge)
     gives a sigmoid coverage weight σ(d/sigma_px); perspective barycentrics
     give attributes; the full PBR shader gives per-layer color.
  3. Layers + background blend with softmax(-z/gamma)·coverage weights —
     the z-resolve becomes a smooth argmin, so silhouette motion and
     occlusion order both carry gradients.

sigma→0, gamma→0 recovers the hard image. Cost: K× the hard pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import raster


def math3d_length(v, axis=-1):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis), 1e-12))

BIG_Z = 1.0  # background depth (far plane)


def signed_distance_px(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray | None,
    tri_id: jnp.ndarray,
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Signed pixel distance from each pixel center to its winning triangle's
    boundary (positive inside), (H, W). Differentiable w.r.t. verts_clip;
    the min-edge choice subgradient is standard.

    ``tris=None`` → corner-major ``verts_clip`` (T,3,4): the per-pixel fetch
    is ONE 8-lane-padded row gather instead of three vertex gathers (the
    same layout win as ``raster.interpolate_corners``)."""
    if tris is None:
        xy_c, _, _ = raster.project_corners(verts_clip, width, height)  # (T,3,2)
        table = xy_c.reshape(-1, 6)
        table = jnp.pad(table, ((0, 0), (0, 2)))  # 8-lane-aligned rows
        from .texture import pad_gather_rows

        table = pad_gather_rows(table)
        xy = table[jnp.maximum(tri_id, 0)][..., :6].reshape(*tri_id.shape, 3, 2)
    else:
        xy_all, _, _ = raster.project_to_screen(verts_clip, width, height)
        corner = tris[jnp.maximum(tri_id, 0)]  # (H,W,3)
        xy = xy_all[corner]  # (H,W,3,2)

    py = (
        jnp.asarray(y_offset, jnp.float32)
        + jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 0)
        + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 1) + 0.5
    p = jnp.stack([px, py], axis=-1)

    def edge_line_dist(a, b):
        ab = b - a
        ln = jnp.sqrt(jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12))
        # cross((b-a), (p-a)) / |b-a| — positive on the interior side for CW
        # (positive-area) triangles in y-down pixel coords.
        cr = ab[..., 0] * (p - a)[..., 1] - ab[..., 1] * (p - a)[..., 0]
        return cr / ln

    def seg_dist(a, b):
        # true (unsigned) distance to the SEGMENT ab — clamped projection.
        ab = b - a
        t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
            jnp.sum(ab * ab, axis=-1), 1e-12
        )
        t = jnp.clip(t, 0.0, 1.0)
        closest = a + t[..., None] * ab
        return math3d_length(p - closest)

    d0 = edge_line_dist(xy[..., 0, :], xy[..., 1, :])
    d1 = edge_line_dist(xy[..., 1, :], xy[..., 2, :])
    d2 = edge_line_dist(xy[..., 2, :], xy[..., 0, :])
    d_line = jnp.minimum(jnp.minimum(d0, d1), d2)
    e01 = xy[..., 1, :] - xy[..., 0, :]
    e02 = xy[..., 2, :] - xy[..., 0, :]
    area = e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0]
    # Back-facing (negative-area) triangles flip the interior side.
    d_line = jnp.where(area >= 0, d_line, -jnp.maximum(jnp.maximum(d0, d1), d2))

    # Outside the triangle, min-of-LINE-distances is wrong past edge
    # endpoints (and catastrophically so for degenerate slivers, which
    # capture their whole infinite line); use the true distance to the
    # boundary segments there.
    s0 = seg_dist(xy[..., 0, :], xy[..., 1, :])
    s1 = seg_dist(xy[..., 1, :], xy[..., 2, :])
    s2 = seg_dist(xy[..., 2, :], xy[..., 0, :])
    d_out = -jnp.minimum(jnp.minimum(s0, s1), s2)
    return jnp.where(d_line >= 0.0, d_line, d_out)


def peel_layers(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray,
    *,
    width: int,
    height: int,
    num_layers: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    cull_backface: bool = True,
    edge_margin_px: float = 0.0,
    backend: str = "auto",
    **raster_kwargs,
):
    """K depth-peeled (tri_id, depth) layers, nearest first.

    ids are (K, rows, W) int32 (−1 empty); depths (K, rows, W) (+inf empty).
    ``edge_margin_px`` dilates triangles so near-miss fragments are captured
    (set to ~3σ of the coverage sigmoid for continuous soft silhouettes).

    ``backend``: "auto" (binned Pallas kernel on TPU, jnp tiled elsewhere),
    "pallas", "pallas_interpret" or "jnp" — each peel pass rides the same
    fast raster path as the hard renderer (z_floor + dilated edges are
    first-class kernel features)."""
    if rows is None:
        rows = height
    if backend == "auto":
        backend = "pallas" if jax.default_backend() != "cpu" else "jnp"
    # The peel STRUCTURE (which triangle per layer, the z floors) is
    # non-differentiable bookkeeping — hard visibility has no gradient, and
    # the raw Pallas raster kernel has no JVP rule at all. Differentiable
    # depths are recomputed from the returned ids by the caller
    # (interpolate_corners); cutting the tape here is what makes
    # jax.grad(render_soft) work on the TPU kernel path.
    verts_clip = jax.lax.stop_gradient(verts_clip)
    ids, zs = [], []
    z_floor = jnp.full((rows, width), -jnp.inf, jnp.float32)
    for _ in range(num_layers):
        if backend in ("pallas", "pallas_interpret"):
            from .raster_pallas import rasterize_binned

            tid, z = rasterize_binned(
                verts_clip,
                tris,
                width=width,
                height=height,
                rows=rows,
                y_offset=y_offset,
                cull_backface=cull_backface,
                z_floor=z_floor,
                return_depth=True,
                edge_margin_px=edge_margin_px,
                interpret=(backend == "pallas_interpret"),
                **raster_kwargs,
            )
        else:
            tid, z = raster.rasterize(
                verts_clip,
                tris,
                width=width,
                height=height,
                rows=rows,
                y_offset=y_offset,
                cull_backface=cull_backface,
                z_floor=z_floor,
                return_depth=True,
                edge_margin_px=edge_margin_px,
                **raster_kwargs,
            )
        ids.append(tid)
        zs.append(z)
        z_floor = jnp.where(jnp.isfinite(z), z, z_floor)
    return jnp.stack(ids), jnp.stack(zs)


def soft_composite(
    layer_colors: jnp.ndarray,  # (K, H, W, 3) shaded layer colors
    layer_depth: jnp.ndarray,  # (K, H, W) — +inf where empty
    layer_signed_dist: jnp.ndarray,  # (K, H, W) px distance to silhouette
    layer_valid: jnp.ndarray,  # (K, H, W) bool
    background: jnp.ndarray,  # (H, W, 3)
    *,
    sigma: float = 1.0,  # silhouette softness in pixels
    gamma: float = 1e-2,  # depth softmax temperature (NDC units)
) -> jnp.ndarray:
    """SoftRas aggregation in two stages (continuity matters):

      1. z-resolve among FRAGMENTS only: w_k ∝ σ(d_k/sigma)·exp(−z_k/gamma)
         (softmax over the K layers).
      2. alpha-compose against the background with the MAX coverage
         A = max_k cov_k:  C = A·C_frag + (1−A)·C_bg.

    Resolving depth against the background inside one softmax would let an
    almost-zero-coverage fragment annihilate the background (exp(Δz/γ) ≫
    1/cov), making the image discontinuous when fragments enter/leave the
    peel set; the two-stage form bounds that jump by the truncated coverage.
    MAX (not the SoftRas union 1−Π(1−cov)) because an opaque silhouette edge
    is shared by two mesh triangles whose dilated coverages overlap — the
    union double-counts them, systematically inflating silhouette gradients
    ~2× (verified against finite differences)."""
    cov = jax.nn.sigmoid(layer_signed_dist / sigma)  # (K,H,W)
    cov = jnp.where(layer_valid, cov, 0.0)
    z = jnp.where(layer_valid, layer_depth, BIG_Z)

    logit = -z / gamma
    logit = logit - jnp.max(logit, axis=0, keepdims=True)
    w = cov * jnp.exp(logit)
    denom = jnp.sum(w, axis=0, keepdims=True)
    w = w / jnp.maximum(denom, 1e-12)
    c_frag = jnp.sum(w[..., None] * layer_colors, axis=0)

    alpha = jnp.max(cov, axis=0)  # (H,W)
    return alpha[..., None] * c_frag + (1.0 - alpha[..., None]) * background
