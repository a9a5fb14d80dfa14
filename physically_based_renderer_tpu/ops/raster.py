"""Tile-based triangle rasterizer in pure JAX (XLA), forward hard-visibility.

This is the TPU-native replacement for the D3D12 hardware rasterizer stage
that sits between ``Default.hlsl`` VS and PS (reference draw path:
``PBRApp.cpp:1096-1135`` → GPU IA/RS). Design:

  * The screen is cut into VPU-aligned tiles (default 32×128 pixels).
  * For every tile we ``lax.scan`` over fixed-size triangle blocks, evaluating
    all 3 edge functions for (pixels × triangles) as one fused broadcast —
    static shapes, no data-dependent control flow, so XLA tiles it onto the
    vector unit. A running (depth, triangle-id) argmin implements the depth
    test (D3D default: depth func LESS, first-drawn wins ties).
  * Output is only the winning triangle id per pixel; barycentrics and
    attributes are *recomputed differentiably* in :func:`interpolate`, so
    ``jax.grad`` flows to vertex positions through the interpolation math
    (nvdiffrast-style "shading gradients"; soft-visibility gradients live in
    ``raster_soft.py``).

Conventions (parity with the reference pipeline):
  * clip = [x,y,z,w] from row-vector ``posW @ ViewProj``; NDC z ∈ [0,1].
  * pixel x = (ndc.x+1)/2·W, pixel y = (1−ndc.y)/2·H (y down), centers +0.5.
  * Front faces are clockwise (D3D12 default FrontCounterClockwise=FALSE);
    with y-down pixel coords these have positive signed area.
  * Near-plane clipping is per-pixel (z≥0 test); triangles with any vertex
    w ≤ eps are rejected whole (no polygon clipping — matches typical
    soft-raster practice; scenes keep geometry in front of the camera).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

W_EPS = 1e-6
BACKGROUND = jnp.int32(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScreenTris:
    """Per-triangle screen-space setup (all (T,…) arrays)."""

    xy: jnp.ndarray  # (T, 3, 2) pixel coords of the 3 corners
    z: jnp.ndarray  # (T, 3) NDC depth in [0,1]
    inv_w: jnp.ndarray  # (T, 3) 1/w for perspective-correct interpolation
    area: jnp.ndarray  # (T,) signed area ×2 (positive = front/CW)
    valid: jnp.ndarray  # (T,) bool — in-front, non-degenerate, not culled


def project_to_screen(verts_clip: jnp.ndarray, width: int, height: int):
    """Clip-space verts (V,4) → pixel-space (V,2), depth (V,), 1/w (V,)."""
    w = verts_clip[:, 3]
    inv_w = jnp.where(jnp.abs(w) > W_EPS, 1.0 / w, 0.0)
    ndc = verts_clip[:, :3] * inv_w[:, None]
    px = (ndc[:, 0] + 1.0) * (0.5 * width)
    py = (1.0 - ndc[:, 1]) * (0.5 * height)
    return jnp.stack([px, py], axis=-1), ndc[:, 2], inv_w


def _setup_from_corner_data(xy, z, inv_w, w, cull_backface, tri_mask) -> ScreenTris:
    """Common setup tail: signed area, facing/in-front validity."""
    e01 = xy[:, 1] - xy[:, 0]
    e02 = xy[:, 2] - xy[:, 0]
    area = e01[:, 0] * e02[:, 1] - e01[:, 1] * e02[:, 0]

    in_front = jnp.all(w > W_EPS, axis=-1)
    if cull_backface:
        facing = area > 1e-12
    else:
        facing = jnp.abs(area) > 1e-12
    valid = in_front & facing
    if tri_mask is not None:
        valid = valid & tri_mask
    return ScreenTris(xy=xy, z=z, inv_w=inv_w, area=area, valid=valid)


def setup_triangles(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray,
    width: int,
    height: int,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
) -> ScreenTris:
    """Gather per-triangle corner data and compute validity/culling.

    All per-vertex quantities are packed into ONE 8-lane-aligned table and
    fetched with a single corner gather: TPU gathers are row-latency-bound,
    and 32-byte-aligned rows gather ~6× faster than narrow ones (measured),
    so one (V,8) gather beats four narrow ones by >4×. (The corner-major
    hot path, :func:`setup_corners`, avoids even this gather.)"""
    xy_all, z_all, invw_all = project_to_screen(verts_clip, width, height)
    w_all = verts_clip[:, 3]

    zero = jnp.zeros_like(w_all)
    table = jnp.stack(
        [xy_all[:, 0], xy_all[:, 1], z_all, invw_all, w_all, zero, zero, zero],
        axis=-1,
    )  # (V, 8)
    g = table[tris]  # (T, 3, 8) — the single corner gather
    return _setup_from_corner_data(
        g[..., 0:2], g[..., 2], g[..., 3], g[..., 4], cull_backface, tri_mask
    )


def project_corners(corner_clip: jnp.ndarray, width: int, height: int):
    """Corner-major clip (T,3,4) → pixel xy (T,3,2), depth (T,3), 1/w (T,3)."""
    w = corner_clip[..., 3]
    inv_w = jnp.where(jnp.abs(w) > W_EPS, 1.0 / w, 0.0)
    ndc = corner_clip[..., :3] * inv_w[..., None]
    px = (ndc[..., 0] + 1.0) * (0.5 * width)
    py = (1.0 - ndc[..., 1]) * (0.5 * height)
    return jnp.stack([px, py], axis=-1), ndc[..., 2], inv_w


def setup_corners(
    corner_clip: jnp.ndarray,
    width: int,
    height: int,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
) -> ScreenTris:
    """Setup from CORNER-MAJOR clip coordinates (T,3,4): pure vector math,
    zero gathers — the hot-path variant of :func:`setup_triangles` (see
    ``models.scene.CornerGeometry``)."""
    xy, z, inv_w = project_corners(corner_clip, width, height)
    return _setup_from_corner_data(
        xy, z, inv_w, corner_clip[..., 3], cull_backface, tri_mask
    )


def _edge_coeffs(st: ScreenTris):
    """Edge-function coefficients in a vertex-relative frame:
    e_i(p) = A_i·(px−x0) + B_i·(py−y0) + C0_i, where e_i is the edge
    *opposite* corner i (so bary_i = e_i / |area|) and (x0, y0) is corner 0.

    The relative form is crucial for fp32: the classic global constant
    x_j·y_k − x_k·y_j cancels catastrophically at screen coordinates ~10³
    (products ~10⁶ vs edge values ~10⁰), which punches speckle holes through
    thin silhouette triangles. All terms here are coordinate differences.
    Returns (a, b, c0, x0, y0)."""
    x, y = st.xy[..., 0], st.xy[..., 1]  # (T,3)
    # edge opposite vertex 0 runs 1→2, opposite 1 runs 2→0, opposite 2 runs 0→1
    j = jnp.asarray([1, 2, 0])
    k = jnp.asarray([2, 0, 1])
    a = y[:, j] - y[:, k]
    b = x[:, k] - x[:, j]
    # c0_i = e_i(v0) = (x_k−x_j)(y_0−y_j) − (y_k−y_j)(x_0−x_j)
    c0 = (x[:, k] - x[:, j]) * (y[:, 0:1] - y[:, j]) - (y[:, k] - y[:, j]) * (
        x[:, 0:1] - x[:, j]
    )
    # Orient so that inside ⇒ e_i ≥ 0 regardless of winding sign:
    s = jnp.sign(st.area)[:, None]
    return a * s, b * s, c0 * s, x[:, 0], y[:, 0]


def _tile_pixel_centers(ty, tx, tile_h, tile_w, y_offset):
    py = (
        y_offset + ty * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    ).astype(jnp.float32) + 0.5
    px = (tx * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)).astype(
        jnp.float32
    ) + 0.5
    return px, py


def _pad_tris(a: jnp.ndarray, block: int, fill=0):
    t = a.shape[0]
    pad = (-t) % block
    if pad == 0:
        return a
    pad_width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad_width, constant_values=fill)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "rows",
        "tile_h",
        "tile_w",
        "tri_block",
        "cull_backface",
        "return_depth",
        "edge_margin_px",
    ),
)
def rasterize(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray | None,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 32,
    tile_w: int = 128,
    tri_block: int = 128,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
    z_floor: jnp.ndarray | None = None,
    return_depth: bool = False,
    edge_margin_px: float = 0.0,
) -> jnp.ndarray:
    """Hard rasterization → winning triangle id per pixel, (rows, W) int32,
    BACKGROUND (-1) where nothing was drawn. Depth test: LESS, z ∈ [0,1].

    ``width``/``height`` define the full viewport (the projection); the
    output covers global pixel rows [y_offset, y_offset+rows) — the band API
    that screen-tile sharding uses to give each chip its slice of the frame.
    ``y_offset`` may be traced (e.g. derived from ``lax.axis_index``).
    Non-tile-multiple bands are padded up to the tile grid and cropped.

    ``z_floor`` (rows, W): only fragments with z strictly greater are
    accepted — the depth-peeling hook for the soft/differentiable renderer.
    ``return_depth=True`` → (tri_id, depth) with depth=+inf at background.
    ``edge_margin_px`` dilates every triangle by that many pixels (edge test
    e_i ≥ −margin·|∇e_i|) so the soft renderer captures near-miss fragments
    — SoftRas silhouette blur support. 0 = exact coverage."""
    if rows is None:
        rows = height
    pad_h = (-rows) % tile_h
    pad_w = (-width) % tile_w
    if tris is None:  # corner-major input: verts_clip is (T,3,4)
        st = setup_corners(verts_clip, width, height, cull_backface, tri_mask)
    else:
        st = setup_triangles(verts_clip, tris, width, height, cull_backface, tri_mask)
    rows_p, width_p = rows + pad_h, width + pad_w
    y_offset = jnp.asarray(y_offset, jnp.float32)
    ea, eb, ec, ex0, ey0 = _edge_coeffs(st)

    num_t = st.xy.shape[0]
    nblocks = -(-num_t // tri_block)

    # Pack per-triangle data, padded to block multiple. Padded tris invalid.
    if edge_margin_px > 0.0:
        margin = edge_margin_px * jnp.sqrt(ea * ea + eb * eb)  # (T,3)
    else:
        margin = jnp.zeros_like(ea)
    ea_p = _pad_tris(ea, tri_block)
    eb_p = _pad_tris(eb, tri_block)
    ec_p = _pad_tris(ec, tri_block)
    em_p = _pad_tris(margin, tri_block)
    ex0_p = _pad_tris(ex0, tri_block)
    ey0_p = _pad_tris(ey0, tri_block)
    z_p = _pad_tris(st.z, tri_block)
    area_p = _pad_tris(st.area, tri_block, fill=1.0)
    valid_p = _pad_tris(st.valid, tri_block, fill=False)

    # Per-triangle screen bbox for block-level tile rejection.
    x_min = jnp.min(st.xy[..., 0], axis=-1)
    x_max = jnp.max(st.xy[..., 0], axis=-1)
    y_min = jnp.min(st.xy[..., 1], axis=-1)
    y_max = jnp.max(st.xy[..., 1], axis=-1)
    big = jnp.float32(1e30)
    x_min = _pad_tris(jnp.where(st.valid, x_min, big), tri_block, fill=big)
    y_min = _pad_tris(jnp.where(st.valid, y_min, big), tri_block, fill=big)
    x_max = _pad_tris(jnp.where(st.valid, x_max, -big), tri_block, fill=-big)
    y_max = _pad_tris(jnp.where(st.valid, y_max, -big), tri_block, fill=-big)
    # Per-triangle bbox per block (for dilated capture bounding)
    x_min_bt = x_min.reshape(nblocks, tri_block)
    x_max_bt = x_max.reshape(nblocks, tri_block)
    y_min_bt = y_min.reshape(nblocks, tri_block)
    y_max_bt = y_max.reshape(nblocks, tri_block)
    # Block-level bbox (min over block of mins, etc.)
    bx0 = jnp.min(x_min_bt, axis=1)
    bx1 = jnp.max(x_max_bt, axis=1)
    by0 = jnp.min(y_min_bt, axis=1)
    by1 = jnp.max(y_max_bt, axis=1)

    shape_b = (nblocks, tri_block)
    ea_b = ea_p.reshape(nblocks, tri_block, 3)
    eb_b = eb_p.reshape(nblocks, tri_block, 3)
    ec_b = ec_p.reshape(nblocks, tri_block, 3)
    em_b = em_p.reshape(nblocks, tri_block, 3)
    ex0_b = ex0_p.reshape(shape_b)
    ey0_b = ey0_p.reshape(shape_b)
    z_b = z_p.reshape(*shape_b, 3)
    area_b = area_p.reshape(shape_b)
    valid_b = valid_p.reshape(shape_b)
    tid_b = jax.lax.broadcasted_iota(jnp.int32, shape_b, 0) * tri_block + (
        jax.lax.broadcasted_iota(jnp.int32, shape_b, 1)
    )

    tiles_y = rows_p // tile_h
    tiles_x = width_p // tile_w

    if z_floor is not None:
        zf_tiles = (
            jnp.pad(z_floor, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf)
            .reshape(tiles_y, tile_h, tiles_x, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tiles_x, tile_h, tile_w)
        )
    else:
        zf_tiles = None

    def raster_tile(tile_idx):
        ty = tile_idx // tiles_x
        tx = tile_idx % tiles_x
        px, py = _tile_pixel_centers(ty, tx, tile_h, tile_w, y_offset)
        zf = zf_tiles[tile_idx] if zf_tiles is not None else None

        tile_x0 = (tx * tile_w).astype(jnp.float32)
        tile_y0 = y_offset + (ty * tile_h).astype(jnp.float32)
        tile_x1 = tile_x0 + tile_w
        tile_y1 = tile_y0 + tile_h

        def block_step(carry, blk):
            best_z, best_id = carry
            (
                ea_k,
                eb_k,
                ec_k,
                em_k,
                ex0_k,
                ey0_k,
                z_k,
                area_k,
                valid_k,
                tid_k,
                x_min_b,
                x_max_b,
                y_min_b,
                y_max_b,
                b0x,
                b1x,
                b0y,
                b1y,
            ) = blk

            mg = edge_margin_px
            overlaps = (
                (b0x <= tile_x1 + mg)
                & (b1x >= tile_x0 - mg)
                & (b0y <= tile_y1 + mg)
                & (b1y >= tile_y0 - mg)
            )

            def do_block(carry):
                best_z, best_id = carry
                # e[p, t, i] = A[t,i]·(px−x0[t]) + B[t,i]·(py−y0[t]) + C0[t,i]
                # (vertex-relative for fp32 stability — see _edge_coeffs)
                e = (
                    (px[..., None, None] - ex0_k[:, None]) * ea_k
                    + (py[..., None, None] - ey0_k[:, None]) * eb_k
                    + ec_k
                )  # (th, tw, TB, 3)
                inside = jnp.all(e >= -em_k, axis=-1) & valid_k  # (th, tw, TB)
                if edge_margin_px > 0.0:
                    # Dilated bands of sliver/degenerate triangles extend far
                    # along their line; bound capture to the bbox + margin.
                    inside = (
                        inside
                        & (px[..., None] >= x_min_b - edge_margin_px)
                        & (px[..., None] <= x_max_b + edge_margin_px)
                        & (py[..., None] >= y_min_b - edge_margin_px)
                        & (py[..., None] <= y_max_b + edge_margin_px)
                    )
                # e was re-oriented by sign(area), so Σe = |area|: normalise by |area|
                bary = e / jnp.abs(area_k)[:, None]  # (th,tw,TB,3)
                zpix = jnp.sum(bary * z_k, axis=-1)  # (th, tw, TB)
                if edge_margin_px > 0.0:
                    # Dilated pixels extrapolate z along the triangle plane —
                    # grazing silhouette triangles diverge. Clamp to the
                    # vertex z range (no-op for truly-interior pixels).
                    zpix = jnp.clip(
                        zpix, jnp.min(z_k, axis=-1), jnp.max(z_k, axis=-1)
                    )
                ok = inside & (zpix >= 0.0) & (zpix <= 1.0)
                if zf is not None:
                    ok = ok & (zpix > zf[..., None])  # depth peeling
                zpix = jnp.where(ok, zpix, jnp.inf)
                # Within-block depth argmin (first-drawn wins ties → argmin
                # picks lowest index on ties, matching draw order).
                k = jnp.argmin(zpix, axis=-1)  # (th, tw)
                zk = jnp.take_along_axis(zpix, k[..., None], axis=-1)[..., 0]
                idk = tid_k[k]
                better = zk < best_z
                return jnp.where(better, zk, best_z), jnp.where(better, idk, best_id)

            new_carry = jax.lax.cond(overlaps, do_block, lambda c: c, (best_z, best_id))
            return new_carry, None

        # Fold zero terms of every potentially shard_map-varying input into
        # the init so the carry has the same varying-axis type as do_block's
        # output (y_offset varies under row sharding; tri data/masks vary
        # under triangle sharding). All terms are exactly zero.
        vary_f = 0.0 * y_offset + 0.0 * jnp.sum(ea_b[0, 0, :]) * 0.0 + jnp.sum(
            valid_b[0, :1].astype(jnp.float32)
        ) * 0.0
        vary_i = vary_f.astype(jnp.int32)
        init = (
            jnp.full((tile_h, tile_w), jnp.inf, jnp.float32) + vary_f,
            jnp.full((tile_h, tile_w), BACKGROUND, jnp.int32) + vary_i,
        )
        (best_z, best_id), _ = jax.lax.scan(
            block_step,
            init,
            (
                ea_b,
                eb_b,
                ec_b,
                em_b,
                ex0_b,
                ey0_b,
                z_b,
                area_b,
                valid_b,
                tid_b,
                x_min_bt,
                x_max_bt,
                y_min_bt,
                y_max_bt,
                bx0,
                bx1,
                by0,
                by1,
            ),
        )
        return best_id, best_z

    tile_ids, tile_z = jax.lax.map(raster_tile, jnp.arange(tiles_y * tiles_x))

    def untile(t):
        return (
            t.reshape(tiles_y, tiles_x, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(rows_p, width_p)[:rows, :width]
        )

    if return_depth:
        return untile(tile_ids), untile(tile_z)
    return untile(tile_ids)


def rasterize_brute(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray | None,
    *,
    width: int,
    height: int,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Oracle: all pixels × all triangles in one broadcast. O(H·W·T) memory —
    only for small test images. Must agree exactly with :func:`rasterize`.
    ``tris=None`` → corner-major ``verts_clip`` (T,3,4)."""
    if tris is None:
        st = setup_corners(verts_clip, width, height, cull_backface, tri_mask)
    else:
        st = setup_triangles(verts_clip, tris, width, height, cull_backface, tri_mask)
    ea, eb, ec, ex0, ey0 = _edge_coeffs(st)
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    e = (
        (px[..., None, None] - ex0[:, None]) * ea
        + (py[..., None, None] - ey0[:, None]) * eb
        + ec
    )  # (H,W,T,3)
    inside = jnp.all(e >= 0.0, axis=-1) & st.valid
    bary = e / jnp.abs(st.area)[:, None]
    z = jnp.sum(bary * st.z, axis=-1)
    ok = inside & (z >= 0.0) & (z <= 1.0)
    z = jnp.where(ok, z, jnp.inf)
    best = jnp.argmin(z, axis=-1).astype(jnp.int32)
    hit = jnp.isfinite(jnp.min(z, axis=-1))
    return jnp.where(hit, best, BACKGROUND)


def compute_barycentrics(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray,
    tri_id: jnp.ndarray,
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
    clamp: bool = False,
):
    """Differentiable per-pixel barycentrics for the winning triangles.

    Returns (bary_persp (H,W,3), bary_screen (H,W,3), depth (H,W), mask (H,W)).
    Gradients flow to ``verts_clip`` through the edge/area math; ``tri_id``
    (int) contributes none, mirroring hard-visibility shading gradients.

    ``clamp=True`` projects barycentrics onto [0,1]³ and renormalises —
    needed when ``tri_id`` comes from a dilated (soft) raster pass, where
    pixels slightly outside their triangle would otherwise extrapolate
    attributes off the surface."""
    xy_all, z_all, invw_all = project_to_screen(verts_clip, width, height)
    safe_id = jnp.maximum(tri_id, 0)
    corner = tris[safe_id]  # (H,W,3)
    xy = xy_all[corner]  # (H,W,3,2)
    z = z_all[corner]
    inv_w = invw_all[corner]

    py = (
        jnp.asarray(y_offset, jnp.float32)
        + jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 0)
        + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 1) + 0.5
    p = jnp.stack([px, py], axis=-1)  # (H,W,2)

    def edge(pa, pb, pt):
        return (pt[..., 0] - pa[..., 0]) * (pb[..., 1] - pa[..., 1]) - (
            pt[..., 1] - pa[..., 1]
        ) * (pb[..., 0] - pa[..., 0])

    e0 = edge(xy[..., 1, :], xy[..., 2, :], p)
    e1 = edge(xy[..., 2, :], xy[..., 0, :], p)
    e2 = edge(xy[..., 0, :], xy[..., 1, :], p)
    area = e0 + e1 + e2
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    bary = jnp.stack([e0, e1, e2], axis=-1) / area[..., None]
    if clamp:
        bary = jnp.clip(bary, 0.0, 1.0)
        bary = bary / jnp.maximum(jnp.sum(bary, axis=-1, keepdims=True), 1e-12)

    depth = jnp.sum(bary * z, axis=-1)
    pw = bary * inv_w
    denom = jnp.sum(pw, axis=-1, keepdims=True)
    bary_persp = pw / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)

    mask = tri_id >= 0
    return bary_persp, bary, depth, mask


def interpolate_packed(
    packed_attrs: jnp.ndarray,  # (V, C) vertex attributes to interpolate
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray,
    tri_id: jnp.ndarray,
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
    clamp: bool = False,
):
    """Fused barycentric computation + attribute interpolation.

    Packs the screen-space corner data (xy, z, 1/w) together with the caller
    attributes so the whole G-buffer stage costs ONE (H·W, 3)-corner gather
    (and one scatter-add in the backward) instead of one per attribute —
    gathers are the dominant cost of the deferred stage on TPU.

    Returns (attrs (H,W,C), depth (H,W), mask (H,W)).
    """
    xy_all, z_all, invw_all = project_to_screen(verts_clip, width, height)
    packed = jnp.concatenate(
        [packed_attrs, xy_all, z_all[:, None], invw_all[:, None]], axis=-1
    )  # (V, C+4)
    c = packed_attrs.shape[-1]
    pad = (-(c + 4)) % 8  # 32-byte-align rows: aligned gathers are ~6× faster
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))

    # TPU gathers are latency-bound per ROW (~8 ns regardless of row width),
    # so repack per-TRIANGLE (all 3 corners side by side, built with 3 cheap
    # T-sized gathers) and fetch ONE wide row per pixel instead of three.
    cp = c + 4 + pad
    tri_table = packed[tris].reshape(tris.shape[0], 3 * cp)  # (T, 3·cp)
    from .texture import pad_gather_rows

    tri_table = pad_gather_rows(tri_table)  # avoid the slow-gather row zone
    data = tri_table[jnp.maximum(tri_id, 0)].reshape(*tri_id.shape, 3, cp)
    return _interp_from_rows(data, c, tri_id, y_offset, clamp)


def interpolate_corners(
    corner_attrs: jnp.ndarray,  # (T, 3, C) corner-major attributes
    corner_clip: jnp.ndarray,  # (T, 3, 4) corner-major clip coords
    tri_id: jnp.ndarray,
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
    clamp: bool = False,
):
    """Corner-major twin of :func:`interpolate_packed`: the per-triangle
    table is a pure reshape of the corner-major arrays (no [tris] gather),
    leaving the per-pixel row fetch as the only gather of the G-buffer stage.

    Returns (attrs (H,W,C), depth (H,W), mask (H,W))."""
    xy_c, z_c, invw_c = project_corners(corner_clip, width, height)
    c = corner_attrs.shape[-1]
    packed = jnp.concatenate(
        [corner_attrs, xy_c, z_c[..., None], invw_c[..., None]], axis=-1
    )  # (T, 3, C+4)
    pad = (-(c + 4)) % 8  # 32-byte-align rows: aligned gathers are ~6× faster
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    cp = c + 4 + pad
    tri_table = packed.reshape(packed.shape[0], 3 * cp)
    from .texture import pad_gather_rows

    tri_table = pad_gather_rows(tri_table)  # avoid the slow-gather row zone
    data = tri_table[jnp.maximum(tri_id, 0)].reshape(*tri_id.shape, 3, cp)
    return _interp_from_rows(data, c, tri_id, y_offset, clamp)


def _interp_from_rows(data, c, tri_id, y_offset, clamp):
    """Shared per-pixel interpolation tail: edge/bary math on gathered
    corner rows ``data`` (..., 3, cp) with layout [attrs(c), xy, z, 1/w]."""
    xy = data[..., c : c + 2]
    z = data[..., c + 2]
    inv_w = data[..., c + 3]

    py = (
        jnp.asarray(y_offset, jnp.float32)
        + jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 0)
        + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.float32, tri_id.shape, 1) + 0.5
    p = jnp.stack([px, py], axis=-1)

    def edge(pa, pb, pt):
        return (pt[..., 0] - pa[..., 0]) * (pb[..., 1] - pa[..., 1]) - (
            pt[..., 1] - pa[..., 1]
        ) * (pb[..., 0] - pa[..., 0])

    e0 = edge(xy[..., 1, :], xy[..., 2, :], p)
    e1 = edge(xy[..., 2, :], xy[..., 0, :], p)
    e2 = edge(xy[..., 0, :], xy[..., 1, :], p)
    area = e0 + e1 + e2
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    bary = jnp.stack([e0, e1, e2], axis=-1) / area[..., None]
    if clamp:
        bary = jnp.clip(bary, 0.0, 1.0)
        bary = bary / jnp.maximum(jnp.sum(bary, axis=-1, keepdims=True), 1e-12)

    depth = jnp.sum(bary * z, axis=-1)
    pw = bary * inv_w
    denom = jnp.sum(pw, axis=-1, keepdims=True)
    bary_persp = pw / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)

    attrs = jnp.sum(bary_persp[..., None] * data[..., :c], axis=-2)
    mask = tri_id >= 0
    return attrs, depth, mask


def interpolate(attr: jnp.ndarray, tris: jnp.ndarray, tri_id: jnp.ndarray, bary: jnp.ndarray):
    """Perspective-correct vertex-attribute interpolation.

    attr: (V, C) vertex attributes; tri_id: (H,W); bary: (H,W,3).
    Returns (H,W,C). Background pixels get garbage (mask separately).
    """
    corner = tris[jnp.maximum(tri_id, 0)]  # (H,W,3)
    vals = attr[corner]  # (H,W,3,C)
    return jnp.sum(bary[..., None] * vals, axis=-2)
