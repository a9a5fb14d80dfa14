"""Triangle binning: sort triangles into per-screen-tile contiguous runs.

The TPU-idiomatic answer to "dynamic triangles-per-tile under static shapes"
(SURVEY.md §7 hard parts): instead of scanning every triangle block for every
tile (O(tiles × T), the v0 rasterizer), we

  1. compute each valid triangle's tile-bbox span,
  2. emit (tile, triangle) pairs — one per covered tile — at prefix-sum slots
     (static-size scatter, ``max_span`` pairs max per triangle),
  3. sort pairs by tile id (XLA sort, sub-ms for millions of keys),
  4. take per-tile [start, end) ranges by searchsorted.

The sorted pair array gives every tile a CONTIGUOUS run of its triangles in
HBM — exactly what the Pallas kernel wants to DMA sequentially with a
dynamic per-tile trip count. "Jumbo" triangles spanning more than
``max_span`` tiles are emitted once with tile key −1, which sorts to the
front: the range [0, starts[0]) is a global list every tile also processes.

Pair payloads are pre-gathered into a field-major (NUM_FIELDS, PAIRS) f32
array so the kernel's chunk DMA lands as (fields × lanes) with no transpose.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .raster import ScreenTris, _edge_coeffs, setup_triangles

# Field-major packed layout (rows of the (NUM_FIELDS, PAIRS) array):
# 0-2: a0,a1,a2   edge x-coefficients (vertex-relative frame)
# 3-5: b0,b1,b2   edge y-coefficients
# 6-8: c0,c1,c2   edge values at corner v0
# 9,10: x0, y0    corner v0 pixel coords
# 11-13: za,zb,zc depth plane: z(p) = za·dx + zb·dy + zc
# 14: spare, 15: spare (pad to 16 sublanes)
NUM_FIELDS = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedTris:
    """Sorted (tile → triangles) binning + packed per-pair kernel data."""

    packed: jnp.ndarray  # (NUM_FIELDS, PAIRS + chunk_pad) f32, field-major
    pair_tri: jnp.ndarray  # (PAIRS + chunk_pad,) i32 triangle ids (sentinel -1)
    starts: jnp.ndarray  # (ntiles + 1,) i32; [0, starts[0]) = global list
    num_pairs: jnp.ndarray  # () i32 — real pairs emitted (diagnostics)
    overflowed: jnp.ndarray  # () bool — pair capacity exceeded (pairs dropped)


def pack_triangle_fields(st: ScreenTris) -> jnp.ndarray:
    """Per-triangle kernel constants, (T, NUM_FIELDS) f32."""
    a, b, c0, x0, y0 = _edge_coeffs(st)  # (T,3)*3, (T,), (T,)
    inv_area = 1.0 / jnp.abs(st.area)
    za = jnp.sum(a * st.z, axis=-1) * inv_area
    zb = jnp.sum(b * st.z, axis=-1) * inv_area
    zc = jnp.sum(c0 * st.z, axis=-1) * inv_area
    zero = jnp.zeros_like(x0)
    return jnp.stack(
        [
            a[:, 0], a[:, 1], a[:, 2],
            b[:, 0], b[:, 1], b[:, 2],
            c0[:, 0], c0[:, 1], c0[:, 2],
            x0, y0,
            za, zb, zc,
            zero, zero,
        ],
        axis=-1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "rows",
        "tile_h",
        "tile_w",
        "max_span",
        "pairs_cap",
        "chunk",
    ),
)
def bin_triangles(
    st: ScreenTris,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int,
    tile_w: int,
    max_span: int = 8,
    pairs_cap: int | None = None,
    chunk: int = 128,
) -> BinnedTris:
    """Bin into the tile grid of the row band [y_offset, y_offset+rows) of a
    width×height viewport (full frame by default)."""
    if rows is None:
        rows = height
    y_off = jnp.asarray(y_offset, jnp.float32)
    num_t = st.xy.shape[0]
    ntx = -(-width // tile_w)
    nty = -(-rows // tile_h)
    ntiles = nty * ntx
    if pairs_cap is None:
        pairs_cap = max(4 * num_t, 1 << 12)

    x = st.xy[..., 0]
    y = st.xy[..., 1]
    tx0 = jnp.clip(jnp.floor(jnp.min(x, -1) / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(jnp.max(x, -1) / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(
        jnp.floor((jnp.min(y, -1) - y_off) / tile_h).astype(jnp.int32), 0, nty - 1
    )
    ty1 = jnp.clip(
        jnp.floor((jnp.max(y, -1) - y_off) / tile_h).astype(jnp.int32), 0, nty - 1
    )
    # Cull triangles entirely outside the band (bbox test) on top of st.valid.
    on_screen = (
        (jnp.max(x, -1) >= 0.0)
        & (jnp.min(x, -1) < width)
        & (jnp.max(y, -1) >= y_off)
        & (jnp.min(y, -1) < y_off + rows)
    )
    valid = st.valid & on_screen

    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    small = valid & (span <= max_span)
    jumbo = valid & (span > max_span)

    # Slot layout: jumbo pairs first (1 slot each), then small-tri pairs.
    jumbo_slots = jnp.cumsum(jumbo.astype(jnp.int32)) - jumbo.astype(jnp.int32)
    num_jumbo = jnp.sum(jumbo.astype(jnp.int32))
    small_span = jnp.where(small, span, 0)
    small_offs = num_jumbo + jnp.cumsum(small_span) - small_span
    total = num_jumbo + jnp.sum(small_span)
    overflowed = total > pairs_cap

    sentinel_tile = jnp.int32(ntiles)
    pair_tile = jnp.full((pairs_cap,), sentinel_tile, jnp.int32)
    pair_tri = jnp.full((pairs_cap,), -1, jnp.int32)
    tri_ids = jnp.arange(num_t, dtype=jnp.int32)

    # Jumbo: tile key -1 sorts to the front → global list.
    jslot = jnp.where(jumbo, jumbo_slots, pairs_cap)
    pair_tile = pair_tile.at[jslot].set(-1, mode="drop")
    pair_tri = pair_tri.at[jslot].set(tri_ids, mode="drop")

    for k in range(max_span):
        r = k // jnp.maximum(span_w, 1)
        c = k % jnp.maximum(span_w, 1)
        tile = (ty0 + r) * ntx + (tx0 + c)
        ok = small & (k < span)
        slot = jnp.where(ok, small_offs + k, pairs_cap)
        pair_tile = pair_tile.at[slot].set(tile, mode="drop")
        pair_tri = pair_tri.at[slot].set(tri_ids, mode="drop")

    order = jnp.argsort(pair_tile, stable=True)
    sorted_tile = pair_tile[order]
    sorted_tri = pair_tri[order]

    # starts[i] = first pair of tile i; [0, starts[0]) is the jumbo run
    # (tile key -1). searchsorted over i in [0, ntiles].
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(ntiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Pre-gather packed fields per pair, field-major; pad by one chunk so the
    # kernel's fixed-size chunk DMA never reads out of bounds.
    fields = pack_triangle_fields(st)  # (T, NUM_FIELDS)
    safe_tri = jnp.maximum(sorted_tri, 0)
    packed = fields[safe_tri].T  # (NUM_FIELDS, PAIRS)
    packed = jnp.pad(packed, ((0, 0), (0, chunk)))
    sorted_tri = jnp.pad(sorted_tri, (0, chunk), constant_values=-1)

    return BinnedTris(
        packed=packed,
        pair_tri=sorted_tri,
        starts=starts,
        num_pairs=jnp.minimum(total, pairs_cap),
        overflowed=overflowed,
    )
