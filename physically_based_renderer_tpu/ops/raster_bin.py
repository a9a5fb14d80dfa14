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
# 14: material id (as float; exact for ids < 2^24), 15: spare
#
# G-buffer variant (``corner_channels``): three extra blocks of CH fields
# each are appended at 16 — the x/y/const plane coefficients of every
# interpolation channel, so the kernel can evaluate perspective-correct
# attributes as pure lane-wise FMAs (see raster_pallas gbuffer kernel).
NUM_FIELDS = 16
FIELD_MATERIAL = 14
GBUF_FIELD0 = 16


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedTris:
    """Sorted (tile → triangles) binning + packed per-pair kernel data."""

    packed: jnp.ndarray  # (NUM_FIELDS, PAIRS + chunk_pad) f32, field-major
    pair_tri: jnp.ndarray  # (PAIRS + chunk_pad,) i32 triangle ids (sentinel -1)
    starts: jnp.ndarray  # (ntiles + 1,) i32; [0, starts[0]) = global list
    num_pairs: jnp.ndarray  # () i32 — real pairs emitted (diagnostics)
    overflowed: jnp.ndarray  # () bool — pair capacity exceeded (pairs dropped)


def pack_triangle_fields(
    st: ScreenTris,
    face_material: jnp.ndarray | None = None,
    corner_channels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-triangle kernel constants, (T, NUM_FIELDS[+3·CH pad8]) f32.

    ``corner_channels`` (T, 3, CH): per-corner values to interpolate linearly
    in screen space (callers pass attr·(1/w) channels plus a final 1/w channel
    for perspective correction). Each channel becomes a screen-space plane
    value(p) = gx·dx + gy·dy + gc (dx,dy relative to corner v0), appended as
    three CH-wide blocks [gx | gy | gc] at field 16."""
    a, b, c0, x0, y0 = _edge_coeffs(st)  # (T,3)*3, (T,), (T,)
    inv_area = 1.0 / jnp.abs(st.area)
    za = jnp.sum(a * st.z, axis=-1) * inv_area
    zb = jnp.sum(b * st.z, axis=-1) * inv_area
    zc = jnp.sum(c0 * st.z, axis=-1) * inv_area
    zero = jnp.zeros_like(x0)
    mat = zero if face_material is None else face_material.astype(jnp.float32)
    base = jnp.stack(
        [
            a[:, 0], a[:, 1], a[:, 2],
            b[:, 0], b[:, 1], b[:, 2],
            c0[:, 0], c0[:, 1], c0[:, 2],
            x0, y0,
            za, zb, zc,
            mat, zero,
        ],
        axis=-1,
    )
    if corner_channels is None:
        return base
    # Plane coefficients per channel: value_i at the 3 corners → the linear
    # screen-space plane through them, via the same bary identity as z above.
    ch = corner_channels
    gx = jnp.einsum("ti,tic->tc", a, ch) * inv_area[:, None]
    gy = jnp.einsum("ti,tic->tc", b, ch) * inv_area[:, None]
    gc = jnp.einsum("ti,tic->tc", c0, ch) * inv_area[:, None]
    out = jnp.concatenate([base, gx, gy, gc], axis=-1)
    pad = _round_up(out.shape[-1], 8) - out.shape[-1]
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out


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
    face_material: jnp.ndarray | None = None,
    corner_channels: jnp.ndarray | None = None,
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
        # Post-sort truncation cap: real pair counts are typically ≪ T (a
        # 195k-tri scene bins ~70k pairs at 1080p/16×128 tiles), so T is a
        # generous default; ``overflowed`` flags scenes that need more.
        pairs_cap = max(num_t, 1 << 16)

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
    total = jnp.sum(jnp.where(small, span, 0)) + jnp.sum(jumbo.astype(jnp.int32))
    overflowed = total > pairs_cap  # diagnostics only (capacity is exact now)

    # DENSE pair emission — no scatters (TPU scatters were the dominant
    # binning cost): every triangle emits max_span candidate (tile, tri)
    # pairs, invalid ones keyed with the ntiles sentinel so the sort pushes
    # them to the tail; jumbo triangles emit one key −1 pair (sorts to the
    # front → the global list every tile processes).
    tri_ids = jnp.arange(num_t, dtype=jnp.int32)
    ks = jnp.arange(max_span, dtype=jnp.int32)[None, :]  # (1, S)
    r = ks // jnp.maximum(span_w, 1)[:, None]
    c = ks % jnp.maximum(span_w, 1)[:, None]
    tile_dense = (ty0[:, None] + r) * ntx + (tx0[:, None] + c)  # (T, S)
    ok_dense = small[:, None] & (ks < span[:, None])
    # Shift tiles by +1 so jumbo pairs key 0 (sort to the front) and the
    # sentinel is ntiles+1.
    keys_dense = jnp.where(ok_dense, tile_dense + 1, jnp.int32(ntiles + 1))
    keys_jumbo = jnp.where(jumbo, jnp.int32(0), jnp.int32(ntiles + 1))
    key_tiles = jnp.concatenate([keys_dense.reshape(-1), keys_jumbo])  # (slots,)
    num_slots = num_t * (max_span + 1)

    IDX_BITS = 21
    if ntiles + 2 <= (1 << (31 - IDX_BITS)) and num_slots < (1 << IDX_BITS):
        # Fast path: pack (tile+1, slot) into one int32 and run a single
        # value-free sort — the slot index decodes back to the triangle id
        # arithmetically, so no post-sort gathers at all. Keys are unique →
        # unstable sort is exact, and slot order within a tile = ascending
        # triangle id = draw order.
        slot_iota = jnp.arange(num_slots, dtype=jnp.int32)
        packed_keys = (key_tiles << IDX_BITS) | slot_iota
        sorted_keys = jnp.sort(packed_keys)[:pairs_cap]
        sorted_tile = (sorted_keys >> IDX_BITS) - 1
        slot = sorted_keys & ((1 << IDX_BITS) - 1)
        tri_from_slot = jnp.where(
            slot < num_t * max_span, slot // max_span, slot - num_t * max_span
        )
        sorted_tri = jnp.where(sorted_tile < ntiles, tri_from_slot, -1)
    else:
        # General fallback: argsort + value gathers.
        all_tris = jnp.concatenate(
            [
                jnp.broadcast_to(tri_ids[:, None], (num_t, max_span)).reshape(-1),
                tri_ids,
            ]
        )
        order = jnp.argsort(key_tiles, stable=True)
        sorted_tile = key_tiles[order][:pairs_cap] - 1
        sorted_tri = jnp.where(sorted_tile < ntiles, all_tris[order][:pairs_cap], -1)

    # starts[i] = first pair of tile i; [0, starts[0]) is the jumbo run
    # (tile key -1). searchsorted over i in [0, ntiles].
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(ntiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Pre-gather packed fields per pair, field-major; pad by one chunk so the
    # kernel's fixed-size chunk DMA never reads out of bounds.
    fields = pack_triangle_fields(st, face_material, corner_channels)  # (T, NF)
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
