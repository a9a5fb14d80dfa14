"""Triangle binning: sort triangles into per-screen-tile contiguous runs.

The TPU-idiomatic answer to "dynamic triangles-per-tile under static shapes"
(SURVEY.md §7 hard parts): instead of scanning every triangle block for every
tile (O(tiles × T), the v0 rasterizer), we

  1. compute each valid triangle's tile-bbox span,
  2. emit (tile, triangle) pair slots, CLASS-BASED to keep the sort small
     (the sort is the dominant binning cost): 2 slots for span≤2 triangles
     (first+last bbox tile — exact coverage), ``max_span`` dense slots for a
     compacted block of bigger triangles, and a single front-sorting jumbo
     slot for anything larger (or overflowing the big block),
  3. sort packed (tile, tri) int32 keys (XLA sort — the triangle id decodes
     arithmetically from the key, no post-sort gathers),
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
# 14: material id (as float; exact for ids < 2^24)
# 15: constant 1.0 (spare; rides the winner-extraction matmul unchanged, so
#     it doubles as a duplicate-pair count if ever needed)
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


@functools.cache
def _backend_supports_callbacks() -> bool:
    """The axon tunnel PJRT plugin cannot host jax.debug callbacks
    (UNIMPLEMENTED host send/recv); CPU and regular TPU/GPU backends can."""
    try:
        from jax._src import xla_bridge

        ver = getattr(xla_bridge.get_backend(), "platform_version", "") or ""
        return "axon" not in ver.lower()
    except Exception:
        return False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedTris:
    """Sorted (tile → triangles) binning + packed per-pair kernel data.

    ``packed`` is field-major (NUM_FIELDS, PAIRS+pad) by default; with
    ``bin_triangles(pair_major=True)`` it is PAIR-major (PAIRS+pad, NF) —
    the layout the row-layout kernels (``ops/raster_row``) DMA, where a
    sub-chunk of pairs lands on sublanes and fields on lanes."""

    packed: jnp.ndarray  # (NUM_FIELDS, PAIRS + chunk_pad) f32, field-major
    pair_tri: jnp.ndarray  # (PAIRS + chunk_pad,) i32 triangle ids (sentinel -1)
    starts: jnp.ndarray  # (ntiles + 1,) i32; [0, starts[0]) = global list
    num_pairs: jnp.ndarray  # () i32 — real pairs emitted (diagnostics)
    overflowed: jnp.ndarray  # () bool — pair capacity exceeded (pairs dropped)


def pack_triangle_fields(
    st: ScreenTris,
    face_material: jnp.ndarray | None = None,
    corner_channels: jnp.ndarray | None = None,
    normalize_edges: bool = False,
) -> jnp.ndarray:
    """Per-triangle kernel constants, (T, NUM_FIELDS[+3·CH pad8]) f32.

    ``corner_channels`` (T, 3, CH): per-corner values to interpolate linearly
    in screen space (callers pass attr·(1/w) channels plus a final 1/w channel
    for perspective correction). Each channel becomes a screen-space plane
    value(p) = gx·dx + gy·dy + gc (dx,dy relative to corner v0), appended as
    three CH-wide blocks [gx | gy | gc] at field 16."""
    a, b, c0, x0, y0 = _edge_coeffs(st)  # (T,3)*3, (T,), (T,)
    inv_area = 1.0 / jnp.abs(st.area)
    za_src, zb_src, zc_src = a, b, c0  # depth plane uses the RAW edges
    if normalize_edges:
        # Scale each edge function to unit gradient (÷|∇e| = √(a²+b²)) so the
        # kernel's dilated test ``e ≥ −margin`` measures margin in PIXELS —
        # the Pallas analog of the jnp rasterizer's e ≥ −margin·|∇e| test.
        # Sign (= coverage at margin 0) is unchanged; only enabled for the
        # soft/dilated path to keep the hard path bit-exact vs the jnp one.
        inv_len = jax.lax.rsqrt(jnp.maximum(a * a + b * b, 1e-20))
        a = a * inv_len
        b = b * inv_len
        c0 = c0 * inv_len
    za = jnp.sum(za_src * st.z, axis=-1) * inv_area
    zb = jnp.sum(zb_src * st.z, axis=-1) * inv_area
    zc = jnp.sum(zc_src * st.z, axis=-1) * inv_area
    zero = jnp.zeros_like(x0)
    one = jnp.ones_like(x0)
    mat = zero if face_material is None else face_material.astype(jnp.float32)
    base = jnp.stack(
        [
            a[:, 0], a[:, 1], a[:, 2],
            b[:, 0], b[:, 1], b[:, 2],
            c0[:, 0], c0[:, 1], c0[:, 2],
            x0, y0,
            za, zb, zc,
            mat, one,
        ],
        axis=-1,
    )
    if corner_channels is None:
        return base
    # Plane coefficients per channel: value_i at the 3 corners → the linear
    # screen-space plane through them, via the same bary identity as z above.
    ch = corner_channels
    gx = jnp.einsum("ti,tic->tc", za_src, ch) * inv_area[:, None]
    gy = jnp.einsum("ti,tic->tc", zb_src, ch) * inv_area[:, None]
    gc = jnp.einsum("ti,tic->tc", zc_src, ch) * inv_area[:, None]
    out = jnp.concatenate([base, gx, gy, gc], axis=-1)
    pad = _round_up(out.shape[-1], 8) - out.shape[-1]
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out


def check_binning_invariants(binned: "BinnedTris", num_tris: int) -> None:
    """On-device validation of the binning contract (the SURVEY §5 checkify
    plan — the D3D12-debug-layer analog for the raster path). Must run under
    ``jax.experimental.checkify.checkify``; each violated invariant raises
    loudly through ``err.throw()``:

      * pair-cap occupancy — no silent overflow (dropped triangles),
      * run bounds — ``starts`` monotone, within the pair array, jumbo
        count non-negative (every range the kernel DMAs is in bounds),
      * pair payload — triangle ids within [−1, T).
    """
    from jax.experimental import checkify

    starts = binned.starts
    pairs = binned.pair_tri.shape[0]
    checkify.check(
        jnp.logical_not(binned.overflowed),
        "raster binning overflow: pair cap exceeded, triangles dropped "
        "(raise raster_pairs_cap)",
    )
    checkify.check(
        jnp.all(starts[1:] >= starts[:-1]),
        "binning run bounds corrupt: starts not monotone",
    )
    checkify.check(
        (starts[0] >= 0) & (starts[-1] <= pairs),
        "binning run bounds out of range: jumbo={j} end={e} pairs=" + str(pairs),
        j=starts[0],
        e=starts[-1],
    )
    checkify.check(
        jnp.all((binned.pair_tri >= -1) & (binned.pair_tri < num_tris)),
        "binning pair payload corrupt: triangle id out of [-1, T)",
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
        "big_cap",
        "big2_span",
        "big2_cap",
        "bbox_margin_px",
        "pair_major",
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
    big_cap: int | None = None,
    big2_span: int = 0,
    big2_cap: int | None = None,
    bbox_margin_px: float = 0.0,
    pair_major: bool = False,
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

    # ``bbox_margin_px`` dilates every bbox (and the band cull) so the
    # kernel's dilated edge test (soft-raster near-miss capture) sees every
    # pixel within that distance of the triangle.
    mg = float(bbox_margin_px)
    x = st.xy[..., 0]
    y = st.xy[..., 1]
    tx0 = jnp.clip(
        jnp.floor((jnp.min(x, -1) - mg) / tile_w).astype(jnp.int32), 0, ntx - 1
    )
    tx1 = jnp.clip(
        jnp.floor((jnp.max(x, -1) + mg) / tile_w).astype(jnp.int32), 0, ntx - 1
    )
    ty0 = jnp.clip(
        jnp.floor((jnp.min(y, -1) - mg - y_off) / tile_h).astype(jnp.int32), 0, nty - 1
    )
    ty1 = jnp.clip(
        jnp.floor((jnp.max(y, -1) + mg - y_off) / tile_h).astype(jnp.int32), 0, nty - 1
    )
    # Cull triangles entirely outside the band (bbox test) on top of st.valid.
    on_screen = (
        (jnp.max(x, -1) >= -mg)
        & (jnp.min(x, -1) < width + mg)
        & (jnp.max(y, -1) >= y_off - mg)
        & (jnp.min(y, -1) < y_off + rows + mg)
    )
    valid = st.valid & on_screen

    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    tri_ids = jnp.arange(num_t, dtype=jnp.int32)
    SENT = jnp.int32(ntiles + 1)  # sentinel tile: sorts to the tail

    # CLASS-BASED pair emission — no scatters (TPU scatters were the
    # dominant binning cost), and far fewer sort keys than dense max_span
    # emission (the sort is the dominant binning cost after that):
    #   * span ≤ 2   → 2 slots: the bbox's first and last tile (which ARE
    #                  its only tiles for 1×1/1×2/2×1 bboxes) — the
    #                  overwhelming case for production triangle sizes.
    #   * 2 < span ≤ max_span → a compacted "big" block: the big triangles
    #                  are ranked by one T-key sort and the first big_cap
    #                  of them emit max_span dense slots each.
    #   * max_span < span ≤ big2_span (when enabled) → a second, smaller
    #                  compacted block of big2_span dense slots — catches
    #                  the tail of mid-size triangles that would otherwise
    #                  go jumbo. A jumbo run taxes EVERY tile (the kernel's
    #                  global rescan): on the 12k-tri mori_knob view, 109
    #                  jumbos at max_span=64 put one extra chunk in front
    #                  of all ~4000 tiles — ~40% of the kernel's work for a
    #                  floor-dominated scene (round-4 profiling).
    #   * beyond, or block overflow → jumbo: ONE slot with tile key −1,
    #                  sorting to the front — a global run every tile
    #                  processes.
    # Classes are disjoint for every max_span value: span≤2 triangles always
    # take the exact 2-slot path (even when max_span < 2), so the jumbo
    # threshold is effectively max(2, max_span).
    small2 = valid & (span <= 2)
    big = valid & (span > 2) & (span <= max_span)
    jumbo = valid & (span > max(2, max_span))
    big2 = None
    if big2_span > max_span:
        big2 = jumbo & (span <= big2_span)
        jumbo = jumbo & (span > big2_span)

    if big_cap is None:
        if max_span >= 32:
            # Wide spans (small scenes, see renderer's adaptive max_span):
            # bound the dense big-block emission (big_cap × max_span sort
            # keys) — spilled bigs fall back to jumbo, still correct.
            big_cap = max(4096, num_t // 4)
        elif num_t <= (1 << 16):
            big_cap = num_t  # small scenes: all fit, no ranking sort
        else:
            big_cap = max(4096, num_t // 8)
    big_cap = min(big_cap, num_t)

    if big_cap < num_t:
        # Rank big triangles: one value-free T-key sort (big first, by id)
        # for the compacted id list, and a cumsum for the per-triangle rank
        # (NOT searchsorted — its log-n binary-search rounds are each a
        # latency-bound gather, ~14 ms at 195k queries).
        bsort = jnp.sort(jnp.where(big, tri_ids, tri_ids + num_t))
        btri = bsort[:big_cap] % num_t  # candidate big tris (may be dead)
        bvalid = bsort[:big_cap] < num_t
        rank = jnp.cumsum(big.astype(jnp.int32)) - 1  # rank of big tri i
        spilled = big & (rank >= big_cap)  # overflow → jumbo (correct, slow)
    else:
        btri = tri_ids
        bvalid = big
        spilled = jnp.zeros_like(big)
    jumbo_all = jumbo | spilled

    if big2 is not None:
        bc2 = min(big2_cap if big2_cap is not None else 512, num_t)
        b2sort = jnp.sort(jnp.where(big2, tri_ids, tri_ids + num_t))
        b2tri = b2sort[:bc2] % num_t
        b2valid = b2sort[:bc2] < num_t
        rank2 = jnp.cumsum(big2.astype(jnp.int32)) - 1
        spilled2 = big2 & (rank2 >= bc2)
        jumbo_all = jumbo_all | spilled2
    else:
        spilled2 = None

    tile_first = ty0 * ntx + tx0
    tile_last = ty1 * ntx + tx1
    k0_tile = jnp.where(
        jumbo_all, jnp.int32(-1), jnp.where(small2, tile_first, SENT - 1)
    )
    k1_tile = jnp.where(small2 & (span > 1), tile_last, SENT - 1)

    # Big block: gather bbox data for the compacted candidates (one aligned
    # 8-lane gather), emit max_span dense slots each.
    btab = jnp.stack(
        [tx0, ty0, span_w, span, tx0, ty0, span_w, span], axis=-1
    )  # (T, 8) i32
    bg = btab[btri]  # (big_cap, 8)
    ks = jnp.arange(max_span, dtype=jnp.int32)[None, :]  # (1, S)
    bw = jnp.maximum(bg[:, 2:3], 1)
    r = ks // bw
    c = ks % bw
    btile = (bg[:, 1:2] + r) * ntx + (bg[:, 0:1] + c)  # (big_cap, S)
    bok = bvalid[:, None] & (ks < bg[:, 3:4])
    kb_tile = jnp.where(bok, btile, SENT - 1)

    tile_parts = [k0_tile, k1_tile, kb_tile.reshape(-1)]
    tri_parts = [
        tri_ids,
        tri_ids,
        jnp.broadcast_to(btri[:, None], kb_tile.shape).reshape(-1),
    ]
    if big2 is not None:
        bg2 = btab[b2tri]  # (bc2, 8)
        ks2 = jnp.arange(big2_span, dtype=jnp.int32)[None, :]
        bw2 = jnp.maximum(bg2[:, 2:3], 1)
        r2 = ks2 // bw2
        c2 = ks2 % bw2
        b2tile = (bg2[:, 1:2] + r2) * ntx + (bg2[:, 0:1] + c2)
        b2ok = b2valid[:, None] & (ks2 < bg2[:, 3:4])
        kb2_tile = jnp.where(b2ok, b2tile, SENT - 1)
        tile_parts.append(kb2_tile.reshape(-1))
        tri_parts.append(
            jnp.broadcast_to(b2tri[:, None], kb2_tile.shape).reshape(-1)
        )
    slot_tiles = jnp.concatenate(tile_parts)  # (slots,)
    slot_tris = jnp.concatenate(tri_parts)

    total = (
        jnp.sum(jnp.where(small2, jnp.minimum(span, 2), 0))
        + jnp.sum(jnp.where(big & ~spilled, span, 0))
        + jnp.sum(jumbo_all.astype(jnp.int32))
    )
    if big2 is not None:
        total = total + jnp.sum(jnp.where(big2 & ~spilled2, span, 0))
    overflowed = total > pairs_cap
    # Overflow is NOT silent: pairs past the cap are dropped (triangles go
    # missing in some tiles), so warn loudly from inside the jitted program
    # wherever the backend can host debug callbacks. Static shapes forbid
    # regrowing here — callers raise ``pairs_cap`` (plumbed through
    # render(raster_pairs_cap=...)).
    if _backend_supports_callbacks():
        jax.lax.cond(
            overflowed,
            lambda t: jax.debug.print(
                "WARNING: raster binning overflow — {} (tile,tri) pairs > cap "
                + str(pairs_cap)
                + "; triangles will be MISSING. Raise pairs_cap "
                "(render(..., raster_pairs_cap=N)).",
                t,
            ),
            lambda t: None,
            total,
        )

    TRI_BITS = max(1, (num_t - 1).bit_length()) if num_t > 1 else 1
    if ntiles + 2 <= (1 << (31 - TRI_BITS)):
        # Fast path: pack (tile+1, tri) into one int32 and run a single
        # value-free sort — the triangle id decodes back arithmetically, so
        # no post-sort gathers. Keys are unique (each (tile, tri) pair is
        # emitted at most once) → unstable sort is exact, and within a tile
        # keys ascend by triangle id = draw order.
        packed_keys = ((slot_tiles + 1) << TRI_BITS) | slot_tris
        sorted_keys = jnp.sort(packed_keys)[:pairs_cap]
        sorted_tile = (sorted_keys >> TRI_BITS) - 1
        sorted_tri = jnp.where(
            sorted_tile < ntiles, sorted_keys & ((1 << TRI_BITS) - 1), -1
        )
    else:
        # General fallback: two-key lexicographic sort (tile, tri).
        sorted_tile, sorted_tri = jax.lax.sort(
            (slot_tiles, slot_tris), num_keys=2
        )
        sorted_tile = sorted_tile[:pairs_cap]
        sorted_tri = jnp.where(
            sorted_tile < ntiles, sorted_tri[:pairs_cap], -1
        )

    # starts[i] = first pair of tile i; [0, starts[0]) is the jumbo run
    # (tile key -1). searchsorted over i in [0, ntiles].
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(ntiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Pre-gather packed fields per pair, field-major; pad by one chunk so the
    # kernel's fixed-size chunk DMA never reads out of bounds.
    fields = pack_triangle_fields(
        st, face_material, corner_channels, normalize_edges=bbox_margin_px > 0.0
    )  # (T, NF)
    safe_tri = jnp.maximum(sorted_tri, 0)
    if pair_major:
        packed = fields[safe_tri]  # (PAIRS, NF) — row-layout kernel input
        packed = jnp.pad(packed, ((0, chunk), (0, 0)))
    else:
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
