"""Pallas TPU rasterizer: per-tile dynamic triangle runs, VMEM depth resolve.

The hot forward kernel replacing the v0 scan-everything rasterizer. One grid
step per screen tile; each step

  * reads its [start, end) pair range from scalar-prefetched ``starts``
    (plus the global jumbo run [0, starts[0)) — see ``raster_bin``),
  * DMAs fixed-size chunks of the field-major packed triangle data
    (HBM → VMEM, contiguous — the payoff of sort-based binning),
  * evaluates 3 edge functions + the depth plane for (pixels × chunk)
    on the VPU with a dynamic ``fori_loop`` trip count (only the REAL
    triangles of this tile are ever touched — zero wasted work),
  * keeps a running (depth, id) argmin in VMEM; ties go to the earlier
    pair (= draw order), matching the LESS depth test.

The kernel only produces integer triangle ids; barycentrics/attributes are
recomputed differentiably outside (see ``raster.compute_barycentrics``), so
no backward kernel is needed for the raster stage itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import interpolate_corners, interpolate_packed, setup_corners, setup_triangles
from .raster_bin import FIELD_MATERIAL, GBUF_FIELD0, NUM_FIELDS, bin_triangles

CHUNK = 128  # triangles per DMA chunk (lane width)


def _tile_zfloor(z_floor, rows, width, tiles_y, tiles_x, tile_h, tile_w):
    """(rows, W) z-floor → (ntiles, tile_h, tile_w) VMEM tile blocks
    (padding = −inf: padded pixels accept everything, they are cropped)."""
    zf = jnp.pad(
        z_floor,
        ((0, tiles_y * tile_h - rows), (0, tiles_x * tile_w - width)),
        constant_values=-jnp.inf,
    )
    return (
        zf.reshape(tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tiles_x, tile_h, tile_w)
    )
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,  # 1 bf16 MXU pass (~3 digits)
    "high": jax.lax.Precision.HIGH,  # 3 passes (~6 digits, near-f32)
    "highest": jax.lax.Precision.HIGHEST,  # 6 passes (full f32)
}


def _raster_tile_kernel(
    # scalar prefetch
    starts_ref,  # (ntiles+1,) i32 in SMEM
    meta_ref,  # (1,) i32: [y_offset]
    # inputs (ANY/HBM)
    packed_ref,  # (NUM_FIELDS, PAIRS_pad) f32
    ids_ref,  # (1, PAIRS_pad) i32
    # then: [zfloor_ref] if has_zfloor — (1, tile_h, tile_w) f32 VMEM block
    # outputs (VMEM block per tile):
    #   out_ref (1, tile_h, tile_w) i32 — encoded tid*mat_stride+mat (−1 bg)
    #   [out_z_ref] if want_depth — (1, tile_h, tile_w) f32 (+inf background)
    # scratch:
    #   fbuf (2, NUM_FIELDS, CHUNK) f32 (double-buffered), ibuf (2,1,CHUNK)
    #   i32, fsem, isem, best_z (P,1) f32, best_id (P,1) i32
    *rest,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    mat_stride: int,
    has_zfloor: bool,
    want_depth: bool,
    margin: float,
):
    k = 0
    zfloor_ref = None
    if has_zfloor:
        zfloor_ref = rest[k]
        k += 1
    out_ref = rest[k]
    k += 1
    out_z_ref = None
    if want_depth:
        out_z_ref = rest[k]
        k += 1
    fbuf, ibuf, fsem, isem, best_z, best_id = rest[k : k + 6]
    p = tile_h * tile_w
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x

    x_base = (tx * tile_w).astype(jnp.float32)
    y_base = (ty * tile_h + meta_ref[0]).astype(jnp.float32)

    # Pixel centers, flattened pixel axis on sublanes: (P, 1).
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = x_base + (pix % tile_w).astype(jnp.float32) + 0.5
    py = y_base + (pix // tile_w).astype(jnp.float32) + 0.5

    best_z[:] = jnp.full((p, 1), jnp.inf, jnp.float32)
    best_id[:] = jnp.full((p, 1), -1, jnp.int32)  # -1 = BACKGROUND
    zf = zfloor_ref[:].reshape(p, 1) if has_zfloor else None

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def process_range(lo, hi):
        """Depth-resolve pairs [lo, hi) in CHUNK-sized steps, double-buffered
        (DMA of chunk j+1 overlaps compute of chunk j).

        The start is aligned DOWN to a CHUNK boundary so every DMA offset is
        provably 128-aligned (Mosaic requires it). The extra leading pairs
        belong to neighbouring tiles: each is either a duplicate of a pair in
        this tile's own run (identical depth/id — idempotent under the strict
        < depth test) or a triangle not covering these pixels (inside-test
        rejects). Correct, ≤127 pairs of waste per range."""
        lo_a = (lo // CHUNK) * CHUNK
        n_chunks = (hi - lo_a + CHUNK - 1) // CHUNK

        def make_dmas(slot, j):
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)
            fdma = pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(base, CHUNK)], fbuf.at[slot], fsem.at[slot]
            )
            idma = pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(base, CHUNK)], ibuf.at[slot], isem.at[slot]
            )
            return fdma, idma

        f0, i0 = make_dmas(0, 0)
        f0.start()
        i0.start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                fn, inx = make_dmas((j + 1) % 2, j + 1)
                fn.start()
                inx.start()

            fw, iw = make_dmas(slot, j)
            fw.wait()
            iw.wait()
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)

            f = fbuf[slot]  # (NUM_FIELDS, CHUNK)
            dx = px - f[9:10, :]  # (P, CHUNK)
            dy = py - f[10:11, :]
            e0 = dx * f[0:1, :] + dy * f[3:4, :] + f[6:7, :]
            e1 = dx * f[1:2, :] + dy * f[4:5, :] + f[7:8, :]
            e2 = dx * f[2:3, :] + dy * f[5:6, :] + f[8:9, :]
            # margin > 0 dilates coverage by ``margin`` pixels (fields are
            # packed with unit-gradient edges in that case); margin == 0
            # compiles to the exact e ≥ 0 test.
            inside = (e0 >= -margin) & (e1 >= -margin) & (e2 >= -margin)
            z = dx * f[11:12, :] + dy * f[12:13, :] + f[13:14, :]

            tid = ibuf[slot]  # (1, CHUNK)
            in_run = lane < (hi - base)  # mask the tail chunk
            ok = inside & (z >= 0.0) & (z <= 1.0) & in_run & (tid >= 0)
            if has_zfloor:
                ok &= z > zf  # depth peeling: strictly-behind-floor only
            zm = jnp.where(ok, z, jnp.inf)

            zmin = jnp.min(zm, axis=1, keepdims=True)  # (P, 1)
            # Winner = smallest (tid, material) code among lanes achieving
            # the min. Pairs are tile-sorted ascending in tri id (= draw
            # order), so min-code ties reproduce first-drawn-wins; encoding
            # the material id in the code makes the per-pixel material
            # lookup FREE (TPU XLA gathers are latency-bound and slow).
            if mat_stride > 1:
                code = tid * mat_stride + f[14:15, :].astype(jnp.int32)
            else:
                code = tid
            win_id = jnp.min(
                jnp.where(zm <= zmin, code, jnp.int32(0x7FFFFFFF)),
                axis=1,
                keepdims=True,
            )
            better = zmin < best_z[:]
            best_z[:] = jnp.where(better, zmin, best_z[:])
            best_id[:] = jnp.where(better, win_id, best_id[:])
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    # Pairs [0, starts[0]) are the global (jumbo) run; tile i's own run is
    # [starts[i], starts[i+1]).
    g_end = starts_ref[0]
    s0 = starts_ref[i]
    s1 = starts_ref[i + 1]

    @pl.when(g_end > 0)
    def _():
        process_range(0, g_end)  # jumbo triangles (every tile)

    @pl.when(s1 > s0)
    def _():
        process_range(s0, s1)  # this tile's run

    out_ref[:] = best_id[:].reshape(1, tile_h, tile_w)
    if want_depth:
        out_z_ref[:] = best_z[:].reshape(1, tile_h, tile_w)


def _raster_tile_gbuf_kernel(
    # scalar prefetch
    starts_ref,  # (ntiles+1,) i32 in SMEM
    meta_ref,  # (1,) i32: [y_offset]
    # inputs (ANY/HBM)
    packed_ref,  # (NF, PAIRS_pad) f32
    ids_ref,  # (1, PAIRS_pad) i32
    # then: [zfloor_ref] if has_zfloor — (1, tile_h, tile_w) f32 VMEM block
    # outputs (VMEM block per tile):
    #   out_id_ref (1, tile_h, tile_w) i32 — tid*mat_stride+mat (−1 bg)
    #   out_gb_ref (1, P, C+1) f32 — perspective-correct attrs + linear depth
    # scratch: fbuf (2,NF,CHUNK) f32, ibuf (2,1,CHUNK) i32, fsem, isem,
    #   best_z (P,1) f32, best_id (P,1) i32, best_f (P,NF) f32
    *rest,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    mat_stride: int,
    num_ch: int,  # interpolation channels incl. the trailing 1/w
    mm_precision,
    has_zfloor: bool,
):
    """Fused raster + G-buffer-interpolation kernel.

    Identical depth resolve to ``_raster_tile_kernel``, plus: each chunk
    resolves the winning LANE as an exact one-hot (lane-index tiebreak for
    duplicate pairs of one triangle straddling tile runs) and pulls that
    lane's whole field row with ONE (P,CHUNK)·(CHUNK,NF) MXU matmul — the
    "gather" of the deferred stage, at matmul speed instead of ~8 ns/row XLA
    gather latency per pixel. After the loop the attribute planes are
    evaluated per pixel as lane-wise FMAs and perspective-divided by the 1/w
    plane (identical algebra to ``raster.interpolate_packed``)."""
    k = 0
    zfloor_ref = None
    if has_zfloor:
        zfloor_ref = rest[k]
        k += 1
    out_id_ref, out_gb_ref = rest[k], rest[k + 1]
    k += 2
    fbuf, ibuf, fsem, isem, best_z, best_id, best_f = rest[k : k + 7]
    p = tile_h * tile_w
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x

    x_base = (tx * tile_w).astype(jnp.float32)
    y_base = (ty * tile_h + meta_ref[0]).astype(jnp.float32)

    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = x_base + (pix % tile_w).astype(jnp.float32) + 0.5
    py = y_base + (pix // tile_w).astype(jnp.float32) + 0.5

    best_z[:] = jnp.full((p, 1), jnp.inf, jnp.float32)
    best_id[:] = jnp.full((p, 1), -1, jnp.int32)  # -1 = BACKGROUND
    best_f[:] = jnp.zeros_like(best_f)
    zf = zfloor_ref[:].reshape(p, 1) if has_zfloor else None

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def process_range(lo, hi):
        lo_a = (lo // CHUNK) * CHUNK
        n_chunks = (hi - lo_a + CHUNK - 1) // CHUNK

        def make_dmas(slot, j):
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)
            fdma = pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(base, CHUNK)], fbuf.at[slot], fsem.at[slot]
            )
            idma = pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(base, CHUNK)], ibuf.at[slot], isem.at[slot]
            )
            return fdma, idma

        f0, i0 = make_dmas(0, 0)
        f0.start()
        i0.start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                fn, inx = make_dmas((j + 1) % 2, j + 1)
                fn.start()
                inx.start()

            fw, iw = make_dmas(slot, j)
            fw.wait()
            iw.wait()
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)

            f = fbuf[slot]  # (NF, CHUNK)
            dx = px - f[9:10, :]  # (P, CHUNK)
            dy = py - f[10:11, :]
            e0 = dx * f[0:1, :] + dy * f[3:4, :] + f[6:7, :]
            e1 = dx * f[1:2, :] + dy * f[4:5, :] + f[7:8, :]
            e2 = dx * f[2:3, :] + dy * f[5:6, :] + f[8:9, :]
            inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            z = dx * f[11:12, :] + dy * f[12:13, :] + f[13:14, :]

            tid = ibuf[slot]  # (1, CHUNK)
            in_run = lane < (hi - base)
            ok = inside & (z >= 0.0) & (z <= 1.0) & in_run & (tid >= 0)
            if has_zfloor:
                ok &= z > zf  # depth peeling: strictly-behind-floor only
            zm = jnp.where(ok, z, jnp.inf)

            zmin = jnp.min(zm, axis=1, keepdims=True)  # (P, 1)
            if mat_stride > 1:
                code = tid * mat_stride + f[14:15, :].astype(jnp.int32)
            else:
                code = tid
            win_id = jnp.min(
                jnp.where(zm <= zmin, code, jnp.int32(0x7FFFFFFF)),
                axis=1,
                keepdims=True,
            )
            # Exactly ONE winning lane: duplicate pairs of the same triangle
            # (identical z and code, possible in the chunk-aligned prefix)
            # are broken by smallest lane index — a 2nd reduction, so the
            # one-hot below sums to ≤1 and the matmul never double-counts.
            is_win = (zm <= zmin) & (code == win_id)
            win_lane = jnp.min(
                jnp.where(is_win, lane, jnp.int32(0x7FFFFFFF)),
                axis=1,
                keepdims=True,
            )
            onehot = (is_win & (lane == win_lane)).astype(jnp.float32)
            # Winner-field extraction as a one-hot MXU matmul. Precision is a
            # caller knob: HIGHEST reproduces f32 attributes exactly (6 MXU
            # passes); HIGH is ~f32 to 1e-6 at half the cost; DEFAULT rounds
            # the selected field rows to bf16 (~0.4% — below the u8 output
            # quantization step, invisible in images). The one-hot side is
            # exact at every precision.
            cand = jax.lax.dot_general(
                onehot,
                f,
                (((1,), (1,)), ((), ())),
                precision=mm_precision,
                preferred_element_type=jnp.float32,
            )  # (P, NF) — the winning lane's field row

            better = zmin < best_z[:]
            best_z[:] = jnp.where(better, zmin, best_z[:])
            best_id[:] = jnp.where(better, win_id, best_id[:])
            best_f[:] = jnp.where(better, cand, best_f[:])
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    g_end = starts_ref[0]
    s0 = starts_ref[i]
    s1 = starts_ref[i + 1]

    @pl.when(g_end > 0)
    def _():
        process_range(0, g_end)

    @pl.when(s1 > s0)
    def _():
        process_range(s0, s1)

    # Evaluate the winner's attribute planes at the pixel centers.
    bf = best_f[:]  # (P, NF)
    dxp = px - bf[:, 9:10]
    dyp = py - bf[:, 10:11]
    a0 = GBUF_FIELD0
    planes = (
        bf[:, a0 : a0 + num_ch] * dxp
        + bf[:, a0 + num_ch : a0 + 2 * num_ch] * dyp
        + bf[:, a0 + 2 * num_ch : a0 + 3 * num_ch]
    )  # (P, CH): [attr·(1/w) … , 1/w]
    invw = planes[:, num_ch - 1 : num_ch]
    attrs = planes[:, : num_ch - 1] / jnp.where(jnp.abs(invw) > 1e-20, invw, 1.0)
    depth = bf[:, 11:12] * dxp + bf[:, 12:13] * dyp + bf[:, 13:14]
    hit = best_id[:] >= 0
    gb = jnp.concatenate([attrs, depth], axis=-1)  # (P, C+1)
    out_gb_ref[:] = jnp.where(hit, gb, 0.0).reshape(1, p, num_ch)
    out_id_ref[:] = best_id[:].reshape(1, tile_h, tile_w)


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
        "big_cap",
        "cull_backface",
        "num_materials",
        "interpret",
        "return_depth",
        "edge_margin_px",
    ),
)
def rasterize_binned(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray | None,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 16,
    tile_w: int = 128,
    max_span: int = 8,
    pairs_cap: int | None = None,
    big_cap: int | None = None,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
    face_material: jnp.ndarray | None = None,
    num_materials: int = 0,
    interpret: bool = False,
    z_floor: jnp.ndarray | None = None,
    return_depth: bool = False,
    edge_margin_px: float = 0.0,
):
    """Binned Pallas rasterization → (rows, width) i32 triangle ids.

    Same contract as ``raster.rasterize`` (full viewport projection,
    optional row band). ``interpret=True`` runs the kernel in interpreter
    mode (CPU testing).

    With ``face_material`` (T,) + static ``num_materials``, returns
    (tri_id, material_id) — the material resolve rides the kernel's winner
    reduction for free instead of a slow XLA gather.

    ``tris=None`` switches to corner-major input: ``verts_clip`` is (T,3,4)
    clip coordinates (see ``models.scene.CornerGeometry``) — the gather-free
    hot path.

    ``z_floor`` (rows, W): accept only fragments with z strictly greater —
    the depth-peeling hook (same contract as ``raster.rasterize``).
    ``return_depth=True`` additionally returns depth (+inf at background).
    ``edge_margin_px`` dilates every triangle by that many pixels (soft-
    raster near-miss capture; binning packs unit-gradient edges for it)."""
    if rows is None:
        rows = height
    y_offset = jnp.asarray(y_offset, jnp.int32)
    num_t = verts_clip.shape[0] if tris is None else tris.shape[0]

    want_material = face_material is not None
    mat_stride = 1
    encode_material = False
    if want_material:
        assert num_materials > 0, "pass static num_materials with face_material"
        mat_stride = 1 << max(1, (num_materials - 1).bit_length())
        encode_material = num_t * mat_stride < (1 << 31)
        if not encode_material:
            mat_stride = 1  # fallback: resolve material by XLA gather below

    if tris is None:
        st = setup_corners(verts_clip, width, height, cull_backface, tri_mask)
    else:
        st = setup_triangles(verts_clip, tris, width, height, cull_backface, tri_mask)
    binned = bin_triangles(
        st,
        width=width,
        height=height,
        rows=rows,
        y_offset=y_offset,
        tile_h=tile_h,
        tile_w=tile_w,
        max_span=max_span,
        pairs_cap=pairs_cap,
        big_cap=big_cap,
        chunk=CHUNK,
        face_material=face_material if encode_material else None,
        bbox_margin_px=edge_margin_px,
    )

    tiles_x = -(-width // tile_w)
    tiles_y = -(-rows // tile_h)
    ntiles = tiles_y * tiles_x
    p = tile_h * tile_w

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [
        binned.packed,
        binned.pair_tri.reshape(1, -1),
    ]
    if z_floor is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(_tile_zfloor(z_floor, rows, width, tiles_y, tiles_x, tile_h, tile_w))

    tile_block = pl.BlockSpec(
        (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.int32)]
    out_specs = [tile_block]
    if return_depth:
        out_shape.append(jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.float32))
        out_specs.append(tile_block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _raster_tile_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        mat_stride=mat_stride if encode_material else 1,
        has_zfloor=z_floor is not None,
        want_depth=return_depth,
        margin=float(edge_margin_px),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        binned.starts,
        jnp.reshape(y_offset, (1,)),
        *operands,
    )
    tile_out = outs[0]

    def detile(t):
        return (
            t.reshape(tiles_y, tiles_x, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tile_h, tiles_x * tile_w)
        )[:rows, :width]

    img = detile(tile_out)
    depth = detile(outs[1]) if return_depth else None
    if want_material:
        if encode_material:
            bg = img < 0
            tri_id = jnp.where(bg, -1, img // mat_stride)
            mat_id = jnp.where(bg, 0, img % mat_stride)
        else:
            tri_id = img
            mat_id = face_material[jnp.maximum(img, 0)]
        return (tri_id, mat_id, depth) if return_depth else (tri_id, mat_id)
    return (img, depth) if return_depth else img


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
        "big_cap",
        "cull_backface",
        "num_materials",
        "interpret",
        "mm_precision",
    ),
)
def rasterize_binned_gbuffer(
    verts_clip: jnp.ndarray,
    tris: jnp.ndarray | None,
    packed_attrs: jnp.ndarray,  # (V, C) vertex attrs, or (T, 3, C) corner-major
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 16,
    tile_w: int = 128,
    max_span: int = 8,
    pairs_cap: int | None = None,
    big_cap: int | None = None,
    cull_backface: bool = True,
    tri_mask: jnp.ndarray | None = None,
    face_material: jnp.ndarray | None = None,
    num_materials: int = 0,
    interpret: bool = False,
    mm_precision: str = "highest",
    z_floor: jnp.ndarray | None = None,
):
    """Fused binned raster + G-buffer: one Pallas pass → per-pixel
    perspective-correct attributes, depth, triangle id (and material id).

    Replaces ``rasterize_binned`` + ``raster.interpolate_packed`` on the hot
    path: the deferred stage's per-pixel attribute gather (~8 ns/row × H·W,
    the single largest stage at 1080p) rides the raster kernel's winner
    reduction as an MXU matmul instead. NOT differentiable — see
    :func:`raster_gbuffer` for the custom-VJP wrapper.

    Returns (attrs (rows,W,C), depth (rows,W), tri_id (rows,W) i32,
    mat_id (rows,W) i32 or None).

    ``tris=None`` switches to corner-major input: ``verts_clip`` (T,3,4) and
    ``packed_attrs`` (T,3,C) — zero per-triangle gathers."""
    if rows is None:
        rows = height
    y_offset = jnp.asarray(y_offset, jnp.int32)
    num_t = verts_clip.shape[0] if tris is None else tris.shape[0]

    want_material = face_material is not None
    mat_stride = 1
    encode_material = False
    if want_material:
        assert num_materials > 0, "pass static num_materials with face_material"
        mat_stride = 1 << max(1, (num_materials - 1).bit_length())
        encode_material = num_t * mat_stride < (1 << 31)
        if not encode_material:
            mat_stride = 1

    if tris is None:
        st = setup_corners(verts_clip, width, height, cull_backface, tri_mask)
        corner_attrs = packed_attrs  # already (T, 3, C)
    else:
        st = setup_triangles(verts_clip, tris, width, height, cull_backface, tri_mask)
        corner_attrs = packed_attrs[tris]  # (T, 3, C)
    # Interpolation channels: attr·(1/w) per corner + trailing 1/w — the
    # numerator/denominator planes of perspective-correct interpolation.
    corner_channels = jnp.concatenate(
        [corner_attrs * st.inv_w[..., None], st.inv_w[..., None]], axis=-1
    )
    num_ch = corner_channels.shape[-1]  # C + 1

    binned = bin_triangles(
        st,
        width=width,
        height=height,
        rows=rows,
        y_offset=y_offset,
        tile_h=tile_h,
        tile_w=tile_w,
        max_span=max_span,
        pairs_cap=pairs_cap,
        big_cap=big_cap,
        chunk=CHUNK,
        face_material=face_material if encode_material else None,
        corner_channels=corner_channels,
    )
    nf = binned.packed.shape[0]

    tiles_x = -(-width // tile_w)
    tiles_y = -(-rows // tile_h)
    ntiles = tiles_y * tiles_x
    p = tile_h * tile_w

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [binned.packed, binned.pair_tri.reshape(1, -1)]
    if z_floor is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(
            _tile_zfloor(z_floor, rows, width, tiles_y, tiles_x, tile_h, tile_w)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, num_ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nf, CHUNK), jnp.float32),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.int32),
            pltpu.VMEM((p, nf), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_tile_gbuf_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        mat_stride=mat_stride if encode_material else 1,
        num_ch=num_ch,
        mm_precision=_PRECISIONS[mm_precision],
        has_zfloor=z_floor is not None,
    )
    tile_ids, tile_gb = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, p, num_ch), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        binned.starts,
        jnp.reshape(y_offset, (1,)),
        *operands,
    )

    img = (
        tile_ids.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tile_h, tiles_x * tile_w)
    )[:rows, :width]
    gb = (
        tile_gb.reshape(tiles_y, tiles_x, tile_h, tile_w, num_ch)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * tile_h, tiles_x * tile_w, num_ch)
    )[:rows, :width]
    attrs = gb[..., : num_ch - 1]
    depth = gb[..., num_ch - 1]

    if want_material:
        if encode_material:
            bg = img < 0
            tri_id = jnp.where(bg, -1, img // mat_stride)
            mat_id = jnp.where(bg, 0, img % mat_stride)
        else:
            tri_id = img
            mat_id = face_material[jnp.maximum(img, 0)]
    else:
        tri_id = img
        mat_id = None
    return attrs, depth, tri_id, mat_id


PI = 3.14159265359  # LightingUtil.hlsl literal (see ops/brdf.py)


def _raster_tile_shade_kernel(
    # scalar prefetch
    starts_ref,  # (ntiles+1,) i32 in SMEM
    meta_ref,  # (1,) i32: [y_offset]
    # inputs
    packed_ref,  # (NF, PAIRS_pad) f32 (ANY/HBM)
    ids_ref,  # (1, PAIRS_pad) i32 (ANY/HBM)
    mat_ref,  # (MPAD, MATK) f32 VMEM — material constant table
    uni_ref,  # (1, U) f32 SMEM — [eye(3), ambient(3), pad(2), per light:
    #            strength(3), direction(3), position(3), spot_power(1)]
    # outputs (VMEM block per tile):
    #   out_id_ref (1, tile_h, tile_w) i32 — tid*mat_stride+mat (−1 bg)
    #   out_rgba_ref (1, 4·tile_h, tile_w) f32 — display-encoded FG color +
    #     opacity as 4 stacked row-slabs (zeros at background; caller
    #     composes sky/clear)
    #   [out_gb_ref] if want_gbuf — (1, P, C+1) f32 attrs+depth (VJP residual)
    # scratch: fbuf, ibuf, fsem, isem, best_z, best_id, best_f
    *rest,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    mat_stride: int,
    num_ch: int,  # interpolation channels incl. trailing 1/w (untextured: 7)
    mm_precision,
    num_dir: int,
    num_point: int,
    num_spot: int,
    apply_tonemap: bool,
    want_gbuf: bool,
):
    """Fully fused raster + G-buffer + Cook-Torrance shade + tonemap kernel.

    The reference's raster→PS structure (``Default.hlsl:47-161``) with no
    intermediate buffer: after the per-tile depth resolve (identical to
    ``_raster_tile_gbuf_kernel``) the winning attributes never leave VMEM —
    material constants are fetched with one one-hot MXU matmul from the tiny
    (M, K) table, the punctual-light loop (``LightingUtil.hlsl:170-200``)
    unrolls over the static light counts on the VPU in (tile_h, tile_w)
    lane-full layout, and Reinhard+gamma (``Default.hlsl:152-155``) writes the
    final display-encoded tile. Kills the 14-channel G-buffer HBM round trip
    plus the XLA shade/tonemap stages (~12 ms of a 34 ms 1080p frame).

    ``want_gbuf=True`` additionally writes the interpolated attributes — the
    residual the custom VJP's recompute backward needs (fwd-only renders use
    the False variant and skip that traffic entirely).

    VMEM layout note (Mosaic allocates every kernel temporary on a 16 MB
    stack, tiled (8,128) — a (P,1) column costs 128× its payload, and the
    resolve loop's (P,CHUNK) temporaries already dominate): the loop keeps
    the proven (P,NF) accumulator of the G-buffer kernel, interpolation and
    the material fetch run in (P,·) space (a handful of temps), and then ONE
    transpose moves the ~25 per-pixel channels into row layout (k, P) where
    the ~120-op shading expression costs 8 KB per temporary instead of 1 MB.
    The default ``tile_h`` is 8 (not 16) to halve the loop's footprint.
    """
    k = 0
    out_id_ref, out_rgba_ref = rest[k], rest[k + 1]
    k += 2
    out_gb_ref = None
    if want_gbuf:
        out_gb_ref = rest[k]
        k += 1
    fbuf, ibuf, fsem, isem, best_z, best_id, best_f = rest[k : k + 7]
    p = tile_h * tile_w
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x

    x_base = (tx * tile_w).astype(jnp.float32)
    y_base = (ty * tile_h + meta_ref[0]).astype(jnp.float32)

    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = x_base + (pix % tile_w).astype(jnp.float32) + 0.5
    py = y_base + (pix // tile_w).astype(jnp.float32) + 0.5

    best_z[:] = jnp.full((p, 1), jnp.inf, jnp.float32)
    best_id[:] = jnp.full((p, 1), -1, jnp.int32)  # -1 = BACKGROUND
    best_f[:] = jnp.zeros_like(best_f)  # (P, NF)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def process_range(lo, hi):
        lo_a = (lo // CHUNK) * CHUNK
        n_chunks = (hi - lo_a + CHUNK - 1) // CHUNK

        def make_dmas(slot, j):
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)
            fdma = pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(base, CHUNK)], fbuf.at[slot], fsem.at[slot]
            )
            idma = pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(base, CHUNK)], ibuf.at[slot], isem.at[slot]
            )
            return fdma, idma

        f0, i0 = make_dmas(0, 0)
        f0.start()
        i0.start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                fn, inx = make_dmas((j + 1) % 2, j + 1)
                fn.start()
                inx.start()

            fw, iw = make_dmas(slot, j)
            fw.wait()
            iw.wait()
            base = pl.multiple_of(lo_a + j * CHUNK, CHUNK)

            f = fbuf[slot]  # (NF, CHUNK)
            dx = px - f[9:10, :]  # (P, CHUNK)
            dy = py - f[10:11, :]
            e0 = dx * f[0:1, :] + dy * f[3:4, :] + f[6:7, :]
            e1 = dx * f[1:2, :] + dy * f[4:5, :] + f[7:8, :]
            e2 = dx * f[2:3, :] + dy * f[5:6, :] + f[8:9, :]
            inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            z = dx * f[11:12, :] + dy * f[12:13, :] + f[13:14, :]

            tid = ibuf[slot]  # (1, CHUNK)
            in_run = lane < (hi - base)
            ok = inside & (z >= 0.0) & (z <= 1.0) & in_run & (tid >= 0)
            zm = jnp.where(ok, z, jnp.inf)

            zmin = jnp.min(zm, axis=1, keepdims=True)  # (P, 1)
            if mat_stride > 1:
                code = tid * mat_stride + f[14:15, :].astype(jnp.int32)
            else:
                code = tid
            win_id = jnp.min(
                jnp.where(zm <= zmin, code, jnp.int32(0x7FFFFFFF)),
                axis=1,
                keepdims=True,
            )
            # Exactly ONE winning lane (duplicate pairs of one triangle are
            # broken by smallest lane index, same as the G-buffer kernel).
            # Measured alternatives that LOST on v5e: dropping this reduce in
            # favor of a constant-1-field duplicate count (+0.6 ms) and a
            # manual 3-pass bf16-split matmul replacing HIGHEST (+2.9 ms).
            is_win = (zm <= zmin) & (code == win_id)
            win_lane = jnp.min(
                jnp.where(is_win, lane, jnp.int32(0x7FFFFFFF)),
                axis=1,
                keepdims=True,
            )
            onehot = (is_win & (lane == win_lane)).astype(jnp.float32)
            cand = jax.lax.dot_general(
                onehot,
                f,
                (((1,), (1,)), ((), ())),
                precision=mm_precision,
                preferred_element_type=jnp.float32,
            )  # (P, NF)

            better = zmin < best_z[:]
            best_z[:] = jnp.where(better, zmin, best_z[:])
            best_id[:] = jnp.where(better, win_id, best_id[:])
            best_f[:] = jnp.where(better, cand, best_f[:])
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    g_end = starts_ref[0]
    s0 = starts_ref[i]
    s1 = starts_ref[i + 1]

    @pl.when(g_end > 0)
    def _():
        process_range(0, g_end)

    @pl.when(s1 > s0)
    def _():
        process_range(s0, s1)

    # --- interpolation: evaluate the winner's attribute planes --------------
    # (P,·) space, same shapes as the G-buffer kernel's epilogue (few temps).
    bf = best_f[:]  # (P, NF)
    dxp = px - bf[:, 9:10]
    dyp = py - bf[:, 10:11]
    a0 = GBUF_FIELD0
    planes = (
        bf[:, a0 : a0 + num_ch] * dxp
        + bf[:, a0 + num_ch : a0 + 2 * num_ch] * dyp
        + bf[:, a0 + 2 * num_ch : a0 + 3 * num_ch]
    )  # (P, CH): [attr·(1/w) … , 1/w]
    invw = planes[:, num_ch - 1 : num_ch]
    attrs = planes[:, : num_ch - 1] / jnp.where(jnp.abs(invw) > 1e-20, invw, 1.0)
    hit_p = best_id[:] >= 0
    if want_gbuf:
        depth = bf[:, 11:12] * dxp + bf[:, 12:13] * dyp + bf[:, 13:14]
        gb = jnp.concatenate([attrs, depth], axis=-1)
        out_gb_ref[:] = jnp.where(hit_p, gb, 0.0).reshape(1, p, num_ch)

    # --- material constant fetch: one-hot MXU matmul -------------------------
    # (the cbMaterial read, Core.hlsl:64-81; exact at every precision on the
    # one-hot side, table side full f32 at HIGHEST)
    mpad = mat_ref.shape[0]
    mid_i = bf[:, FIELD_MATERIAL : FIELD_MATERIAL + 1].astype(jnp.int32)  # (P,1)
    onehot_m = (
        mid_i == jax.lax.broadcasted_iota(jnp.int32, (1, mpad), 1)
    ).astype(jnp.float32)  # (P, MPAD)
    props = jax.lax.dot_general(
        onehot_m,
        mat_ref[:],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (P, MATK): [diffuse(3), metallic, fresnel_r0(3), roughness, opacity]

    # --- ONE transpose into row layout (k, P), then shade --------------------
    # [attrs(6) | props(0:9) | hit] — every later temp is a (1,P)/(3,P) row.
    chan = jnp.concatenate(
        [attrs, props[:, :9], hit_p.astype(jnp.float32)], axis=-1
    )  # (P, 16)
    tr = jnp.swapaxes(chan, 0, 1)  # (16, P)
    pos = [tr[c : c + 1, :] for c in range(3)]
    nrm = [tr[c : c + 1, :] for c in range(3, 6)]
    alb = [tr[c : c + 1, :] for c in range(6, 9)]
    met = tr[9:10, :]
    f0c = [tr[c : c + 1, :] for c in range(10, 13)]
    rough = tr[13:14, :]
    opac = tr[14:15, :]
    hit_t = tr[15:16, :] > 0.0

    def u(k):  # uniform scalar
        return uni_ref[0, k]

    def vdot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def vnormalize(a):  # math3d.normalize parity (1e-20 guard)
        inv = jax.lax.rsqrt(jnp.maximum(vdot(a, a), 1e-20))
        return [a[0] * inv, a[1] * inv, a[2] * inv]

    n = vnormalize(nrm)  # renormalize interp normal (Default.hlsl:50)
    v = vnormalize([u(0) - pos[0], u(1) - pos[1], u(2) - pos[2]])
    # F0 = lerp(const F0, albedo, metallic) (Default.hlsl:94-96)
    f0 = [f0c[c] + (alb[c] - f0c[c]) * met for c in range(3)]

    ndotv = jnp.maximum(vdot(n, v), 0.0)
    r_cl = jnp.maximum(rough, 0.05)  # LightingUtil.hlsl:51
    a_g = r_cl * r_cl
    a2 = a_g * a_g
    kg = (rough + 1.0) * (rough + 1.0) / 8.0  # LightingUtil.hlsl:66-67
    gv = ndotv / (ndotv * (1.0 - kg) + kg)
    one_m_met = 1.0 - met
    inv_pi_alb = [alb[c] * (1.0 / PI) for c in range(3)]

    out_c = [jnp.zeros((1, p), jnp.float32) for _ in range(3)]

    def add_light(strength, l, atten):
        """One BRDFCookTorrance accumulation (LightingUtil.hlsl:85-104).
        ``l`` components may be scalars (directional) or (1, P) rows."""
        h = vnormalize([v[0] + l[0], v[1] + l[1], v[2] + l[2]])
        ndoth = jnp.maximum(vdot(n, h), 0.0)
        dn = ndoth * ndoth * (a2 - 1.0) + 1.0
        ndf = a2 / (PI * dn * dn)
        ndotl = jnp.maximum(vdot(n, l), 0.0)
        gl = ndotl / (ndotl * (1.0 - kg) + kg)
        hv = jnp.clip(vdot(h, v), 0.0, 1.0)
        t = 1.0 - hv
        t2 = t * t
        t5 = t2 * t2 * t
        spec_s = ndf * (gv * gl) / (4.0 * ndotv * ndotl + 1e-3)
        for c in range(3):
            f = f0[c] + (1.0 - f0[c]) * t5
            contrib = ((1.0 - f) * one_m_met * inv_pi_alb[c] + spec_s * f) * (
                strength[c] * atten
            ) * ndotl
            out_c[c] += contrib

    li = 0
    for _ in range(num_dir):
        b = 8 + li * 10
        add_light(
            [u(b), u(b + 1), u(b + 2)],
            [-u(b + 3), -u(b + 4), -u(b + 5)],
            1.0,
        )
        li += 1
    for _ in range(num_point):
        b = 8 + li * 10
        tl = [u(b + 6) - pos[0], u(b + 7) - pos[1], u(b + 8) - pos[2]]
        d = jnp.sqrt(jnp.maximum(vdot(tl, tl), 1e-20))
        inv_d = 1.0 / jnp.maximum(d, 1e-20)
        l = [tl[0] * inv_d, tl[1] * inv_d, tl[2] * inv_d]
        d_sat = jnp.maximum(d, 0.01)
        atten = jnp.where(d <= 100.0, 1.0 / (d_sat * d_sat), 0.0)
        add_light([u(b), u(b + 1), u(b + 2)], l, atten)
        li += 1
    for _ in range(num_spot):
        b = 8 + li * 10
        tl = [u(b + 6) - pos[0], u(b + 7) - pos[1], u(b + 8) - pos[2]]
        d = jnp.sqrt(jnp.maximum(vdot(tl, tl), 1e-20))
        inv_d = 1.0 / jnp.maximum(d, 1e-20)
        l = [tl[0] * inv_d, tl[1] * inv_d, tl[2] * inv_d]
        d_sat = jnp.maximum(d, 0.01)
        cone = jnp.maximum(
            -(l[0] * u(b + 3) + l[1] * u(b + 4) + l[2] * u(b + 5)), 0.0
        )
        atten = jnp.where(
            d <= 100.0,
            jnp.power(cone, u(b + 9)) / (d_sat * d_sat),
            0.0,
        )
        add_light([u(b), u(b + 1), u(b + 2)], l, atten)
        li += 1

    rows = []
    for c in range(3):
        lit = u(3 + c) * alb[c] + out_c[c]  # ambient·albedo + direct
        if apply_tonemap:
            x = jnp.maximum(lit, 0.0)
            x = x / (x + 1.0)  # Reinhard (Default.hlsl:153)
            lit = jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.2)
        rows.append(lit)
    rows.append(opac)
    rgba = jnp.where(hit_t, jnp.concatenate(rows, axis=0), 0.0)  # (4, P)
    out_rgba_ref[:] = rgba.reshape(1, 4 * tile_h, tile_w)
    out_id_ref[:] = best_id[:].reshape(1, tile_h, tile_w)


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
        "big_cap",
        "cull_backface",
        "num_materials",
        "num_dir",
        "num_point",
        "num_spot",
        "apply_tonemap",
        "want_gbuf",
        "interpret",
        "mm_precision",
    ),
)
def rasterize_binned_shade(
    verts_clip: jnp.ndarray,  # (T, 3, 4) corner-major clip coords
    packed_attrs: jnp.ndarray,  # (T, 3, 6) [pos_w, normal_w] corner attrs
    face_material: jnp.ndarray,  # (T,) i32
    mat_props: jnp.ndarray,  # (M, K≥9) [diffuse3, metallic, f0_3, rough, opacity]
    light_strength: jnp.ndarray,  # (L, 3)
    light_direction: jnp.ndarray,  # (L, 3)
    light_position: jnp.ndarray,  # (L, 3)
    light_spot_power: jnp.ndarray,  # (L,)
    ambient: jnp.ndarray,  # (3,)
    eye: jnp.ndarray,  # (3,)
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 4,
    tile_w: int = 128,
    max_span: int = 16,
    pairs_cap: int | None = None,
    big_cap: int | None = None,
    cull_backface: bool = True,
    num_materials: int = 0,
    num_dir: int = 0,
    num_point: int = 0,
    num_spot: int = 0,
    apply_tonemap: bool = True,
    want_gbuf: bool = False,
    interpret: bool = False,
    mm_precision: str = "highest",
):
    """Fused binned raster + interpolate + shade + tonemap (untextured path).

    One Pallas pass from clip-space triangles to the display-encoded
    foreground image: returns (rgba (rows,W,4) — zeros at background,
    tri_id (rows,W) i32, mat_id (rows,W) i32[, attrs (rows,W,7) if
    want_gbuf]). NOT differentiable — see :func:`raster_shade`."""
    if rows is None:
        rows = height
    y_offset = jnp.asarray(y_offset, jnp.int32)
    num_t = verts_clip.shape[0]
    assert num_materials > 0

    mat_stride = 1 << max(1, (num_materials - 1).bit_length())
    encode_material = num_t * mat_stride < (1 << 31)
    if not encode_material:
        mat_stride = 1

    st = setup_corners(verts_clip, width, height, cull_backface, None)
    corner_channels = jnp.concatenate(
        [packed_attrs * st.inv_w[..., None], st.inv_w[..., None]], axis=-1
    )
    num_ch = corner_channels.shape[-1]  # C + 1

    binned = bin_triangles(
        st,
        width=width,
        height=height,
        rows=rows,
        y_offset=y_offset,
        tile_h=tile_h,
        tile_w=tile_w,
        max_span=max_span,
        pairs_cap=pairs_cap,
        big_cap=big_cap,
        chunk=CHUNK,
        face_material=face_material,  # field 14 feeds the in-kernel fetch
        corner_channels=corner_channels,
    )
    nf = binned.packed.shape[0]

    tiles_x = -(-width // tile_w)
    tiles_y = -(-rows // tile_h)
    ntiles = tiles_y * tiles_x
    p = tile_h * tile_w

    # Material table, padded for the one-hot contraction.
    m, matk = mat_props.shape
    mpad = max(8, _round_up_int(m, 8))
    kpad = max(8, _round_up_int(matk, 8))
    mat_table = jnp.zeros((mpad, kpad), jnp.float32)
    mat_table = jax.lax.dynamic_update_slice(mat_table, mat_props, (0, 0))

    # Shading uniforms: eye, ambient, then 10 scalars per light row.
    lrows = light_strength.shape[0]
    uni = jnp.concatenate(
        [
            eye.reshape(3),
            ambient.reshape(3),
            jnp.zeros((2,), jnp.float32),
            jnp.concatenate(
                [
                    light_strength.reshape(lrows, 3),
                    light_direction.reshape(lrows, 3),
                    light_position.reshape(lrows, 3),
                    light_spot_power.reshape(lrows, 1),
                ],
                axis=-1,
            ).reshape(-1),
        ]
    ).reshape(1, -1)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [binned.packed, binned.pair_tri.reshape(1, -1), mat_table, uni]

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.int32),
        jax.ShapeDtypeStruct((ntiles, 4 * tile_h, tile_w), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 4 * tile_h, tile_w),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if want_gbuf:
        out_shape.append(jax.ShapeDtypeStruct((ntiles, p, num_ch), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, p, num_ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, nf, CHUNK), jnp.float32),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.int32),
            pltpu.VMEM((p, nf), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_tile_shade_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        mat_stride=mat_stride if encode_material else 1,
        num_ch=num_ch,
        mm_precision=_PRECISIONS[mm_precision],
        num_dir=num_dir,
        num_point=num_point,
        num_spot=num_spot,
        apply_tonemap=apply_tonemap,
        want_gbuf=want_gbuf,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        binned.starts,
        jnp.reshape(y_offset, (1,)),
        *operands,
    )
    tile_ids, tile_rgba = outs[0], outs[1]

    img = (
        tile_ids.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tile_h, tiles_x * tile_w)
    )[:rows, :width]
    rgba = (
        tile_rgba.reshape(tiles_y, tiles_x, 4, tile_h, tile_w)
        .transpose(0, 3, 1, 4, 2)
        .reshape(tiles_y * tile_h, tiles_x * tile_w, 4)
    )[:rows, :width]  # (ntiles, 4·th, tw) row-slabs → (rows, W, 4)

    if encode_material:
        bg = img < 0
        tri_id = jnp.where(bg, -1, img // mat_stride)
        mat_id = jnp.where(bg, 0, img % mat_stride)
    else:
        tri_id = img
        mat_id = face_material[jnp.maximum(img, 0)]

    if want_gbuf:
        gb = (
            outs[2]
            .reshape(tiles_y, tiles_x, tile_h, tile_w, num_ch)
            .transpose(0, 2, 1, 3, 4)
            .reshape(tiles_y * tile_h, tiles_x * tile_w, num_ch)
        )[:rows, :width]
        return rgba, tri_id, mat_id, gb[..., : num_ch - 1]
    return rgba, tri_id, mat_id


def _round_up_int(n: int, m: int) -> int:
    return -(-n // m) * m


def raster_shade(
    verts_clip: jnp.ndarray,
    packed_attrs: jnp.ndarray,
    face_material: jnp.ndarray,
    mat_props: jnp.ndarray,
    light_strength: jnp.ndarray,
    light_direction: jnp.ndarray,
    light_position: jnp.ndarray,
    light_spot_power: jnp.ndarray,
    ambient: jnp.ndarray,
    eye: jnp.ndarray,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 4,
    tile_w: int = 128,
    max_span: int = 16,
    cull_backface: bool = True,
    num_materials: int = 0,
    num_dir: int = 0,
    num_point: int = 0,
    num_spot: int = 0,
    apply_tonemap: bool = True,
    pairs_cap: int | None = None,
    interpret: bool = False,
    mm_precision: str = "highest",
):
    """Differentiable fully-fused raster+shade (custom VJP).

    Forward: the fused Pallas kernel (:func:`rasterize_binned_shade`) — the
    inference path writes only the final RGBA. Under differentiation the
    forward switches to the ``want_gbuf`` variant (attributes come back as
    residuals) and the backward recomputes the shading tail in XLA from those
    residuals, pulling gradients to materials / lights / ambient / eye
    directly and to vertices/attributes through a recompute of the reference
    interpolation (``raster.interpolate_corners``) — which XLA dead-code-
    eliminates whenever only parameter gradients are consumed.

    Returns (rgba (rows,W,4) display-encoded FG, tri_id, mat_id)."""
    rows_ = height if rows is None else rows

    kw = dict(
        width=width,
        height=height,
        rows=rows_,
        tile_h=tile_h,
        tile_w=tile_w,
        max_span=max_span,
        cull_backface=cull_backface,
        num_materials=num_materials,
        num_dir=num_dir,
        num_point=num_point,
        num_spot=num_spot,
        apply_tonemap=apply_tonemap,
        pairs_cap=pairs_cap,
        interpret=interpret,
        mm_precision=mm_precision,
    )

    @jax.custom_vjp
    def fused(vc, pa, fm_, table, ls, ld, lp, lsp, amb, ey, y_off_):
        return rasterize_binned_shade(
            vc, pa, fm_, table, ls, ld, lp, lsp, amb, ey, y_offset=y_off_, **kw
        )

    def fused_fwd(vc, pa, fm_, table, ls, ld, lp, lsp, amb, ey, y_off_):
        rgba, tri_id, mat_id, attrs = rasterize_binned_shade(
            vc, pa, fm_, table, ls, ld, lp, lsp, amb, ey,
            y_offset=y_off_, want_gbuf=True, **kw,
        )
        res = (vc, pa, table, ls, ld, lp, lsp, amb, ey, y_off_, tri_id, mat_id, attrs)
        return (rgba, tri_id, mat_id), res

    def fused_bwd(res, g):
        from ..models.material import MaterialBank  # noqa: F401 (doc only)
        from .brdf import Lights, MaterialSample, compute_lighting
        from .fetch import fetch_columns
        from . import tonemap as tonemap_ops
        from .. import math3d

        vc, pa, table, ls, ld, lp, lsp, amb, ey, y_off_, tri_id, mat_id, attrs = res
        hit = tri_id >= 0
        g_rgba = jnp.where(hit[..., None], g[0], 0.0)

        def shade_tail(attrs_, table_, ls_, ld_, lp_, lsp_, amb_, ey_):
            pos = attrs_[..., 0:3]
            nrm = attrs_[..., 3:6]
            props = fetch_columns(table_, mat_id)
            albedo = props[..., 0:3]
            metallic = props[..., 3]
            f0 = math3d.lerp(props[..., 4:7], albedo, metallic[..., None])
            mat = MaterialSample(
                diffuse_albedo=albedo,
                metallic=metallic,
                fresnel_r0=f0,
                roughness=props[..., 7],
            )
            n = math3d.normalize(nrm)
            v = math3d.normalize(ey_ - pos)
            lights = Lights(
                strength=ls_, direction=ld_, position=lp_, spot_power=lsp_,
                num_dir=num_dir, num_point=num_point, num_spot=num_spot,
            )
            direct = compute_lighting(lights, mat, pos, n, v)
            lit = amb_ * albedo + direct
            color = tonemap_ops.tonemap(lit) if apply_tonemap else lit
            rgba = jnp.concatenate([color, props[..., 8:9]], axis=-1)
            return jnp.where(hit[..., None], rgba, 0.0)

        _, pull2 = jax.vjp(shade_tail, attrs, table, ls, ld, lp, lsp, amb, ey)
        g_attrs, g_table, g_ls, g_ld, g_lp, g_lsp, g_amb, g_ey = pull2(g_rgba)

        def interp(vc_, pa_):
            a, _d, _m = interpolate_corners(
                pa_, vc_, tri_id, width=width, height=height, y_offset=y_off_
            )
            return a

        _, pull1 = jax.vjp(interp, vc, pa)
        gvc, gpa = pull1(jnp.where(hit[..., None], g_attrs, 0.0))

        import numpy as np

        f0t = jax.dtypes.float0
        g_fm = np.zeros(face_material.shape, dtype=f0t)
        g_yoff = np.zeros(jnp.shape(y_off_), dtype=f0t)
        return gvc, gpa, g_fm, g_table, g_ls, g_ld, g_lp, g_lsp, g_amb, g_ey, g_yoff

    fused.defvjp(fused_fwd, fused_bwd)
    return fused(
        verts_clip, packed_attrs, face_material, mat_props,
        light_strength, light_direction, light_position, light_spot_power,
        ambient, eye, jnp.asarray(y_offset, jnp.int32),
    )


def raster_gbuffer(
    verts_clip: jnp.ndarray,
    packed_attrs: jnp.ndarray,
    tris: jnp.ndarray | None,
    face_material: jnp.ndarray | None = None,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int = 16,
    tile_w: int = 128,
    max_span: int = 8,
    cull_backface: bool = True,
    num_materials: int = 0,
    pairs_cap: int | None = None,
    interpret: bool = False,
    mm_precision: str = "highest",
    z_floor: jnp.ndarray | None = None,
):
    """Differentiable fused raster + G-buffer (custom VJP).

    Forward: the fused Pallas kernel (``rasterize_binned_gbuffer``).
    Backward: the winner triangle ids are fixed (hard visibility has no
    gradient, as in the unfused pipeline) and attribute/vertex gradients are
    pulled back through a recompute of the reference interpolation math
    (``raster.interpolate_packed``) — whose cost XLA dead-code-eliminates
    whenever only material/light/texture gradients are consumed.

    Returns (attrs (rows,W,C), depth, tri_id, mat_id)."""

    @jax.custom_vjp
    def fused(vc, pa, tris_, fm_, y_off_, zf_):
        return rasterize_binned_gbuffer(
            vc,
            tris_,
            pa,
            width=width,
            height=height,
            rows=rows,
            y_offset=y_off_,
            tile_h=tile_h,
            tile_w=tile_w,
            max_span=max_span,
            cull_backface=cull_backface,
            face_material=fm_,
            num_materials=num_materials,
            pairs_cap=pairs_cap,
            interpret=interpret,
            mm_precision=mm_precision,
            z_floor=zf_,
        )

    def fused_fwd(vc, pa, tris_, fm_, y_off_, zf_):
        out = fused(vc, pa, tris_, fm_, y_off_, zf_)
        attrs, depth, tri_id, mat_id = out
        return out, (vc, pa, tris_, tri_id, y_off_)

    def fused_bwd(res, g):
        vc, pa, tris_, tri_id, y_off_ = res
        # Background pixels output exact zeros in the fused forward; the
        # recompute path interpolates triangle 0 there, so mask their
        # cotangents out before the pullback.
        hit = tri_id >= 0
        g_attrs = jnp.where(hit[..., None], g[0], 0.0)
        g_depth = jnp.where(hit, g[1], 0.0)

        def interp(vc_, pa_):
            if tris_ is None:
                a, d, _m = interpolate_corners(
                    pa_, vc_, tri_id, width=width, height=height, y_offset=y_off_
                )
            else:
                a, d, _m = interpolate_packed(
                    pa_, vc_, tris_, tri_id,
                    width=width, height=height, y_offset=y_off_,
                )
            return a, d

        _, pull = jax.vjp(interp, vc, pa)
        gvc, gpa = pull((g_attrs, g_depth))
        import numpy as np

        f0 = jax.dtypes.float0
        g_tris = None if tris_ is None else np.zeros(tris_.shape, dtype=f0)
        g_fm = (
            None
            if face_material is None
            else np.zeros(face_material.shape, dtype=f0)
        )
        g_yoff = np.zeros(jnp.shape(y_off_), dtype=f0)
        g_zf = (
            None if z_floor is None else np.zeros(jnp.shape(z_floor), dtype=f0)
        )
        return gvc, gpa, g_tris, g_fm, g_yoff, g_zf

    fused.defvjp(fused_fwd, fused_bwd)
    return fused(
        verts_clip, packed_attrs, tris, face_material,
        jnp.asarray(y_offset, jnp.int32), z_floor,
    )
