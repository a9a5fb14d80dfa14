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
from .raster_bin import GBUF_FIELD0, NUM_FIELDS, bin_triangles

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
