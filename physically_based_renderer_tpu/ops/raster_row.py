"""Row-layout fused raster+shade Pallas kernel (round-5 eval-floor fix).

The original fused kernels (``ops/raster_pallas.py``) evaluate each chunk in
a (P pixels-on-sublanes × 128 pairs-on-lanes) layout: every non-empty tile
pays at least one FULL 128-lane chunk eval, so on sparse scenes the kernel's
cost scales with TILES, not pairs (the mori_knob view: ~8,100 chunk evals
for ~19k real pairs — 0.004% lane utilization, PERF.md round 4).

This kernel TRANSPOSES the eval: pairs ride SUBLANES, pixels ride LANES.

  * A sub-chunk of S pairs × P pixels is an (S, P) VPU plane — S=8 costs
    1/16 of a 128-wide chunk. Tiles whose run fits a few sublane groups pay
    for the pairs they HAVE: kernel cost finally scales with pairs.
  * Dense tiles still evaluate full (128, P) sub-chunks (static threshold
    ``sparse_max`` picks the path per tile at runtime) — no regression on
    pair-rich scenes.
  * Every accumulator and the whole epilogue live in (k, P) ROW layout:
    merges cost 4 native ops per plane instead of the 64 of a (P, 1)
    column, interpolation runs as (num_ch, P) row FMAs, the material
    one-hot feeds the MXU as (MPAD, P) directly, and ``shade_core``'s
    (1, P) rows need NO transpose at all.
  * Winner-field extraction is a (S, NF)ᵀ·(S, P) MXU contraction; triangle/
    material ids always come from an exact integer min-reduction (ids are
    integer-exact at every ``mm_precision``).

Data layout: binning emits pair-major fields (``bin_triangles(pair_major=
True)``); the wrapper appends the triangle id as a BITCAST f32 column (ids
stay bit-exact, no separate id stream) and reshapes to (nblocks, 128, NF+)
so chunk DMA slices only the leading block dim (Mosaic requires lane-dim
slices aligned to the 128 tiling).

Depth-test semantics match the v1 fused kernels: packed (z & ~0x7F) | sub
keys, first-drawn-wins on sub-quantum ties in-chunk AND across chunks
(quantized cross-chunk merge; contract pinned by
``tests/test_depth_quantization.py``).

Reference parity: same ``Default.hlsl:47-161`` + ``LightingUtil.hlsl``
pixel shader via ``ops/shade_core.shade_core``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import setup_corners
from .raster_bin import FIELD_MATERIAL, GBUF_FIELD0, bin_triangles
from .raster_pallas import CHUNK, _PRECISIONS, _round_up_int
from .shade_core import num_output_channels, pack_shading_uniforms, shade_core

SPARSE_S = 8  # sublane sub-chunk for sparse tiles (1 sublane group)
SPARSE_MAX = 32  # own runs up to this many pairs take the sparse path


def _raster_tile_shade_row_kernel(
    # scalar prefetch
    starts_ref,  # (ntiles+1,) i32 SMEM
    meta_ref,  # (1,) i32: [y_offset]
    # inputs
    packed_ref,  # (NBLK, CHUNK, NFX) f32 pair-major blocks (ANY/HBM);
    #              lane column ``nf_tid`` holds bitcast(i32 tri id)
    mat_ref,  # (MPAD, MATK) f32 VMEM
    uni_ref,  # (1, U) f32 VMEM
    # outputs:
    #   out_id_ref (1, tile_h, tile_w) i32 — tid*mat_stride+mat (−1 bg)
    #   out_rgba_ref (1, C_out·tile_h, tile_w) f32 row-slabs
    #   [out_gb_ref] if want_gbuf — (1, num_ch·tile_h, tile_w) f32 row-slabs
    *rest,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    mat_stride: int,
    num_ch: int,
    nf_tid: int,  # lane index of the bitcast tri-id column
    nf_keep: int,  # fields kept in the extraction/accumulator (≥ nf_tid+1)
    mm_precision,
    num_dir: int,
    num_point: int,
    num_spot: int,
    apply_tonemap: bool,
    want_gbuf: bool,
    ibl: bool,
    sparse_s: int,
    sparse_max: int,
    shade: bool = True,
    has_zfloor: bool = False,
):
    k = 0
    zfloor_ref = None
    if has_zfloor:
        zfloor_ref = rest[k]
        k += 1
    out_id_ref = rest[k]
    k += 1
    out_rgba_ref = None
    if shade:
        out_rgba_ref = rest[k]
        k += 1
    out_gb_ref = None
    if want_gbuf:
        out_gb_ref = rest[k]
        k += 1
    fbuf, fsem, best_key, best_code, best_f, jbuf, jsem = rest[k : k + 7]
    p = tile_h * tile_w
    jblocks = jbuf.shape[0]
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x

    x_base = (tx * tile_w).astype(jnp.float32)
    y_base = (ty * tile_h + meta_ref[0]).astype(jnp.float32)

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = x_base + (pix % tile_w).astype(jnp.float32) + 0.5  # (1, P)
    py = y_base + (pix // tile_w).astype(jnp.float32) + 0.5

    best_key[:] = jnp.full((1, p), 0x7FFFFFFF, jnp.int32)
    best_code[:] = jnp.full((1, p), -1, jnp.int32)  # -1 = BACKGROUND
    best_f[:] = jnp.zeros_like(best_f)
    zf = zfloor_ref[0] if has_zfloor else None  # (1, P) row

    QMASK = jnp.int32(~0x7F)
    INFKEY = jnp.int32(0x7F800000)

    def eval_sub(fs, nvalid):
        """Depth-resolve one (S, NFX) pair slab against the tile's (1, P)
        pixel rows; sublanes ≥ ``nvalid`` are masked (tail / align waste).
        ``fs`` is a loaded VALUE — its lane slices below are compute ops
        (Mosaic only restricts REF/DMA slices to 128-aligned lanes)."""
        s = fs.shape[0]
        ts = jax.lax.bitcast_convert_type(
            fs[:, nf_tid : nf_tid + 1], jnp.int32
        )  # (S, 1) exact triangle ids (−1 sentinel pads)
        sub = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        dx = px - fs[:, 9:10]  # (S, P)
        dy = py - fs[:, 10:11]
        e0 = dx * fs[:, 0:1] + dy * fs[:, 3:4] + fs[:, 6:7]
        e1 = dx * fs[:, 1:2] + dy * fs[:, 4:5] + fs[:, 7:8]
        e2 = dx * fs[:, 2:3] + dy * fs[:, 5:6] + fs[:, 8:9]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        z = dx * fs[:, 11:12] + dy * fs[:, 12:13] + fs[:, 13:14]

        ok = inside & (z >= 0.0) & (z <= 1.0) & (sub < nvalid) & (ts >= 0)
        if has_zfloor:
            ok &= z > zf  # depth peeling: strictly-behind-floor only
        zbits = jax.lax.bitcast_convert_type(z, jnp.int32)
        key = jnp.where(ok, (zbits & QMASK) | sub, INFKEY)
        kmin = jnp.min(key, axis=0, keepdims=True)  # (1, P) — THE reduction
        onehot = (key == kmin).astype(jnp.float32)  # (S, P)
        cand = jax.lax.dot_general(
            fs[:, :nf_keep],
            onehot,
            (((0,), (0,)), ((), ())),
            precision=mm_precision,
            preferred_element_type=jnp.float32,
        )  # (nf_keep, P) — winner's field row per pixel column

        # Ids via exact integer min-reduction (never the matmul).
        if mat_stride > 1:
            code = ts * mat_stride + fs[
                :, FIELD_MATERIAL : FIELD_MATERIAL + 1
            ].astype(jnp.int32)
        else:
            code = ts
        win_code = jnp.min(
            jnp.where(
                key == kmin,
                jnp.broadcast_to(code, key.shape),
                jnp.int32(0x7FFFFFFF),
            ),
            axis=0,
            keepdims=True,
        )  # (1, P)

        better = (kmin < INFKEY) & (
            (kmin & QMASK) < (best_key[:] & QMASK)
        )  # quantized cross-chunk merge: ties keep the earlier (draw order)
        best_key[:] = jnp.where(better, kmin, best_key[:])
        best_code[:] = jnp.where(better, win_code, best_code[:])
        best_f[:] = jnp.where(better, cand, best_f[:])

    def process_range(lo, hi, s_sub):
        """Resolve pairs [lo, hi): 128-pair DMA blocks (double-buffered),
        each evaluated in ``s_sub``-sublane sub-steps covering only the
        [lo, hi) portion. Blocks align DOWN to 128 (DMA block granularity)
        and sub-steps align down to ``s_sub``; the foreign leading pairs are
        idempotent under the depth test (same argument as the v1 kernels)."""
        blk0 = lo // CHUNK
        n_chunks = (hi - blk0 * CHUNK + CHUNK - 1) // CHUNK

        def make_dma(slot, j):
            return pltpu.make_async_copy(
                packed_ref.at[blk0 + j], fbuf.at[slot], fsem.at[slot]
            )

        make_dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                make_dma((j + 1) % 2, j + 1).start()

            make_dma(slot, j).wait()
            cbase = (blk0 + j) * CHUNK
            c_lo = jnp.maximum(lo - cbase, 0)
            c_hi = jnp.minimum(hi - cbase, CHUNK)
            if s_sub >= CHUNK:
                eval_sub(fbuf[slot], c_hi)
            else:
                s0s = (c_lo // s_sub) * s_sub
                n_sub = (c_hi - s0s + s_sub - 1) // s_sub

                def sbody(kk, _):
                    off = pl.multiple_of(s0s + kk * s_sub, s_sub)
                    eval_sub(fbuf[slot, pl.ds(off, s_sub), :], c_hi - off)
                    return 0

                jax.lax.fori_loop(0, n_sub, sbody, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    g_end = starts_ref[0]
    s0 = starts_ref[i]
    s1 = starts_ref[i + 1]
    n_own = s1 - s0
    nonempty = (g_end > 0) | (s1 > s0)
    c_out = num_output_channels(ibl)

    # Jumbo-run residency (shared [0, g_end) pairs DMA'd once, grid step 0).
    @pl.when((i == 0) & (g_end > 0))
    def _():
        jf = pltpu.make_async_copy(
            packed_ref.at[pl.ds(0, jblocks)], jbuf, jsem.at[0]
        )
        jf.start()
        jf.wait()

    @pl.when(nonempty)
    def _():
        @pl.when(g_end > 0)
        def _():
            nj = jnp.minimum(g_end, jblocks * CHUNK)
            njc = (nj + CHUNK - 1) // CHUNK

            def jbody(c, _):
                eval_sub(jbuf[c], nj - c * CHUNK)
                return 0

            jax.lax.fori_loop(0, njc, jbody, 0)

        @pl.when(g_end > jblocks * CHUNK)
        def _():
            process_range(jblocks * CHUNK, g_end, CHUNK)

        # Own run: sparse tiles take sublane sub-chunks (cost ∝ pairs),
        # dense tiles the full-width path — picked per tile at runtime.
        @pl.when((s1 > s0) & (n_own <= sparse_max))
        def _():
            process_range(s0, s1, sparse_s)

        @pl.when((s1 > s0) & (n_own > sparse_max))
        def _():
            process_range(s0, s1, CHUNK)

        # --- epilogue, all in (k, P) row layout -----------------------------
        bf = best_f[:]  # (NFX, P)
        dxp = px - bf[9:10, :]
        dyp = py - bf[10:11, :]
        a0 = GBUF_FIELD0
        planes = (
            bf[a0 : a0 + num_ch, :] * dxp
            + bf[a0 + num_ch : a0 + 2 * num_ch, :] * dyp
            + bf[a0 + 2 * num_ch : a0 + 3 * num_ch, :]
        )  # (CH, P): [attr·(1/w) … , 1/w]
        invw = planes[num_ch - 1 : num_ch, :]
        attrs = planes[: num_ch - 1, :] / jnp.where(
            jnp.abs(invw) > 1e-20, invw, 1.0
        )
        hit = best_code[:] >= 0  # (1, P)
        if want_gbuf:
            depth = bf[11:12, :] * dxp + bf[12:13, :] * dyp + bf[13:14, :]
            gb = jnp.concatenate([attrs, depth], axis=0)  # (num_ch, P)
            out_gb_ref[:] = jnp.where(hit, gb, 0.0).reshape(
                1, num_ch * tile_h, tile_w
            )

        if shade:
            # Material fetch (cbMaterial, Core.hlsl:64-81): one-hot MXU
            # matmul.
            mpad = mat_ref.shape[0]
            if mat_stride > 1:
                mid = jnp.where(hit, best_code[:] % mat_stride, 0)
            else:
                mid = bf[FIELD_MATERIAL : FIELD_MATERIAL + 1, :].astype(
                    jnp.int32
                )
            miota = jax.lax.broadcasted_iota(jnp.int32, (mpad, 1), 0)
            onehot_m = (miota == mid).astype(jnp.float32)  # (MPAD, P)
            props = jax.lax.dot_general(
                mat_ref[:],
                onehot_m,
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (MATK, P)

            pos = tuple(attrs[c : c + 1, :] for c in range(3))
            nrm = tuple(attrs[c : c + 1, :] for c in range(3, 6))
            props9 = tuple(props[c : c + 1, :] for c in range(9))
            rows = shade_core(
                pos,
                nrm,
                props9,
                uni_ref[:],
                num_dir=num_dir,
                num_point=num_point,
                num_spot=num_spot,
                ibl=ibl,
                apply_tonemap=apply_tonemap,
            )
            rgba = jnp.where(hit, jnp.concatenate(rows, axis=0), 0.0)
            out_rgba_ref[:] = rgba.reshape(1, c_out * tile_h, tile_w)
        out_id_ref[:] = best_code[:].reshape(1, tile_h, tile_w)

    @pl.when(jnp.logical_not(nonempty))
    def _():
        if shade:
            out_rgba_ref[:] = jnp.zeros_like(out_rgba_ref)
        out_id_ref[:] = jnp.full_like(out_id_ref, -1)
        if want_gbuf:
            out_gb_ref[:] = jnp.zeros_like(out_gb_ref)


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
        "big2_span",
        "big2_cap",
        "cull_backface",
        "num_materials",
        "num_dir",
        "num_point",
        "num_spot",
        "apply_tonemap",
        "want_gbuf",
        "interpret",
        "mm_precision",
        "sparse_s",
        "sparse_max",
    ),
)
def rasterize_binned_shade_row(
    verts_clip: jnp.ndarray,  # (T, 3, 4) corner-major clip coords
    packed_attrs: jnp.ndarray,  # (T, 3, 6) [pos_w, normal_w] corner attrs
    face_material: jnp.ndarray,  # (T,) i32
    mat_props: jnp.ndarray,  # (M, K≥9)
    light_strength: jnp.ndarray,
    light_direction: jnp.ndarray,
    light_position: jnp.ndarray,
    light_spot_power: jnp.ndarray,
    ambient: jnp.ndarray,
    eye: jnp.ndarray,
    sh9: jnp.ndarray | None = None,  # (9, 3) → fused-IBL variant
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
    big2_span: int = 0,
    big2_cap: int | None = None,
    cull_backface: bool = True,
    num_materials: int = 0,
    num_dir: int = 0,
    num_point: int = 0,
    num_spot: int = 0,
    apply_tonemap: bool = True,
    want_gbuf: bool = False,
    interpret: bool = False,
    mm_precision: str = "highest",
    sparse_s: int = SPARSE_S,
    sparse_max: int = SPARSE_MAX,
):
    """Row-layout fused raster+interpolate+shade (+tonemap) — same contract
    and outputs as :func:`raster_pallas.rasterize_binned_shade`, kernel cost
    scaling with PAIRS instead of tiles on sparse scenes. NOT differentiable
    (see the ``row_layout`` option of :func:`raster_pallas.raster_shade`)."""
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
        big2_span=big2_span,
        big2_cap=big2_cap,
        chunk=CHUNK,
        face_material=face_material,
        corner_channels=corner_channels,
        pair_major=True,
    )
    nf = binned.packed.shape[1]
    nf_tid = nf  # the appended bitcast tri-id column

    # Append bitcast tri ids as a field column, lane-pad to the 128 tiling
    # (DMA slices — even "full" ones — must be 128-aligned on the lane dim),
    # and fold pairs into 128-pair blocks so chunk DMA slices ONLY the
    # leading block dim.
    tidcol = jax.lax.bitcast_convert_type(
        binned.pair_tri.astype(jnp.int32), jnp.float32
    ).reshape(-1, 1)
    packedx = jnp.concatenate([binned.packed, tidcol], axis=1)
    nf_keep = _round_up_int(nf + 1, 8)
    nfx = _round_up_int(nf + 1, 128)
    if nfx > nf + 1:
        packedx = jnp.pad(packedx, ((0, 0), (0, nfx - nf - 1)))
    npairs = packedx.shape[0]
    npad = _round_up_int(npairs, CHUNK)
    if npad > npairs:
        # pad rows carry tid bits of −1 (reject): bitcast(-1) sentinel
        pad_rows = jnp.zeros((npad - npairs, nfx), jnp.float32)
        pad_rows = pad_rows.at[:, nf_tid].set(
            jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
        )
        packedx = jnp.concatenate([packedx, pad_rows], axis=0)
    packed_blocks = packedx.reshape(npad // CHUNK, CHUNK, nfx)

    tiles_x = -(-width // tile_w)
    tiles_y = -(-rows // tile_h)
    ntiles = tiles_y * tiles_x
    p = tile_h * tile_w

    m, matk = mat_props.shape
    mpad = max(8, _round_up_int(m, 8))
    kpad = max(8, _round_up_int(matk, 8))
    mat_table = jnp.zeros((mpad, kpad), jnp.float32)
    mat_table = jax.lax.dynamic_update_slice(mat_table, mat_props, (0, 0))

    ibl = sh9 is not None
    c_out = num_output_channels(ibl)
    uni = pack_shading_uniforms(
        light_strength, light_direction, light_position, light_spot_power,
        ambient, eye, sh9,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [packed_blocks, mat_table, uni]

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.int32),
        jax.ShapeDtypeStruct((ntiles, c_out * tile_h, tile_w), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, c_out * tile_h, tile_w),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if want_gbuf:
        out_shape.append(
            jax.ShapeDtypeStruct((ntiles, num_ch * tile_h, tile_w), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, num_ch * tile_h, tile_w),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    jblocks = max(1, min(8, packed_blocks.shape[0]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, nfx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, p), jnp.int32),  # best packed (z|sub) key
            pltpu.VMEM((1, p), jnp.int32),  # best tid·stride+mat code
            pltpu.VMEM((nf_keep, p), jnp.float32),  # best field row per pixel
            pltpu.VMEM((jblocks, CHUNK, nfx), jnp.float32),  # resident jumbo
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _raster_tile_shade_row_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        mat_stride=mat_stride if encode_material else 1,
        num_ch=num_ch,
        nf_tid=nf_tid,
        nf_keep=nf_keep,
        mm_precision=_PRECISIONS[mm_precision],
        num_dir=num_dir,
        num_point=num_point,
        num_spot=num_spot,
        apply_tonemap=apply_tonemap,
        want_gbuf=want_gbuf,
        ibl=ibl,
        sparse_s=sparse_s,
        sparse_max=sparse_max,
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
        tile_rgba.reshape(tiles_y, tiles_x, c_out, tile_h, tile_w)
        .transpose(0, 3, 1, 4, 2)
        .reshape(tiles_y * tile_h, tiles_x * tile_w, c_out)
    )[:rows, :width]

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
            .reshape(tiles_y, tiles_x, num_ch, tile_h, tile_w)
            .transpose(0, 3, 1, 4, 2)
            .reshape(tiles_y * tile_h, tiles_x * tile_w, num_ch)
        )[:rows, :width]
        return rgba, tri_id, mat_id, gb[..., : num_ch - 1]
    return rgba, tri_id, mat_id


def _tile_zfloor_row(z_floor, rows, width, tiles_y, tiles_x, tile_h, tile_w):
    """(rows, W) z-floor → (ntiles, 1, P) row-layout tile blocks (the row
    kernel's pixels live on lanes). Padding = −inf (padded pixels accept
    everything; they are cropped)."""
    zf = jnp.pad(
        z_floor,
        ((0, tiles_y * tile_h - rows), (0, tiles_x * tile_w - width)),
        constant_values=-jnp.inf,
    )
    return (
        zf.reshape(tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tiles_x, 1, tile_h * tile_w)
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
        "big_cap",
        "big2_span",
        "big2_cap",
        "cull_backface",
        "num_materials",
        "interpret",
        "mm_precision",
        "sparse_s",
        "sparse_max",
    ),
)
def rasterize_binned_gbuffer_row(
    verts_clip: jnp.ndarray,  # (T, 3, 4) corner-major clip coords
    packed_attrs: jnp.ndarray,  # (T, 3, C) corner attrs
    face_material: jnp.ndarray | None = None,
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
    big2_span: int = 0,
    big2_cap: int | None = None,
    cull_backface: bool = True,
    num_materials: int = 0,
    interpret: bool = False,
    mm_precision: str = "highest",
    z_floor: jnp.ndarray | None = None,
    sparse_s: int = SPARSE_S,
    sparse_max: int = SPARSE_MAX,
):
    """Row-layout fused raster + G-buffer — same contract and outputs as
    :func:`raster_pallas.rasterize_binned_gbuffer` (corner-major input
    only), kernel cost scaling with pairs instead of tiles. Serves the
    TEXTURED deferred path. NOT differentiable — see the ``row_layout``
    option of :func:`raster_pallas.raster_gbuffer`.

    Returns (attrs (rows,W,C), depth (rows,W), tri_id, mat_id-or-None)."""
    if rows is None:
        rows = height
    y_offset = jnp.asarray(y_offset, jnp.int32)
    num_t = verts_clip.shape[0]

    want_material = face_material is not None
    mat_stride = 1
    encode_material = False
    if want_material:
        assert num_materials > 0, "pass static num_materials with face_material"
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
        big2_span=big2_span,
        big2_cap=big2_cap,
        chunk=CHUNK,
        face_material=face_material if encode_material else None,
        corner_channels=corner_channels,
        pair_major=True,
    )
    nf = binned.packed.shape[1]
    nf_tid = nf

    tidcol = jax.lax.bitcast_convert_type(
        binned.pair_tri.astype(jnp.int32), jnp.float32
    ).reshape(-1, 1)
    packedx = jnp.concatenate([binned.packed, tidcol], axis=1)
    nf_keep = _round_up_int(nf + 1, 8)
    nfx = _round_up_int(nf + 1, 128)
    if nfx > nf + 1:
        packedx = jnp.pad(packedx, ((0, 0), (0, nfx - nf - 1)))
    npairs = packedx.shape[0]
    npad = _round_up_int(npairs, CHUNK)
    if npad > npairs:
        pad_rows = jnp.zeros((npad - npairs, nfx), jnp.float32)
        pad_rows = pad_rows.at[:, nf_tid].set(
            jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
        )
        packedx = jnp.concatenate([packedx, pad_rows], axis=0)
    packed_blocks = packedx.reshape(npad // CHUNK, CHUNK, nfx)

    tiles_x = -(-width // tile_w)
    tiles_y = -(-rows // tile_h)
    ntiles = tiles_y * tiles_x
    p = tile_h * tile_w

    dummy_mat = jnp.zeros((8, 8), jnp.float32)
    dummy_uni = jnp.zeros((1, 8), jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [packed_blocks, dummy_mat, dummy_uni]
    if z_floor is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(
            _tile_zfloor_row(z_floor, rows, width, tiles_y, tiles_x, tile_h, tile_w)
        )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, tile_h, tile_w), jnp.int32),
        jax.ShapeDtypeStruct((ntiles, num_ch * tile_h, tile_w), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, num_ch * tile_h, tile_w),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]

    jblocks = max(1, min(8, packed_blocks.shape[0]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, nfx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, p), jnp.int32),
            pltpu.VMEM((1, p), jnp.int32),
            pltpu.VMEM((nf_keep, p), jnp.float32),
            pltpu.VMEM((jblocks, CHUNK, nfx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _raster_tile_shade_row_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        mat_stride=mat_stride if encode_material else 1,
        num_ch=num_ch,
        nf_tid=nf_tid,
        nf_keep=nf_keep,
        mm_precision=_PRECISIONS[mm_precision],
        num_dir=0,
        num_point=0,
        num_spot=0,
        apply_tonemap=False,
        want_gbuf=True,
        ibl=False,
        sparse_s=sparse_s,
        sparse_max=sparse_max,
        shade=False,
        has_zfloor=z_floor is not None,
    )
    tile_ids, tile_gb = pl.pallas_call(
        kernel,
        out_shape=out_shape,
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
        tile_gb.reshape(tiles_y, tiles_x, num_ch, tile_h, tile_w)
        .transpose(0, 3, 1, 4, 2)
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
