"""Combined per-material shading textures: one gather for all slots.

TPU-specific optimisation of the texture stage: XLA gathers are
latency-bound (~10⁸/s), so five separate slot samples × 4 bilinear taps per
pixel dominate textured-shading time. Because every slot samples the SAME
transformed uv (one g_MatTransform per material — Core.hlsl:64), all slot
channels can be baked side-by-side into one page per textured material:

    channels 0-2  albedo.rgb      (sRGB-decoded)
    channels 3-5  specular.rgb    (sRGB-decoded; 0 where unbound)
    channel  6    metallic
    channel  7    roughness
    channels 8-10 normal.xyz
    channel  11   opacity
    channels 12-15 pad

One 4-tap gather of 16-wide rows then feeds the whole material sample; the
per-material has_tex masks still choose texture-vs-constant per slot, so the
semantics are bit-identical to the separate-atlas path. The bake is a pure
jnp function of the slot atlas → texel gradients still flow (optimise either
representation).

Only materials that bind at least one texture get a combined page; analytic
materials share page 0 (never read — masked).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.material import (
    MaterialBank,
    SLOT_DIFFUSE,
    SLOT_METALLIC,
    SLOT_NORMAL,
    SLOT_OPACITY,
    SLOT_ROUGHNESS,
    SLOT_SPECULAR,
)
from .texture import TextureAtlas, pad_gather_rows

NUM_COMBINED = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CombinedAtlas:
    """(P, S, S, NUM_COMBINED) pages + per-material page index.

    ``mips``: optional combined-page mip pyramid (level 0 == ``pages``),
    baked by :func:`build_combined` with ``num_levels > 1`` — the screen-
    space-LOD sampling path (``render(mip_lod=True)``) needs it."""

    pages: jnp.ndarray  # (P, S, S, 16)
    material_page: jnp.ndarray  # (M,) i32 — 0 for analytic materials
    mips: tuple | None = None  # tuple[(P, S>>l, S>>l, 16)] incl. level 0

    @property
    def size(self) -> int:
        return self.pages.shape[1]

    @property
    def num_levels(self) -> int:
        return 1 if self.mips is None else len(self.mips)


def build_combined(
    materials: MaterialBank, atlas: TextureAtlas, num_levels: int | None = None
) -> CombinedAtlas:
    """Bake the combined pages (differentiable in the slot atlas texels).

    ``num_levels``: build that many combined mip levels (None → full chain
    if the source atlas has one, else 1). Mips are 2×2 box reductions of the
    combined level 0 — still a pure jnp function of the slot texels."""
    m = materials
    num_m = m.num_materials
    base = atlas.mips[0]  # (N, S, S, 4)
    s = base.shape[1]

    import numpy as np

    has = np.asarray(m.has_tex)
    textured_rows = np.nonzero(has.sum(axis=1) > 0)[0]
    num_pages = max(1, len(textured_rows))

    material_page = np.zeros((num_m,), np.int32)
    for p, row in enumerate(textured_rows):
        material_page[row] = p

    def page_for(row):
        def slot_tex(slot, channels):
            page = m.tex_index[row, slot]
            tex = base[page]  # (S,S,4)
            present = m.has_tex[row, slot]
            return tex[..., :channels] * present

        albedo = slot_tex(SLOT_DIFFUSE, 3)
        spec = slot_tex(SLOT_SPECULAR, 3)
        metal = slot_tex(SLOT_METALLIC, 1)
        rough = slot_tex(SLOT_ROUGHNESS, 1)
        normal = slot_tex(SLOT_NORMAL, 3)
        opac = slot_tex(SLOT_OPACITY, 1)
        pad = jnp.zeros((s, s, 4), base.dtype)
        return jnp.concatenate([albedo, spec, metal, rough, normal, opac, pad], axis=-1)

    pages = jnp.stack([page_for(int(r)) for r in (textured_rows if len(textured_rows) else [0])])
    if num_levels is None:
        num_levels = atlas.num_levels
    mips = None
    if num_levels > 1:
        levels = [pages]
        while len(levels) < num_levels and levels[-1].shape[1] > 1:
            prev = levels[-1]
            np_, h, w, c = prev.shape
            levels.append(
                prev.reshape(np_, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            )
        mips = tuple(levels)
    return CombinedAtlas(
        pages=pages, material_page=jnp.asarray(material_page), mips=mips
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedCombinedAtlas:
    """u8-quantized combined pages, 12 channels packed into 3 uint32 words.

    The fast sampling representation: TPU gather cost at multi-million-row
    tables scales with row ELEMENT count (measured: (2M,16) f32 rows gather
    at ~48 ms/tap at 1080p, (2M,4) rows at ~12 ms), so packing the 12 shading
    channels into 4 uint32 lanes makes the whole bilinear fetch ~4× faster.
    This also matches the reference harder than f32 pages do: its texture
    units sample RGBA8 views with sRGB decode per tap before filtering
    (WICTextureLoader formats → *_SRGB), which is exactly what the unpack
    path does. Not differentiable w.r.t. texels (use CombinedAtlas or the
    per-slot atlas for texture optimisation); uv gradients still flow
    through the bilinear weights.

    Word layout (little-endian u8 lanes):
      word0 = albedo.rgb (sRGB-encoded) | metallic  << 24
      word1 = specular.rgb (sRGB)       | roughness << 24
      word2 = normal.xyz (linear)       | opacity   << 24
    Each row stores its own 3 words AND its u-wrapped right neighbour's
    (paired rows, see texture.pair_equirect): a bilinear sample is then
    TWO row gathers (y0 and y1) instead of four corner gathers.
    """

    words: jnp.ndarray  # (P, S, S, 12) uint32: [self | right | down | dr] ×3
    material_page: jnp.ndarray  # (M,) i32
    mips_words: jnp.ndarray | None = None  # (R, 12) u32 stacked pyramid
    num_levels: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def size(self) -> int:
        return self.words.shape[1]

    @property
    def num_pages(self) -> int:
        return self.words.shape[0]


def _quad_pack_u8(level16: jnp.ndarray) -> jnp.ndarray:
    """(P, S, S, ≥12) linear f32 → (P, S, S, 12) u32: sRGB-encoded u8 words
    (albedo|metallic, specular|roughness, normal|opacity) for the full quad
    bilinear footprint — one row gather per sample."""
    from .texture import linear_to_srgb

    def u8(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint32)

    albedo = u8(linear_to_srgb(level16[..., 0:3]))
    spec = u8(linear_to_srgb(level16[..., 3:6]))
    metal = u8(level16[..., 6])
    rough = u8(level16[..., 7])
    normal = u8(level16[..., 8:11])
    opac = u8(level16[..., 11])
    w0 = albedo[..., 0] | (albedo[..., 1] << 8) | (albedo[..., 2] << 16) | (metal << 24)
    w1 = spec[..., 0] | (spec[..., 1] << 8) | (spec[..., 2] << 16) | (rough << 24)
    w2 = normal[..., 0] | (normal[..., 1] << 8) | (normal[..., 2] << 16) | (opac << 24)
    self3 = jnp.stack([w0, w1, w2], axis=-1)  # (P, S, S, 3)
    right3 = jnp.roll(self3, -1, axis=2)
    down3 = jnp.roll(self3, -1, axis=1)
    downright3 = jnp.roll(right3, -1, axis=1)
    return jnp.concatenate([self3, right3, down3, downright3], axis=-1)


def build_combined_packed(
    materials: MaterialBank, atlas: TextureAtlas, num_levels: int | None = None
) -> PackedCombinedAtlas:
    """Quantize the f32 combined pages to the packed u8 representation."""
    comb = build_combined(materials, atlas, num_levels)
    words = _quad_pack_u8(comb.pages)
    mips_words = None
    nl = 1
    if comb.mips is not None and len(comb.mips) > 1:
        mips_words = _stack_level_rows([_quad_pack_u8(m) for m in comb.mips])
        nl = len(comb.mips)
    return PackedCombinedAtlas(
        words=words,
        material_page=comb.material_page,
        mips_words=mips_words,
        num_levels=nl,
    )


def _unpack_tap(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) uint32 words → (..., 12) linear f32 (sRGB decode on color
    words)."""
    from .texture import srgb_to_linear

    def lanes(word):
        return jnp.stack(
            [
                (word & 0xFF).astype(jnp.float32),
                ((word >> 8) & 0xFF).astype(jnp.float32),
                ((word >> 16) & 0xFF).astype(jnp.float32),
                ((word >> 24) & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        ) * (1.0 / 255.0)

    c0 = lanes(w[..., 0])  # albedo.rgb, metallic
    c1 = lanes(w[..., 1])  # spec.rgb, roughness
    c2 = lanes(w[..., 2])  # normal.xyz, opacity
    albedo = srgb_to_linear(c0[..., 0:3])
    spec = srgb_to_linear(c1[..., 0:3])
    return jnp.concatenate(
        [
            albedo,
            spec,
            c0[..., 3:4],  # metallic
            c1[..., 3:4],  # roughness
            c2[..., 0:3],  # normal
            c2[..., 3:4],  # opacity
        ],
        axis=-1,
    )


def sample_combined_packed(
    packed: PackedCombinedAtlas,
    material_id: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool = True,
    lod: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear sample of the quad-packed u8 pages: ONE gather of 12-word
    rows (the whole 2×2 footprint per row), sRGB-decode per tap, then filter
    in linear space (RGBA8 HW parity). With ``lod`` (and baked mips) a
    stacked trilinear sample — two gathers. uv (..., 2) → (..., 12)."""
    words = packed.words
    s = words.shape[1]
    n = words.shape[0]
    page = packed.material_page[material_id]

    def sample_at(flat, sl):
        i00, _i01, _i10, _i11, fx, fy = _level_quad_indices(
            n, s, sl, page, uv, wrap
        )
        q = flat[i00]  # (..., 12)
        t00 = _unpack_tap(q[..., 0:3])
        t01 = _unpack_tap(q[..., 3:6])
        t10 = _unpack_tap(q[..., 6:9])
        t11 = _unpack_tap(q[..., 9:12])
        top = t00 * (1.0 - fx) + t01 * fx
        bot = t10 * (1.0 - fx) + t11 * fx
        return top * (1.0 - fy) + bot * fy

    if lod is not None and packed.num_levels > 1:
        nl = packed.num_levels
        flat = pad_gather_rows(packed.mips_words)
        lodc = jnp.clip(lod, 0.0, nl - 1.0)
        l0 = jnp.floor(lodc)
        frac = (lodc - l0)[..., None]
        l0i = l0.astype(jnp.int32)
        l1i = jnp.minimum(l0i + 1, nl - 1)
        t0 = sample_at(flat, jnp.right_shift(s, l0i))
        t1 = sample_at(flat, jnp.right_shift(s, l1i))
        return t0 * (1.0 - frac) + t1 * frac
    return sample_at(pad_gather_rows(words.reshape(-1, 12)), s)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HalfCombinedAtlas:
    """f16-pair-packed combined pages — the FAST DIFFERENTIABLE path.

    TPU gather cost at multi-million-row tables scales with row ELEMENT
    count and is dtype-INsensitive (PERF.md gather laws), so packing two
    f16 channels per uint32 element more than halves the fetch cost of the
    f32 pages while keeping ~1e-3 absolute texel precision (f16 in [0,1] —
    better than the reference's own RGBA8 units). Rows carry the u-wrapped
    right neighbour (texture.pair_equirect layout), so a bilinear sample is
    TWO row gathers of 12 uint32 elements vs the f32 path's four of 16 f32.

    Differentiability: the packed words are integers, but
    :func:`sample_combined_half` puts a custom VJP at the tap fetch — texel
    cotangents scatter straight into the retained f32 ``pages``
    (straight-through w.r.t. the ≤2⁻¹¹ forward quantization), uv gradients
    come from ordinary autodiff of the filter weights. When only
    material/light gradients are requested, XLA dead-code-eliminates the
    texel scatter entirely.
    """

    words: jnp.ndarray  # (P, S, S, 24) u32: [t00 | t01 | t10 | t11] ×6 words
    pages: jnp.ndarray  # (P, S, S, 16) f32 — backward/reference values
    material_page: jnp.ndarray  # (M,) i32
    mips_words: jnp.ndarray | None = None  # (R, 24) u32 stacked pyramid
    mips_stack: jnp.ndarray | None = None  # (R, 12) f32 — lod-path grad target
    num_levels: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def size(self) -> int:
        return self.words.shape[1]

    @property
    def num_pages(self) -> int:
        return self.words.shape[0]


def _quad_pack_f16(level12: jnp.ndarray) -> jnp.ndarray:
    """(P, S, S, 12) f32 → (P, S, S, 24) u32 quad-f16 words."""
    h = level12.astype(jnp.float16)
    b = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
    self6 = b[..., 0::2] | (b[..., 1::2] << 16)  # (P, S, S, 6)
    right6 = jnp.roll(self6, -1, axis=2)  # u-wrapped right neighbour
    down6 = jnp.roll(self6, -1, axis=1)  # v-wrapped down neighbour
    downright6 = jnp.roll(right6, -1, axis=1)
    return jnp.concatenate([self6, right6, down6, downright6], axis=-1)


def build_combined_half(
    materials: MaterialBank, atlas: TextureAtlas, num_levels: int | None = None
) -> HalfCombinedAtlas:
    comb = build_combined(materials, atlas, num_levels)
    # Quad layout: the whole 2×2 bilinear footprint in ONE row → the sample
    # is a single narrow gather (pairing halved 4 f32 gathers to 2; quad
    # halves the row count again — gathers are per-row latency-bound).
    words = _quad_pack_f16(comb.pages[..., :12])
    mips_words = mips_stack = None
    nl = 1
    if comb.mips is not None and len(comb.mips) > 1:
        lv12 = [m[..., :12] for m in comb.mips]
        mips_words = _stack_level_rows([_quad_pack_f16(m) for m in lv12])
        mips_stack = _stack_level_rows(lv12)
        nl = len(comb.mips)
    return HalfCombinedAtlas(
        words=words,
        pages=comb.pages,
        material_page=comb.material_page,
        mips_words=mips_words,
        mips_stack=mips_stack,
        num_levels=nl,
    )


def _unpack_half_tap(w6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) u32 → (..., 12) f32 (two f16 lanes per word)."""
    lo = jax.lax.bitcast_convert_type(
        (w6 & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (w6 >> 16).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    # channels interleave back: word k holds (2k, 2k+1)
    return jnp.stack([lo, hi], axis=-1).reshape(*w6.shape[:-1], 12)


def _sample_half_words(words, material_page, material_id, uv, wrap):
    """Forward-only sample of the packed words (no pages dependency)."""
    s = words.shape[1]
    t00, t01, t10, t11, fx, fy = _half_taps_and_weights(
        words, None, material_page, material_id, uv, wrap, differentiable=False
    )
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)


def _half_taps_and_weights(
    words, pages, material_page, material_id, uv, wrap, differentiable
):
    """The 4 bilinear taps (f32, unpacked from the quad f16 words — ONE row
    gather) plus filter weights. With ``differentiable=True`` the tap fetch
    carries a custom VJP whose backward scatter-adds the tap cotangents
    straight into ``pages`` (straight-through w.r.t. the ≤2⁻¹¹ f16
    quantization) — NO f32-path recompute: an earlier backward re-ran the
    4-gather f32 sample (jax.vjp of :func:`sample_combined`), which under
    ``jax.grad`` made the half path SLOWER than the f32 path it was meant to
    beat (measured 4.7 vs 7.4 Mpix/s fwd+bwd at 1080p). uv gradients come
    from the ordinary autodiff of the lerp weights outside the fetch."""
    s = words.shape[1]
    page = material_page[material_id]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    if wrap:
        x0w, x1w = jnp.mod(x0, s), jnp.mod(x0 + 1, s)
        y0w, y1w = jnp.mod(y0, s), jnp.mod(y0 + 1, s)
    else:
        # quad rows store the WRAPPED right/down texels; emulate clamp by
        # clipping the anchor a texel early and saturating the filter weight
        # toward the clamped edge — exactly the duplicate-edge-texel filter
        # of sample_combined (same trick as sample_combined_packed's x).
        x0w = jnp.clip(x0, 0, s - 2)
        x1w = x0w + 1
        x0e = x0[..., None]
        fx = jnp.where(x0e > s - 2, 1.0, jnp.where(x0e < 0, 0.0, fx))
        y0w = jnp.clip(y0, 0, s - 2)
        y1w = y0w + 1
        y0e = y0[..., None]
        fy = jnp.where(y0e > s - 2, 1.0, jnp.where(y0e < 0, 0.0, fy))
    idx = (page * s + y0w) * s + x0w
    flat = pad_gather_rows(words.reshape(-1, 24))

    if not differentiable:
        q = flat[idx]  # (..., 24): t00 | t01 | t10 | t11
        return (
            _unpack_half_tap(q[..., 0:6]),
            _unpack_half_tap(q[..., 6:12]),
            _unpack_half_tap(q[..., 12:18]),
            _unpack_half_tap(q[..., 18:24]),
            fx,
            fy,
        )

    # Texel indices each tap actually reads — the scatter targets of the
    # backward (right/down halves of a quad row = the x1/y1 columns).
    row_t = (page * s + y0w) * s
    row_b = (page * s + y1w) * s
    idx01 = row_t + x1w
    idx10 = row_b + x0w
    idx11 = row_b + x1w
    num_texels = pages.shape[0] * s * s

    @jax.custom_vjp
    def fetch(flat_w, pages_, i00, i01, i10, i11):
        q = flat_w[i00]
        return (
            _unpack_half_tap(q[..., 0:6]),
            _unpack_half_tap(q[..., 6:12]),
            _unpack_half_tap(q[..., 12:18]),
            _unpack_half_tap(q[..., 18:24]),
        )

    def fetch_fwd(flat_w, pages_, i00, i01, i10, i11):
        return fetch(flat_w, pages_, i00, i01, i10, i11), (i00, i01, i10, i11)

    def fetch_bwd(res, g):
        import numpy as np

        i00, i01, i10, i11 = res
        pf = jnp.zeros((num_texels, NUM_COMBINED), jnp.float32)
        for idx_, gt in zip((i00, i01, i10, i11), g):
            pf = pf.at[idx_.reshape(-1), :12].add(
                gt.reshape(-1, 12), mode="drop"
            )
        g_pages = pf.reshape(pages.shape)
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat), g_pages, z(i00), z(i01), z(i10), z(i11))

    fetch.defvjp(fetch_fwd, fetch_bwd)
    t00, t01, t10, t11 = fetch(flat, pages, idx, idx01, idx10, idx11)
    return t00, t01, t10, t11, fx, fy


def _half_fetch_rows_st(flat24, target12, i00, i01, i10, i11):
    """Fetch quad-f16 tap rows (ONE gather) from a stacked (R, 24) u32
    table; tap cotangents scatter straight-through into the matching
    (R, 12) f32 value table."""

    @jax.custom_vjp
    def fetch(fl, tgt, j00, j01, j10, j11):
        q = fl[j00]
        return (
            _unpack_half_tap(q[..., 0:6]),
            _unpack_half_tap(q[..., 6:12]),
            _unpack_half_tap(q[..., 12:18]),
            _unpack_half_tap(q[..., 18:24]),
        )

    def fwd(fl, tgt, j00, j01, j10, j11):
        return fetch(fl, tgt, j00, j01, j10, j11), (j00, j01, j10, j11)

    def bwd(res, g):
        import numpy as np

        tf = jnp.zeros(target12.shape, jnp.float32)
        for idx_, gt in zip(res, g):
            tf = tf.at[idx_.reshape(-1)].add(gt.reshape(-1, 12), mode="drop")
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat24), tf, z(res[0]), z(res[1]), z(res[2]), z(res[3]))

    fetch.defvjp(fwd, bwd)
    return fetch(flat24, target12, i00, i01, i10, i11)


def sample_combined_half(
    half: HalfCombinedAtlas,
    material_id: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool = True,
    lod: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear sample of the f16-quad-packed pages (ONE gather),
    differentiable w.r.t. ``half.pages`` texels (straight-through scatter
    backward — dead-code-eliminated when texel grads are unused) and ``uv``
    (autodiff of the filter weights over the fetched taps). With ``lod``
    (and baked mips) a stacked trilinear sample — two gathers, texel grads
    into ``half.mips_stack``. uv (..., 2) → (..., 12)."""
    if lod is not None and half.num_levels > 1:
        nl = half.num_levels
        n, s = half.num_pages, half.size
        page = half.material_page[material_id]
        lodc = jnp.clip(lod, 0.0, nl - 1.0)
        l0 = jnp.floor(lodc)
        frac = (lodc - l0)[..., None]
        l0i = l0.astype(jnp.int32)
        l1i = jnp.minimum(l0i + 1, nl - 1)
        flat = pad_gather_rows(half.mips_words)

        def tap_level(li):
            sl = jnp.right_shift(s, li)
            i00, i01, i10, i11, fx, fy = _level_quad_indices(
                n, s, sl, page, uv, wrap
            )
            t00, t01, t10, t11 = _half_fetch_rows_st(
                flat, half.mips_stack, i00, i01, i10, i11
            )
            top = t00 * (1.0 - fx) + t01 * fx
            bot = t10 * (1.0 - fx) + t11 * fx
            return top * (1.0 - fy) + bot * fy

        return (tap_level(l0i) * (1.0 - frac) + tap_level(l1i) * frac).astype(
            jnp.float32
        )
    t00, t01, t10, t11, fx, fy = _half_taps_and_weights(
        half.words, half.pages, half.material_page, material_id, uv, wrap,
        differentiable=True,
    )
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)


def _quad_pack12(level: jnp.ndarray) -> jnp.ndarray:
    """(P, S, S, 12) → (P, S, S, 48): the 2×2 bilinear footprint (self |
    right | down | down-right, u/v wrapped) side by side — one row gather
    per bilinear sample."""
    right = jnp.roll(level, -1, axis=2)
    down = jnp.roll(level, -1, axis=1)
    downright = jnp.roll(right, -1, axis=1)
    return jnp.concatenate([level, right, down, downright], axis=-1)


def _stack_level_rows(levels: list[jnp.ndarray]) -> jnp.ndarray:
    """Flatten per-level (P, S_l, S_l, C) arrays into one level-major row
    table (R, C) — row offsets follow texture._stacked_level_offset."""
    return jnp.concatenate([m.reshape(-1, m.shape[-1]) for m in levels], axis=0)


def _level_quad_indices(n: int, s: int, sl, page, uv, wrap: bool):
    """Row indices of the 4 bilinear taps at a (possibly per-pixel) mip
    level of a stacked quad table, plus filter weights. ``sl`` is the
    per-pixel level size (int array or python int)."""
    from .texture import _stacked_level_offset

    sl = jnp.asarray(sl, jnp.int32)
    base = _stacked_level_offset(n, s, sl) + page * (sl * sl)
    slf = sl.astype(jnp.float32)
    x = uv[..., 0] * slf - 0.5
    y = uv[..., 1] * slf - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    if wrap:
        # sl is a power of two but PER-PIXEL (mip level): wrap via bit mask —
        # vector integer mod by a dynamic divisor has no TPU lowering and
        # cost the whole lod path ~2.5× (round-4 measurement).
        m = sl - 1
        x0w, x1w = x0 & m, (x0 + 1) & m
        y0w, y1w = y0 & m, (y0 + 1) & m
    else:
        # clamp emulation on wrapped quad rows (duplicate-edge-texel filter)
        hi = jnp.maximum(sl - 2, 0)
        x0w = jnp.clip(x0, 0, hi)
        x1w = jnp.minimum(x0w + 1, sl - 1)
        x0e = x0[..., None]
        fx = jnp.where(x0e > hi[..., None], 1.0, jnp.where(x0e < 0, 0.0, fx))
        y0w = jnp.clip(y0, 0, hi)
        y1w = jnp.minimum(y0w + 1, sl - 1)
        y0e = y0[..., None]
        fy = jnp.where(y0e > hi[..., None], 1.0, jnp.where(y0e < 0, 0.0, fy))
    i00 = base + y0w * sl + x0w
    i01 = base + y0w * sl + x1w
    i10 = base + y1w * sl + x0w
    i11 = base + y1w * sl + x1w
    return i00, i01, i10, i11, fx, fy


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuadCombinedAtlas:
    """f32 QUAD-packed combined pages — the EXACT-GRADIENT fast path.

    Each row stores the full 2×2 bilinear footprint (self | right | down |
    down-right, u/v wrapped) of the 12 live shading channels in f32: a
    bilinear sample is ONE 48-element row gather. TPU row gathers are
    latency-bound per ROW and ~width-insensitive (PERF.md gather laws), so
    this costs the same as the f16 quad fetch while keeping bit-exact f32
    forward values AND exact texel gradients: the tap fetch carries a custom
    VJP that scatter-adds tap cotangents into the retained f32 ``pages``
    (the true filter-weight-times-cotangent gradient, not straight-through —
    the taps ARE the page values here). 4× the HBM of the f32 pages
    (4·12·4 B/texel); the speed path for texture optimisation loops."""

    taps: jnp.ndarray  # (P, S, S, 48) f32: [t00 | t01 | t10 | t11] ×12ch.
    # With ``tile`` > 1 the flat row ORDER is TILE-MAJOR: row =
    # page·S² + (⌊y/T⌋·(S/T) + ⌊x/T⌋)·T² + (y mod T)·T + (x mod T) — uv-
    # adjacent texels land in adjacent HBM rows, which the round-5
    # measurement puts 13-24% faster than row-major for screen-coherent
    # 1080p gathers at 503 MB tables (scripts/exp_texlayout.py; row-major
    # coherent gathers are even slower than random — bank-conflicted).
    pages: jnp.ndarray  # (P, S, S, 16) f32 — scatter target for texel grads
    material_page: jnp.ndarray  # (M,) i32
    # Optional stacked quad mip pyramid (level-major rows, incl. level 0):
    # per-pixel-level taps come back in ONE gather; trilinear = 2 gathers.
    # (Mip rows stay row-major within each level.)
    mips_taps: jnp.ndarray | None = None  # (R, 48) f32
    mips_stack: jnp.ndarray | None = None  # (R, 12) f32 — lod-path grad target
    num_levels: int = dataclasses.field(default=1, metadata=dict(static=True))
    tile: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def size(self) -> int:
        return self.pages.shape[1]

    @property
    def num_pages(self) -> int:
        return self.pages.shape[0]


QUAD_TILE = 16  # default tile-major edge (measured best 8-16, exp_texlayout)


def build_combined_quad(
    materials: MaterialBank,
    atlas: TextureAtlas,
    num_levels: int | None = None,
    tile: int | None = None,
) -> QuadCombinedAtlas:
    comb = build_combined(materials, atlas, num_levels)
    p12 = comb.pages[..., :12]
    taps = _quad_pack12(p12)
    s = taps.shape[1]
    t = QUAD_TILE if tile is None else tile
    if t > 1 and s % t == 0 and s >= t:
        # Tile-major texel order: (P, S, S, 48) → rows grouped by T×T tile.
        nt = s // t
        p = taps.shape[0]
        taps = (
            taps.reshape(p, nt, t, nt, t, 48)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(p, s, s, 48)  # flat row i == tile-major index i
        )
    else:
        t = 1
    mips_taps = mips_stack = None
    nl = 1
    if comb.mips is not None and len(comb.mips) > 1:
        lv12 = [m[..., :12] for m in comb.mips]
        mips_taps = _stack_level_rows([_quad_pack12(m) for m in lv12])
        mips_stack = _stack_level_rows(lv12)
        nl = len(comb.mips)
    return QuadCombinedAtlas(
        taps=taps,
        pages=comb.pages,
        material_page=comb.material_page,
        mips_taps=mips_taps,
        mips_stack=mips_stack,
        num_levels=nl,
        tile=t,
    )


def _quad_fetch_rows_st(flat48, target12, i00, i01, i10, i11):
    """Fetch quad tap rows (ONE gather) from a stacked (R, 48) table, with
    tap cotangents scattering into the matching (R, 12) f32 value table."""

    @jax.custom_vjp
    def fetch(fl, tgt, j00, j01, j10, j11):
        q = fl[j00]
        return q[..., 0:12], q[..., 12:24], q[..., 24:36], q[..., 36:48]

    def fwd(fl, tgt, j00, j01, j10, j11):
        return fetch(fl, tgt, j00, j01, j10, j11), (j00, j01, j10, j11)

    def bwd(res, g):
        import numpy as np

        tf = jnp.zeros(target12.shape, jnp.float32)
        for idx_, gt in zip(res, g):
            tf = tf.at[idx_.reshape(-1)].add(gt.reshape(-1, 12), mode="drop")
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat48), tf, z(res[0]), z(res[1]), z(res[2]), z(res[3]))

    fetch.defvjp(fwd, bwd)
    return fetch(flat48, target12, i00, i01, i10, i11)


def sample_combined_quad(
    quad: QuadCombinedAtlas,
    material_id: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool = True,
    lod: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear sample of the f32 quad pages: ONE row gather, exact f32
    forward (identical values to :func:`sample_combined`), exact texel
    gradients into ``quad.pages``, uv gradients through the filter weights.
    With ``lod`` (and a baked pyramid) a stacked-quad trilinear sample —
    TWO row gathers regardless of level count, texel grads into
    ``quad.mips_stack``. uv (..., 2) → (..., 12)."""
    if lod is not None and quad.num_levels > 1:
        nl = quad.num_levels
        n, s = quad.num_pages, quad.size
        page = quad.material_page[material_id]
        lodc = jnp.clip(lod, 0.0, nl - 1.0)
        l0 = jnp.floor(lodc)
        frac = (lodc - l0)[..., None]
        l0i = l0.astype(jnp.int32)
        l1i = jnp.minimum(l0i + 1, nl - 1)
        flat = pad_gather_rows(quad.mips_taps)

        def tap_level(li):
            sl = jnp.right_shift(s, li)
            i00, i01, i10, i11, fx, fy = _level_quad_indices(
                n, s, sl, page, uv, wrap
            )
            t00, t01, t10, t11 = _quad_fetch_rows_st(
                flat, quad.mips_stack, i00, i01, i10, i11
            )
            top = t00 * (1.0 - fx) + t01 * fx
            bot = t10 * (1.0 - fx) + t11 * fx
            return top * (1.0 - fy) + bot * fy

        return tap_level(l0i) * (1.0 - frac) + tap_level(l1i) * frac
    s = quad.size
    page = quad.material_page[material_id]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    if wrap:
        x0w, x1w = jnp.mod(x0, s), jnp.mod(x0 + 1, s)
        y0w, y1w = jnp.mod(y0, s), jnp.mod(y0 + 1, s)
    else:
        # Clamp emulation on wrapped quad rows: clip the anchor a texel
        # early and saturate the filter weight toward the clamped edge —
        # the duplicate-edge-texel filter of sample_combined (same trick as
        # _half_taps_and_weights).
        x0w = jnp.clip(x0, 0, s - 2)
        x1w = x0w + 1
        x0e = x0[..., None]
        fx = jnp.where(x0e > s - 2, 1.0, jnp.where(x0e < 0, 0.0, fx))
        y0w = jnp.clip(y0, 0, s - 2)
        y1w = y0w + 1
        y0e = y0[..., None]
        fy = jnp.where(y0e > s - 2, 1.0, jnp.where(y0e < 0, 0.0, fy))

    t_ = quad.tile
    if t_ > 1:
        # Tile-major rows (see QuadCombinedAtlas.taps): a handful of extra
        # integer VPU ops per tap index buys line-local HBM gathers.
        nt = s // t_

        def row_of(xc, yc):
            return (
                page * (s * s)
                + ((yc // t_) * nt + (xc // t_)) * (t_ * t_)
                + (yc % t_) * t_
                + (xc % t_)
            )

        i00 = row_of(x0w, y0w)
        i01 = row_of(x1w, y0w)
        i10 = row_of(x0w, y1w)
        i11 = row_of(x1w, y1w)
    else:
        row_t = (page * s + y0w) * s
        row_b = (page * s + y1w) * s
        i00 = row_t + x0w
        i01 = row_t + x1w
        i10 = row_b + x0w
        i11 = row_b + x1w
    flat = pad_gather_rows(quad.taps.reshape(-1, 48))
    num_texels = quad.pages.shape[0] * s * s

    @jax.custom_vjp
    def fetch(flat_w, pages_, j00, j01, j10, j11):
        q = flat_w[j00]  # ONE gather: the whole bilinear footprint
        return q[..., 0:12], q[..., 12:24], q[..., 24:36], q[..., 36:48]

    def fetch_fwd(flat_w, pages_, j00, j01, j10, j11):
        return fetch(flat_w, pages_, j00, j01, j10, j11), (j00, j01, j10, j11)

    def fetch_bwd(res, g):
        import numpy as np

        pf = jnp.zeros((num_texels, NUM_COMBINED), jnp.float32)
        for idx_, gt in zip(res, g):
            pf = pf.at[idx_.reshape(-1), :12].add(gt.reshape(-1, 12), mode="drop")
        if t_ > 1:
            # Scattered by tile-major row — permute back to the pages'
            # row-major (P, S, S, C) layout before returning the cotangent.
            np_ = quad.pages.shape[0]
            ntl = s // t_
            pf = (
                pf.reshape(np_, ntl, ntl, t_, t_, NUM_COMBINED)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(quad.pages.shape)
            )
        else:
            pf = pf.reshape(quad.pages.shape)
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat), pf, z(res[0]), z(res[1]),
                z(res[2]), z(res[3]))

    fetch.defvjp(fetch_fwd, fetch_bwd)
    t00, t01, t10, t11 = fetch(flat, quad.pages, i00, i01, i10, i11)
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_combined(
    combined: CombinedAtlas,
    material_id: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool = True,
    lod: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear sample of the combined page for each pixel's material.
    uv (..., 2) → (..., NUM_COMBINED). One 4-tap gather total; with ``lod``
    (and baked mips) a stacked-pyramid trilinear sample — two 4-tap gathers
    regardless of level count."""
    if lod is not None and combined.mips is not None:
        from .texture import sample_stacked_trilinear, stack_mips

        flat = stack_mips(combined.mips)
        page = combined.material_page[material_id]
        return sample_stacked_trilinear(
            flat,
            combined.pages.shape[0],
            combined.size,
            combined.num_levels,
            page,
            uv,
            lod,
            wrap,
        )
    pages = combined.pages
    s = pages.shape[1]
    page = combined.material_page[material_id]

    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    if wrap:
        x0w, x1w = jnp.mod(x0, s), jnp.mod(x0 + 1, s)
        y0w, y1w = jnp.mod(y0, s), jnp.mod(y0 + 1, s)
    else:
        x0w, x1w = jnp.clip(x0, 0, s - 1), jnp.clip(x0 + 1, 0, s - 1)
        y0w, y1w = jnp.clip(y0, 0, s - 1), jnp.clip(y0 + 1, 0, s - 1)

    flat = pad_gather_rows(pages.reshape(-1, NUM_COMBINED))
    idx = (page * s + y0w) * s
    t00 = flat[idx + x0w]
    t01 = flat[idx + x1w]
    idx1 = (page * s + y1w) * s
    t10 = flat[idx1 + x0w]
    t11 = flat[idx1 + x1w]
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)
