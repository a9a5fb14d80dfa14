"""Texture atlas, mip pyramid and differentiable bilinear/trilinear sampling.

TPU-native replacement for the reference's texture stack: WIC/DDS decode +
descriptor heaps + HW samplers (``DirectXTK12/WICTextureLoader``, the six
static samplers at ``PBRApp.cpp:1138-1193``, and the ``g_TextureArray[12]``
SRV binding at ``Core.hlsl:18``). All textures of a scene are packed into one
(N, S, S, 4) array — "descriptor heap as an array axis" — and sampled by
(page, uv) gathers, so texel grads flow via scatter-add in the backward pass.

Parity notes:
  * The reference loads every texture with a single mip
    (``WICTextureLoader.h:78`` generateMips=false) and samples anisotropic;
    we default to bilinear mip-0 (matching its effective footprint) but DO
    build a full mip chain and support trilinear, fixing the reference's
    aliasing gap (documented delta: anisotropic degrades to trilinear).
  * sRGB decode (albedo/specular) uses the exact piecewise sRGB EOTF,
    applied per-texel before filtering — same as D3D *_SRGB formats.
  * Address mode: wrap (the scene's material sampler g_SamAnisotropicWrap and
    sky sampler g_SamLinearWrap are both wrap); clamp supported via flag.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureAtlas:
    """Mip pyramid of N square texture pages.

    mips[l]: (N, S>>l, S>>l, 4) float32 (linearised — sRGB decode happens at
    atlas build so the hot sampling path is a pure gather+lerp).
    """

    mips: tuple[jnp.ndarray, ...]

    @property
    def num_pages(self) -> int:
        return self.mips[0].shape[0]

    @property
    def size(self) -> int:
        return self.mips[0].shape[1]

    @property
    def num_levels(self) -> int:
        return len(self.mips)


# Measured XLA-TPU gather pathology (see PERF.md): tables whose ROW COUNT
# falls in this zone gather ~2-3× slower (25 ms vs 8-12 ms for 2M indices at
# 1080p), independent of row width and dtype. Padding the table past the
# zone's upper edge restores full speed for the cost of a small concat.
GATHER_BAD_LO = 229376
GATHER_BAD_HI = 278528


def pad_gather_rows(flat: jnp.ndarray) -> jnp.ndarray:
    """Pad a (N, C) gather table's rows out of the slow-gather zone."""
    n = flat.shape[0]
    if GATHER_BAD_LO < n < GATHER_BAD_HI:
        flat = jnp.pad(flat, ((0, GATHER_BAD_HI - n), (0, 0)))
    return flat


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise sRGB EOTF (what *_SRGB texture formats apply)."""
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def build_mip_chain(base: np.ndarray, num_levels: int | None = None) -> list[np.ndarray]:
    """2×2 box-filter mip chain (the GenerateMips compute-shader analog,
    ``DirectXTK12/Shaders/Compiled/GenerateMips_main.inc``). Host-side numpy."""
    levels = [base]
    size = base.shape[1]
    if num_levels is None:
        num_levels = max(1, int(np.log2(size)) + 1)
    while len(levels) < num_levels and levels[-1].shape[1] > 1:
        prev = levels[-1]
        n, h, w, c = prev.shape
        levels.append(prev.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4)))
    return levels


def build_atlas(
    pages: list[np.ndarray],
    srgb_flags: list[bool],
    size: int | None = None,
    num_levels: int | None = None,
    dtype=jnp.float32,
) -> TextureAtlas:
    """Pack decoded images (H,W,C uint8 or float) into a square atlas.

    Non-square / mismatched images are resized with area-average or bilinear
    host-side. sRGB pages are linearised here (decode-before-filter).
    """
    if size is None:
        size = max(p.shape[0] for p in pages)

    packed = np.zeros((len(pages), size, size, 4), np.float32)
    for i, (img, srgb) in enumerate(zip(pages, srgb_flags)):
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=2)
        img = _resize_area(img, size, size)
        if srgb:
            rgb = img[..., :3]
            img = np.concatenate(
                [
                    np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4),
                    img[..., 3:],
                ],
                axis=2,
            )
        packed[i] = img

    mips = build_mip_chain(packed, num_levels)
    return TextureAtlas(mips=tuple(jnp.asarray(m, dtype) for m in mips))


def _resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side resize: integer-factor area average when shrinking by an
    exact multiple, bilinear otherwise."""
    h, w, c = img.shape
    if h == out_h and w == out_w:
        return img
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return img.reshape(out_h, fh, out_w, fw, c).mean(axis=(1, 3))
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = img[y0][:, x0] * (1 - fy) * (1 - fx)
    b = img[y0][:, x1] * (1 - fy) * fx
    cc = img[y1][:, x0] * fy * (1 - fx)
    d = img[y1][:, x1] * fy * fx
    return a + b + cc + d


# ---------------------------------------------------------------------------
# Device-side sampling
# ---------------------------------------------------------------------------


def _gather_texels(level: jnp.ndarray, page: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray):
    """level (N,S,S,4); page/iy/ix (...,) int32 → (...,4). Flattened gather
    (one gather instr instead of three chained ones)."""
    n, s = level.shape[0], level.shape[1]
    flat = pad_gather_rows(level.reshape(n * s * s, 4))
    idx = (page * s + iy) * s + ix
    return flat[idx]


def sample_bilinear(
    level: jnp.ndarray,
    page: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool = True,
) -> jnp.ndarray:
    """Bilinear sample of one mip level. uv (...,2) in [0,1] texture space,
    DirectX convention (v down, texel centers at (i+0.5)/S). Differentiable
    w.r.t. uv and texels."""
    s = level.shape[1]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
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
    t00 = _gather_texels(level, page, y0w, x0w)
    t01 = _gather_texels(level, page, y0w, x1w)
    t10 = _gather_texels(level, page, y1w, x0w)
    t11 = _gather_texels(level, page, y1w, x1w)
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)


def screen_space_lod(uv: jnp.ndarray, tex_size: int) -> jnp.ndarray:
    """Mip level from screen-space uv derivatives, (rows, W[, …], 2) → (rows, W).

    The analytic analog of the HW sampler's implicit ddx/ddy LOD
    (``Default.hlsl:80`` samples anisotropic — which the reference then
    defeats by loading 1-mip textures, ``WICTextureLoader.h:78``; we beat it
    by actually using the pyramid). Forward differences with edge
    replication; lod = log2 of the max texel-footprint axis, the standard
    isotropic D3D formula. Neighbouring-triangle pixels produce conservative
    (blurrier) estimates at silhouettes, same as HW quad derivatives."""
    ddx = jnp.diff(uv, axis=-2)
    ddx = jnp.concatenate([ddx, ddx[..., -1:, :]], axis=-2)
    ddy = jnp.diff(uv, axis=-3)
    ddy = jnp.concatenate([ddy, ddy[..., -1:, :, :]], axis=-3)
    r2 = jnp.maximum(
        jnp.sum(ddx * ddx, axis=-1), jnp.sum(ddy * ddy, axis=-1)
    ) * float(tex_size) ** 2
    return jnp.maximum(0.5 * jnp.log2(jnp.maximum(r2, 1e-12)), 0.0)


def screen_space_lod_aniso(
    uv: jnp.ndarray, tex_size: int, num_taps: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anisotropic footprint analysis: (rows, W, 2) uv → (lod (rows, W),
    major-axis uv step (rows, W, 2)).

    The D3D11 anisotropic model (``SamplerAnisotropicWrap``,
    ``Default.hlsl:80`` / ``PBRApp.cpp:1152-1158``): the pixel footprint's
    MAJOR axis is covered by ``num_taps`` trilinear taps, each filtered at
    the lod of the MINOR axis — widened where the major/minor ratio
    exceeds ``num_taps`` so the tap line still covers the footprint."""
    ddx = jnp.diff(uv, axis=-2)
    ddx = jnp.concatenate([ddx, ddx[..., -1:, :]], axis=-2)
    ddy = jnp.diff(uv, axis=-3)
    ddy = jnp.concatenate([ddy, ddy[..., -1:, :, :]], axis=-3)
    lx2 = jnp.sum(ddx * ddx, axis=-1) * float(tex_size) ** 2
    ly2 = jnp.sum(ddy * ddy, axis=-1) * float(tex_size) ** 2
    major_is_x = lx2 >= ly2
    major2 = jnp.maximum(jnp.maximum(lx2, ly2), 1e-12)
    minor2 = jnp.maximum(jnp.minimum(lx2, ly2), 1e-12)
    ratio = jnp.sqrt(jnp.clip(major2 / minor2, 1.0, float(num_taps) ** 2))
    eff_minor2 = jnp.maximum(minor2, major2 / (ratio * ratio))
    lod = jnp.maximum(0.5 * jnp.log2(eff_minor2), 0.0)
    axis = jnp.where(major_is_x[..., None], ddx, ddy)  # uv units
    return lod, axis


def sample_atlas_aniso(
    atlas: "TextureAtlas",
    page: jnp.ndarray,
    uv: jnp.ndarray,
    num_taps: int = 4,
    wrap: bool = True,
) -> jnp.ndarray:
    """Cheap N-tap anisotropic sample (the ``aniso_taps=N`` mode):
    ``num_taps`` trilinear taps spread across one pixel along the major
    footprint axis, averaged — closes the residual minor-axis over-blur of
    plain trilinear (RMS within a few % of a 16-tap oracle on the grazing-
    floor torture case, tests/test_aniso_delta.py) at N× the gather cost.
    Needs a (rows, W, …) screen layout for the derivatives and a baked mip
    pyramid (falls back to trilinear-at-lod semantics via sample_atlas)."""
    lod, axis = screen_space_lod_aniso(uv, atlas.size, num_taps)
    acc = None
    for k in range(num_taps):
        f = (k + 0.5) / num_taps - 0.5
        smp = sample_atlas(atlas, page, uv + axis * f, lod=lod, wrap=wrap)
        acc = smp if acc is None else acc + smp
    return acc / num_taps


def stack_mips(mips: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Concatenate a (N, S>>l, S>>l, C) mip pyramid into ONE flat (R, C)
    gather table (level-major). Per-pixel level offsets are then pure
    arithmetic — see :func:`_stacked_level_offset` — so a trilinear sample
    is 2 bilinear taps from one table instead of a masked sum over every
    level (which costs num_levels× the gathers)."""
    return pad_gather_rows(
        jnp.concatenate([m.reshape(-1, m.shape[-1]) for m in mips], axis=0)
    )


def _stacked_level_offset(n: int, s: int, sl: jnp.ndarray) -> jnp.ndarray:
    """Row offset of mip level with size ``sl`` in a :func:`stack_mips`
    table: Σ_{k<l} N·(S>>k)² = N·(4·S² − 4·sl²)/3 (exact in int32 — the
    difference of powers of 4 is divisible by 3)."""
    return (4 * n * (s * s - sl * sl)) // 3


def _sample_stacked_level(
    flat: jnp.ndarray,
    n: int,
    s: int,
    level: jnp.ndarray,  # (...,) int32 per-pixel mip level
    page: jnp.ndarray,
    uv: jnp.ndarray,
    wrap: bool,
) -> jnp.ndarray:
    """Bilinear tap at a PER-PIXEL integer mip level of a stacked pyramid."""
    sl = jnp.right_shift(s, level)  # (…,) per-pixel level size
    base = _stacked_level_offset(n, s, sl) + page * (sl * sl)
    x = uv[..., 0] * sl - 0.5
    y = uv[..., 1] * sl - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    if wrap:
        # per-pixel power-of-two level size: mask, not mod (no TPU vector
        # integer division — see texture_combined._level_quad_indices)
        m = sl - 1
        x0w, x1w = x0 & m, (x0 + 1) & m
        y0w, y1w = y0 & m, (y0 + 1) & m
    else:
        x0w, x1w = jnp.clip(x0, 0, sl - 1), jnp.clip(x0 + 1, 0, sl - 1)
        y0w, y1w = jnp.clip(y0, 0, sl - 1), jnp.clip(y0 + 1, 0, sl - 1)
    t00 = flat[base + y0w * sl + x0w]
    t01 = flat[base + y0w * sl + x1w]
    t10 = flat[base + y1w * sl + x0w]
    t11 = flat[base + y1w * sl + x1w]
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)


def sample_stacked_trilinear(
    flat: jnp.ndarray,
    n: int,
    s: int,
    num_levels: int,
    page: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    wrap: bool = True,
) -> jnp.ndarray:
    """Trilinear sample from a stacked pyramid: 2 per-pixel-level bilinear
    taps (8 gathers total, independent of level count)."""
    lod = jnp.clip(lod, 0.0, num_levels - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, num_levels - 1)
    t0 = _sample_stacked_level(flat, n, s, l0i, page, uv, wrap)
    t1 = _sample_stacked_level(flat, n, s, l1i, page, uv, wrap)
    return t0 * (1.0 - frac) + t1 * frac


def sample_atlas(
    atlas: TextureAtlas,
    page: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray | None = None,
    wrap: bool = True,
) -> jnp.ndarray:
    """Sample the atlas. lod=None → bilinear mip 0 (the reference's effective
    behaviour, its textures load with 1 mip); otherwise trilinear between
    floor(lod) and floor(lod)+1 via the stacked-pyramid path."""
    if lod is None or atlas.num_levels == 1:
        return sample_bilinear(atlas.mips[0], page, uv, wrap)
    flat = stack_mips(atlas.mips)
    return sample_stacked_trilinear(
        flat, atlas.num_pages, atlas.size, atlas.num_levels, page, uv, lod, wrap
    )


def pair_equirect(m: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) → (H, W, 2C): each row stores its texel AND its right
    (u-wrapped) neighbour side by side, so a bilinear sample needs only the
    two row fetches (y0, y1) instead of four corner fetches — per-pixel
    gathers are latency-bound, so this halves equirect sampling time."""
    right = jnp.roll(m, -1, axis=1)
    return jnp.concatenate([m, right], axis=-1)


def sample_equirect_paired(
    mp: jnp.ndarray, uv: jnp.ndarray, wrap_v: bool = True
) -> jnp.ndarray:
    """Bilinear equirect sample from a :func:`pair_equirect` map: 2 gathers.
    Bit-identical texel selection to :func:`sample_equirect`."""
    h, w = mp.shape[0], mp.shape[1]
    c = mp.shape[-1] // 2
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0w = jnp.mod(x0, w)
    if wrap_v:
        y0w, y1w = jnp.mod(y0, h), jnp.mod(y0 + 1, h)
    else:
        y0w, y1w = jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)
    flat = pad_gather_rows(mp.reshape(h * w, 2 * c))
    top2 = flat[y0w * w + x0w]  # (..., 2C): texel x0 | texel x0+1
    bot2 = flat[y1w * w + x0w]
    top = top2[..., :c] * (1.0 - fx) + top2[..., c:] * fx
    bot = bot2[..., :c] * (1.0 - fx) + bot2[..., c:] * fx
    return (top * (1.0 - fy) + bot * fy).astype(jnp.float32)


def quad_pack_equirect_u8(m: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) f32 in [0,1] → (H, W, 4) uint32: each row packs its own
    texel plus its right (u-wrapped), down (v-wrapped) and down-right
    neighbours as RGB8 words — the whole 2×2 bilinear footprint in ONE row,
    so a sample is ONE narrow gather instead of four (or two paired) wide
    ones. Built for LDR sky backgrounds, whose source data is 8-bit PNG
    stored raw/255 (models/sibl.load_background): the u8 quantization is
    bit-exact against the file, not a loss."""
    q = jnp.round(jnp.clip(m[..., :3], 0.0, 1.0) * 255.0).astype(jnp.uint32)
    word = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)  # (H, W)
    right = jnp.roll(word, -1, axis=1)
    down = jnp.roll(word, -1, axis=0)
    downright = jnp.roll(right, -1, axis=0)
    return jnp.stack([word, right, down, downright], axis=-1)


def sample_equirect_quad_u8(words: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a :func:`quad_pack_equirect_u8` map: ONE gather of
    (H·W, 4) uint32 rows per pixel. u and v both wrap (g_SamLinearWrap
    parity, Core.hlsl:22 — same texel selection as :func:`sample_equirect`
    with wrap_v=True). uv (..., 2) → (..., 3) f32."""
    h, w = words.shape[0], words.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0w = jnp.mod(x0f.astype(jnp.int32), w)
    y0w = jnp.mod(y0f.astype(jnp.int32), h)
    flat = pad_gather_rows(words.reshape(h * w, 4))
    q = flat[y0w * w + x0w]  # (..., 4): t00 | t01 | t10 | t11 words

    def rgb(word):
        return jnp.stack(
            [
                (word & 0xFF).astype(jnp.float32),
                ((word >> 8) & 0xFF).astype(jnp.float32),
                ((word >> 16) & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        ) * (1.0 / 255.0)

    top = rgb(q[..., 0]) * (1.0 - fx) + rgb(q[..., 1]) * fx
    bot = rgb(q[..., 2]) * (1.0 - fx) + rgb(q[..., 3]) * fx
    return top * (1.0 - fy) + bot * fy


def pair_pack_equirect_f16(m: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) f32 → (H, W, 2·⌈C/2⌉) uint32: channels packed two-per-word
    as f16, each row carrying itself AND its u-wrapped right neighbour
    (pair_equirect layout). Halves again the fetched element count of the
    paired-f32 layout — TPU gather cost scales with row element count and is
    dtype-insensitive (PERF.md gather laws). f16 keeps ~3 decimal digits,
    plenty for prefiltered radiance; pair with the f32 original through
    :func:`sample_equirect_paired_f16` for straight-through gradients."""
    c = m.shape[-1]
    if c % 2:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 1)))
    h16 = m.astype(jnp.float16)
    b = jax.lax.bitcast_convert_type(h16, jnp.uint16).astype(jnp.uint32)
    selfw = b[..., 0::2] | (b[..., 1::2] << 16)
    rightw = jnp.roll(selfw, -1, axis=1)
    return jnp.concatenate([selfw, rightw], axis=-1)


def _unpack_f16_words(w: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., nw) u32 → (..., c) f32 (two f16 lanes per word)."""
    lo = jax.lax.bitcast_convert_type(
        (w & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=-1).reshape(*w.shape[:-1], -1)[..., :c]


def quad_pack_equirect_f16(m: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) f32 → (H, W, 4·⌈C/2⌉) uint32: f16-packed channels with the
    whole 2×2 bilinear footprint (self, right, down, down-right; u and v
    wrapped) in ONE row — a sample is a single gather. Per-pixel equirect
    gathers at 1080p are LATENCY-bound per gathered row (~8-10 ms per 2M-row
    gather almost regardless of width — measured: f16-halving the row width
    changed IBL sampling cost by <1%), so halving the gather COUNT is the
    lever, not narrowing rows."""
    c = m.shape[-1]
    if c % 2:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 1)))
    h16 = m.astype(jnp.float16)
    b = jax.lax.bitcast_convert_type(h16, jnp.uint16).astype(jnp.uint32)
    selfw = b[..., 0::2] | (b[..., 1::2] << 16)
    rightw = jnp.roll(selfw, -1, axis=1)
    downw = jnp.roll(selfw, -1, axis=0)
    downrightw = jnp.roll(rightw, -1, axis=0)
    return jnp.concatenate([selfw, rightw, downw, downrightw], axis=-1)


def sample_equirect_quad_f16(
    words: jnp.ndarray,
    base: jnp.ndarray,
    uv: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear equirect sample from :func:`quad_pack_equirect_f16` words:
    ONE gather. u and v wrap (same texel selection as
    :func:`sample_equirect` with wrap_v=True). ``base`` (H, W, C) f32 is the
    unpacked original; tap cotangents scatter straight into it
    (straight-through w.r.t. f16 rounding, dead-code-eliminated when map
    gradients are unused); uv gradients via autodiff of the filter
    weights."""
    h, w = words.shape[0], words.shape[1]
    c = base.shape[-1]
    nw = words.shape[-1] // 4
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0w = jnp.mod(y0, h)
    y1w = jnp.mod(y0 + 1, h)
    idx = y0w * w + x0w
    idx01 = y0w * w + x1w
    idx10 = y1w * w + x0w
    idx11 = y1w * w + x1w
    flat = pad_gather_rows(words.reshape(h * w, 4 * nw))

    @jax.custom_vjp
    def fetch(flat_w, base_, i00, i01, i10, i11):
        q = flat_w[i00]
        return (
            _unpack_f16_words(q[..., 0 * nw : 1 * nw], c),
            _unpack_f16_words(q[..., 1 * nw : 2 * nw], c),
            _unpack_f16_words(q[..., 2 * nw : 3 * nw], c),
            _unpack_f16_words(q[..., 3 * nw : 4 * nw], c),
        )

    def fetch_fwd(flat_w, base_, i00, i01, i10, i11):
        return fetch(flat_w, base_, i00, i01, i10, i11), (i00, i01, i10, i11)

    def fetch_bwd(res, g):
        import numpy as np

        idxs = res
        bf = jnp.zeros((h * w, c), jnp.float32)
        for idx_, gt in zip(idxs, g):
            bf = bf.at[idx_.reshape(-1)].add(gt.reshape(-1, c), mode="drop")
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat), bf.reshape(base.shape), z(idxs[0]), z(idxs[1]), z(idxs[2]), z(idxs[3]))

    fetch.defvjp(fetch_fwd, fetch_bwd)
    t00, t01, t10, t11 = fetch(flat, base, idx, idx01, idx10, idx11)
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_equirect_paired_f16(
    words: jnp.ndarray,
    base: jnp.ndarray,
    uv: jnp.ndarray,
    wrap_v: bool = True,
) -> jnp.ndarray:
    """Bilinear equirect sample from :func:`pair_pack_equirect_f16` words:
    2 narrow gathers. Same texel selection as :func:`sample_equirect`.

    ``base`` (H, W, C) f32 is the unpacked original the words were built
    from; tap cotangents scatter straight into it (straight-through w.r.t.
    the f16 rounding), so gradients to the map flow exactly as in the f32
    path — and are dead-code-eliminated when unused. uv gradients come from
    the ordinary autodiff of the filter weights."""
    h, w = words.shape[0], words.shape[1]
    c = base.shape[-1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    if wrap_v:
        y0w, y1w = jnp.mod(y0, h), jnp.mod(y0 + 1, h)
    else:
        y0w, y1w = jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)
    idx_top = y0w * w + x0w
    idx_bot = y1w * w + x0w
    idx_top_r = y0w * w + x1w
    idx_bot_r = y1w * w + x1w
    nw = words.shape[-1] // 2
    flat = pad_gather_rows(words.reshape(h * w, 2 * nw))

    @jax.custom_vjp
    def fetch(flat_w, base_, it, ib, itr, ibr):
        top2 = flat_w[it]
        bot2 = flat_w[ib]
        return (
            _unpack_f16_words(top2[..., :nw], c),
            _unpack_f16_words(top2[..., nw:], c),
            _unpack_f16_words(bot2[..., :nw], c),
            _unpack_f16_words(bot2[..., nw:], c),
        )

    def fetch_fwd(flat_w, base_, it, ib, itr, ibr):
        return fetch(flat_w, base_, it, ib, itr, ibr), (it, ib, itr, ibr)

    def fetch_bwd(res, g):
        import numpy as np

        it, ib, itr, ibr = res
        g00, g01, g10, g11 = g
        bf = jnp.zeros((h * w, c), jnp.float32)
        for idx, gt in ((it, g00), (itr, g01), (ib, g10), (ibr, g11)):
            bf = bf.at[idx.reshape(-1)].add(gt.reshape(-1, c), mode="drop")
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (z(flat), bf.reshape(base.shape), z(it), z(ib), z(itr), z(ibr))

    fetch.defvjp(fetch_fwd, fetch_bwd)
    t00, t01, t10, t11 = fetch(flat, base, idx_top, idx_bot, idx_top_r, idx_bot_r)
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_equirect(env: jnp.ndarray, uv: jnp.ndarray, wrap_v: bool = True) -> jnp.ndarray:
    """Bilinear sample of a single equirect map env (H,W,C), uv in [0,1].
    u wraps (longitude seam); v wraps too by default for exact parity with the
    reference's g_SamLinearWrap sky sampler (Core.hlsl:22)."""
    h, w = env.shape[0], env.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0w, x1w = jnp.mod(x0, w), jnp.mod(x0 + 1, w)
    if wrap_v:
        y0w, y1w = jnp.mod(y0, h), jnp.mod(y0 + 1, h)
    else:
        y0w, y1w = jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)
    flat = env.reshape(h * w, env.shape[-1])
    t00 = flat[y0w * w + x0w]
    t01 = flat[y0w * w + x1w]
    t10 = flat[y1w * w + x0w]
    t11 = flat[y1w * w + x1w]
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy
