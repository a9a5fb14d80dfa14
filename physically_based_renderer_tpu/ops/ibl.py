"""Image-based lighting: diffuse irradiance + split-sum specular prefilter.

The reference stubbed IBL out (the ambient block at ``Default.hlsl:140-149``
is commented; only ``g_SkyArray[1]`` — an irradiance map slot — exists at
``Core.hlsl:16``). BASELINE.json config 5 makes it load-bearing: both terms,
differentiable w.r.t. the environment map.

TPU-first formulation: instead of per-texel Monte-Carlo importance sampling
(the GPU tutorial approach), every convolution is a DENSE weighted sum over
environment texels — out[n] = Σ_texels w(n, d_texel) L(texel) dω — expressed
as one (N_out, N_env) × (N_env, 3) matmul on the MXU. Exact quadrature, no
sampling noise, trivially differentiable w.r.t. the env map, and the weight
matrix is shared across color channels.

Conventions: equirect maps use the reference's WorldToSkyUV mapping
(LightingUtil.hlsl:216-225) so IBL lookups and sky rendering agree.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from .. import math3d
from .brdf import MIN_ROUGHNESS
from .sky import world_to_sky_uv
from .texture import sample_equirect

PI = math.pi


# ---------------------------------------------------------------------------
# Equirect direction grids (for building maps): the INVERSE of world_to_sky_uv
# ---------------------------------------------------------------------------


def sky_uv_to_direction(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``world_to_sky_uv``: uv in [0,1] → unit direction.

    world_to_sky_uv: u = 1.25 − (atan2(z,x)·INV_2PI + 0.5) → atan2(z,x) =
    (0.75 − u)/INV_2PI; v = 0.5 − asin(y)·INV_PI → asin(y) = (0.5 − v)/INV_PI.
    Uses the reference's truncated constants so the round-trip is exact."""
    from .sky import INV_2PI, INV_PI

    theta = (0.75 - u) / INV_2PI  # atan2(z, x)
    phi = (0.5 - v) / INV_PI  # asin(y)
    y = jnp.sin(phi)
    c = jnp.cos(phi)
    return jnp.stack([c * jnp.cos(theta), y, c * jnp.sin(theta)], axis=-1)


def equirect_grid(height: int, width: int):
    """Texel-center directions (H·W, 3) and solid angles (H·W,) of an
    equirect map under the reference's sky mapping."""
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    uu, vv = jnp.meshgrid(u, v)
    dirs = sky_uv_to_direction(uu, vv).reshape(-1, 3)
    # dω = (Δθ)(Δφ) cos(elevation); elevation = asin(y) per row.
    from .sky import INV_2PI, INV_PI

    dphi = (1.0 / height) / INV_PI
    dtheta = (1.0 / width) / INV_2PI
    elev = (0.5 - vv) / INV_PI
    solid = (jnp.cos(elev) * dphi * dtheta).reshape(-1)
    return dirs, solid


def resize_env(env: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Area-ish downsample of an equirect env map (differentiable)."""
    h, w, c = env.shape
    if h == height and w == width:
        return env
    if h % height == 0 and w % width == 0:
        fh, fw = h // height, w // width
        return env.reshape(height, fh, width, fw, c).mean(axis=(1, 3))
    # bilinear fallback
    vs = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    us = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    uu, vv = jnp.meshgrid(us, vs)
    uv = jnp.stack([uu, vv], axis=-1)
    return sample_equirect(env, uv)


# ---------------------------------------------------------------------------
# Map building (dense quadrature matmuls)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_height", "out_width", "env_samples"))
def irradiance_map(
    env: jnp.ndarray, out_height: int = 32, out_width: int = 64, env_samples: int = 64
) -> jnp.ndarray:
    """Cosine-convolved diffuse irradiance map (out_h, out_w, 3):
    E(n) = ∫ L(l) max(n·l, 0) dl / π (the 1/π makes it directly usable as
    ``irradiance · albedo`` diffuse, matching Default.hlsl:144-146)."""
    env_small = resize_env(env, env_samples, env_samples * 2)
    l_dirs, solid = equirect_grid(env_samples, env_samples * 2)  # (Ne,3),(Ne,)
    n_dirs, _ = equirect_grid(out_height, out_width)  # (No,3)

    cos = jnp.maximum(n_dirs @ l_dirs.T, 0.0)  # (No, Ne) — MXU
    w = cos * solid[None, :] / PI
    out = w @ env_small.reshape(-1, 3)  # (No, 3) — MXU
    return out.reshape(out_height, out_width, 3)


@functools.partial(
    jax.jit, static_argnames=("base_height", "base_width", "num_levels", "env_samples")
)
def prefilter_specular(
    env: jnp.ndarray,
    base_height: int = 64,
    base_width: int = 128,
    num_levels: int = 5,
    env_samples: int = 64,
) -> tuple[jnp.ndarray, ...]:
    """Split-sum term 1: GGX-prefiltered radiance per roughness level.

    Level l has roughness r_l = l/(num_levels−1) and resolution
    (base >> l). Uses the N=V=R approximation (as the split-sum derivation
    does): weight(n→l) ∝ D_GGX(n·h) (n·l) with n·h = √((1+n·l)/2)."""
    env_small = resize_env(env, env_samples, env_samples * 2)
    l_dirs, solid = equirect_grid(env_samples, env_samples * 2)
    env_flat = env_small.reshape(-1, 3)

    levels = []
    for lvl in range(num_levels):
        rough = lvl / max(num_levels - 1, 1)
        h = max(base_height >> lvl, 4)
        w = max(base_width >> lvl, 8)
        n_dirs, _ = equirect_grid(h, w)
        cos_nl = n_dirs @ l_dirs.T  # (No, Ne)
        cpos = jnp.maximum(cos_nl, 0.0)
        if lvl == 0:
            # roughness 0 → mirror: the distribution collapses to the env
            # lookup itself; use a very tight GGX to stay differentiable.
            alpha = MIN_ROUGHNESS**2
        else:
            alpha = max(rough, MIN_ROUGHNESS) ** 2
        a2 = alpha * alpha
        ndoth2 = (1.0 + cos_nl) * 0.5  # (n·h)² given n=v
        denom = ndoth2 * (a2 - 1.0) + 1.0
        d = a2 / (PI * denom * denom)
        wgt = d * cpos * solid[None, :]
        norm = jnp.sum(wgt, axis=-1, keepdims=True)
        wgt = wgt / jnp.maximum(norm, 1e-12)
        out = wgt @ env_flat
        levels.append(out.reshape(h, w, 3))
    return tuple(levels)


@functools.partial(jax.jit, static_argnames=("env_samples",))
def sh9_coeffs(env: jnp.ndarray, env_samples: int = 64) -> jnp.ndarray:
    """Project the env map onto the first 9 real spherical harmonics:
    L_lm = Σ_texels Y_lm(d) L(d) dω — one (9, Ne)·(Ne, 3) MXU matmul,
    exact quadrature, differentiable w.r.t. the env map."""
    env_small = resize_env(env, env_samples, env_samples * 2)
    dirs, solid = equirect_grid(env_samples, env_samples * 2)
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    one = jnp.ones_like(x)
    ybasis = jnp.stack(
        [
            0.282095 * one,
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3.0 * z * z - 1.0),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ]
    )  # (9, Ne)
    return (ybasis * solid[None, :]) @ env_small.reshape(-1, 3)  # (9, 3)


def sh9_irradiance(sh: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """E(n)/π from 9 SH coefficients — the Ramamoorthi–Hanrahan closed form
    ("An Efficient Representation for Irradiance Environment Maps", 2001).
    Cosine convolution truncates SH at degree 2 with ≤~1% energy error for
    typical environments, so this replaces the irradiance-map GATHER with
    ~30 VPU FLOPs/pixel: per-pixel equirect gathers at 1080p are
    latency-bound per row (~8-10 ms per 2M-row gather), the single biggest
    cost of the IBL ambient term. ``n`` (..., 3) unit normals → (..., 3),
    same /π convention as :func:`irradiance_map` (directly multiplies
    albedo)."""
    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    x = n[..., 0:1]
    y = n[..., 1:2]
    z = n[..., 2:3]
    e = (
        c1 * sh[8] * (x * x - y * y)
        + c3 * sh[6] * (z * z)
        + c4 * sh[0]
        - c5 * sh[6]
        + 2.0 * c1 * (sh[4] * x * y + sh[7] * x * z + sh[5] * y * z)
        + 2.0 * c2 * (sh[3] * x + sh[1] * y + sh[2] * z)
    )
    return e * (1.0 / PI)


@functools.partial(jax.jit, static_argnames=("size", "num_samples"))
def brdf_lut(size: int = 64, num_samples: int = 256) -> jnp.ndarray:
    """Split-sum term 2: ∫ BRDF — the (NdotV, roughness) → (scale, bias) LUT,
    computed by GGX importance sampling with a Hammersley sequence (constant;
    no gradient path needed). Returns (size, size, 2): x = NdotV axis,
    y = roughness axis."""
    ndotv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size

    i = jnp.arange(num_samples, dtype=jnp.uint32)
    # radical inverse (van der Corput); masks as uint32 to avoid int overflow
    u32 = lambda x: jnp.uint32(x)
    bits = i
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & u32(0x55555555)) << 1) | ((bits & u32(0xAAAAAAAA)) >> 1)
    bits = ((bits & u32(0x33333333)) << 2) | ((bits & u32(0xCCCCCCCC)) >> 2)
    bits = ((bits & u32(0x0F0F0F0F)) << 4) | ((bits & u32(0xF0F0F0F0)) >> 4)
    bits = ((bits & u32(0x00FF00FF)) << 8) | ((bits & u32(0xFF00FF00)) >> 8)
    xi2 = bits.astype(jnp.float32) * 2.3283064365386963e-10
    xi1 = i.astype(jnp.float32) / num_samples

    def one_cell(nv, r):
        rc = jnp.maximum(r, MIN_ROUGHNESS)
        a = rc * rc  # α = roughness²
        v = jnp.stack([jnp.sqrt(1.0 - nv * nv), jnp.zeros_like(nv), nv])
        # GGX importance sample h around +z
        phi = 2.0 * PI * xi1
        cos_th = jnp.sqrt((1.0 - xi2) / (1.0 + (a * a - 1.0) * xi2))
        sin_th = jnp.sqrt(jnp.maximum(1.0 - cos_th * cos_th, 0.0))
        h = jnp.stack([sin_th * jnp.cos(phi), sin_th * jnp.sin(phi), cos_th], axis=-1)
        l = 2.0 * (v @ h.T)[:, None] * h - v[None, :]
        ndotl = jnp.maximum(l[:, 2], 0.0)
        ndoth = jnp.maximum(h[:, 2], 0.0)
        vdoth = jnp.maximum(v @ h.T, 0.0)
        # Smith G with k = r²/2 (IBL remap, vs (r+1)²/8 for direct lighting)
        k = (rc * rc) / 2.0
        g1l = ndotl / (ndotl * (1 - k) + k)
        g1v = nv / (nv * (1 - k) + k)
        g = g1l * g1v
        g_vis = jnp.where(ndoth > 0, g * vdoth / jnp.maximum(ndoth * nv, 1e-8), 0.0)
        fc = jnp.power(1.0 - vdoth, 5.0)
        scale = jnp.sum((1.0 - fc) * g_vis) / num_samples
        bias = jnp.sum(fc * g_vis) / num_samples
        return jnp.stack([scale, bias])

    cell = jax.vmap(jax.vmap(one_cell, in_axes=(0, None)), in_axes=(None, 0))
    return cell(ndotv, rough)  # (size_r, size_nv, 2)


# ---------------------------------------------------------------------------
# Precomputed IBL bundle + shading term
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IBLMaps:
    irradiance: jnp.ndarray  # (Hi, Wi, 3) equirect
    specular_levels: tuple[jnp.ndarray, ...]  # per-roughness equirect mips
    lut: jnp.ndarray  # (S, S, 2) — [roughness, ndotv] → (scale, bias)
    # All specular levels resampled to one resolution and stacked on the
    # channel axis (Hs, Ws, L·3): the whole roughness chain comes back in
    # ONE 4-tap gather (TPU gathers are per-row latency-bound), with the
    # level lerp done on channels afterwards.
    specular_stack: jnp.ndarray | None = None
    # f16-QUAD-packed words of the stack / irradiance map
    # (texture.quad_pack_equirect_f16): the whole bilinear footprint in one
    # row, so each map costs ONE gather per pixel (equirect gathers at 1080p
    # are latency-bound per gathered row — count, not width, is the cost);
    # sampled with straight-through gradients to the f32 originals.
    specular_stack_f16: jnp.ndarray | None = None
    irradiance_f16: jnp.ndarray | None = None
    # Degree-2 SH projection of the env map (9, 3): gather-free irradiance
    # via the Ramamoorthi closed form (sh9_irradiance) — preferred over the
    # irradiance-map gather when present.
    irradiance_sh9: jnp.ndarray | None = None

    @staticmethod
    def build(env: jnp.ndarray, **kwargs) -> "IBLMaps":
        from .texture import quad_pack_equirect_f16

        levels = prefilter_specular(env)
        stack = stack_specular_levels(levels)
        irr = irradiance_map(env)
        return IBLMaps(
            irradiance=irr,
            specular_levels=levels,
            lut=brdf_lut(),
            specular_stack=stack,
            specular_stack_f16=quad_pack_equirect_f16(stack),
            irradiance_f16=quad_pack_equirect_f16(irr),
            irradiance_sh9=sh9_coeffs(env),
        )

    @property
    def num_specular_levels(self) -> int:
        return len(self.specular_levels)


def stack_specular_levels(levels: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Resize every prefiltered level to the level-0 resolution and stack on
    channels → (H0, W0, L·3)."""
    h, w = levels[0].shape[0], levels[0].shape[1]
    out = [levels[0]]
    for lvl in levels[1:]:
        out.append(resize_env(lvl, h, w))
    return jnp.concatenate(out, axis=-1)


def sample_equirect_dir(m: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    uv = world_to_sky_uv(directions)
    return sample_equirect(m, uv)[..., :3]


def sample_equirect_dir_paired(m: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Paired-row equirect sample along directions: 2 gathers instead of 4
    (per-pixel gathers are latency-bound; these maps are tiny so the pairing
    concat is free). Keeps all channels (stacked multi-level maps)."""
    from .texture import pair_equirect, sample_equirect_paired

    uv = world_to_sky_uv(directions)
    return sample_equirect_paired(pair_equirect(m), uv)


def env_brdf_approx(ndotv: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Analytic split-sum BRDF term (Karis/Lazarov mobile approximation) —
    replaces the LUT gather with pure VPU arithmetic; mean error vs the
    integrated LUT ~3-4% (worst near mirror-smooth grazing). Pass
    use_lut=True to ambient_ibl for the exact table. Returns (..., 2) =
    (scale, bias)."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04], jnp.float32)
    r4 = roughness[..., None] * c0 + c1  # (..., 4)
    a004 = (
        jnp.minimum(r4[..., 0] * r4[..., 0], jnp.exp2(-9.28 * ndotv)) * r4[..., 0]
        + r4[..., 1]
    )
    scale = a004 * -1.04 + r4[..., 2]
    bias = a004 * 1.04 + r4[..., 3]
    return jnp.stack([scale, bias], axis=-1)


def specular_levels_lerp(
    smp_all: jnp.ndarray, roughness: jnp.ndarray, num_levels: int
) -> jnp.ndarray:
    """Roughness → level blend over a stacked specular sample (..., L·3):
    the channel-select half of the stacked-gather path (ambient_ibl's loop,
    factored out for the fused-kernel epilogue)."""
    lod = jnp.clip(roughness, 0.0, 1.0) * (num_levels - 1)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    pre0 = jnp.zeros(smp_all.shape[:-1] + (3,), smp_all.dtype)
    pre1 = jnp.zeros_like(pre0)
    for li in range(num_levels):
        sel0 = (l0 == li).astype(jnp.float32)[..., None]
        sel1 = (jnp.clip(l0 + 1, 0, num_levels - 1) == li).astype(jnp.float32)[
            ..., None
        ]
        smp = smp_all[..., 3 * li : 3 * li + 3]
        pre0 = pre0 + sel0 * smp
        pre1 = pre1 + sel1 * smp
    return pre0 * (1.0 - frac) + pre1 * frac


def sample_spec_sky_merged(
    ibl: "IBLMaps",
    r: jnp.ndarray,  # (..., 3) unit reflect directions (hit pixels)
    hit: jnp.ndarray,  # (...,) bool
    sky_words: jnp.ndarray | None,  # (Hk, Wk, 4) u32 quad-u8 background
    sky_uv: jnp.ndarray | None,  # (..., 2) equirect uv of the camera rays
):
    """ONE merged row gather for the whole ambient-environment tail.

    Foreground pixels need the prefiltered-specular row (quad-f16 stack),
    background pixels need the sky row (quad-u8) — mutually exclusive, so
    both ride a single latency-bound gather (~6.8 ms/2M rows at 1080p
    regardless of row width — PERF.md gather laws) instead of one each.

    Returns (smp_all (..., L·3) f32 prefiltered taps filtered bilinearly,
    sky_rgb (..., 3) f32 or None). ``smp_all`` is differentiable w.r.t.
    ``ibl.specular_stack`` (straight-through tap scatter) and w.r.t. ``r``
    through the filter weights; sky is u8 LDR (no texel grads, reference
    parity)."""
    from .texture import _unpack_f16_words, pad_gather_rows

    words = ibl.specular_stack_f16  # (Hs, Ws, 4·nw) u32
    base = ibl.specular_stack  # (Hs, Ws, C)
    hs, ws = words.shape[0], words.shape[1]
    c = base.shape[-1]
    nw = words.shape[-1] // 4

    uvr = world_to_sky_uv(r)
    x = uvr[..., 0] * ws - 0.5
    y = uvr[..., 1] * hs - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)
    x0w, x1w = jnp.mod(x0, ws), jnp.mod(x0 + 1, ws)
    y0w, y1w = jnp.mod(y0, hs), jnp.mod(y0 + 1, hs)
    i00 = y0w * ws + x0w
    i01 = y0w * ws + x1w
    i10 = y1w * ws + x0w
    i11 = y1w * ws + x1w

    spec_flat = words.reshape(hs * ws, 4 * nw)
    ns = spec_flat.shape[0]
    row_w = spec_flat.shape[-1]
    if sky_words is not None:
        hk, wk = sky_words.shape[0], sky_words.shape[1]
        sky_flat = jnp.pad(
            sky_words.reshape(hk * wk, 4), ((0, 0), (0, row_w - 4))
        )
        merged = pad_gather_rows(
            jnp.concatenate([spec_flat, sky_flat], axis=0)
        )
        xs = sky_uv[..., 0] * wk - 0.5
        ys = sky_uv[..., 1] * hk - 0.5
        xs0f, ys0f = jnp.floor(xs), jnp.floor(ys)
        fxs = (xs - xs0f)[..., None]
        fys = (ys - ys0f)[..., None]
        xs0 = jnp.mod(xs0f.astype(jnp.int32), wk)
        ys0 = jnp.mod(ys0f.astype(jnp.int32), hk)
        sky_idx = ns + ys0 * wk + xs0
        idx = jnp.where(hit, i00, sky_idx)
    else:
        merged = pad_gather_rows(spec_flat)
        idx = jnp.where(hit, i00, 0)

    q = jax.lax.stop_gradient(merged[idx])  # (..., row_w) — THE one gather

    # Decode the 4 f16 quad taps with straight-through texel grads into the
    # f32 stack (masked to hit pixels — background rows hold sky words).
    @jax.custom_vjp
    def st_taps(qrow, base_, j00, j01, j10, j11, hitf):
        return (
            _unpack_f16_words(qrow[..., 0 * nw : 1 * nw], c),
            _unpack_f16_words(qrow[..., 1 * nw : 2 * nw], c),
            _unpack_f16_words(qrow[..., 2 * nw : 3 * nw], c),
            _unpack_f16_words(qrow[..., 3 * nw : 4 * nw], c),
        )

    def st_fwd(qrow, base_, j00, j01, j10, j11, hitf):
        return (
            st_taps(qrow, base_, j00, j01, j10, j11, hitf),
            (j00, j01, j10, j11, hitf),
        )

    def st_bwd(res, g):
        import numpy as np

        j00, j01, j10, j11, hitf = res
        bf = jnp.zeros((hs * ws, c), jnp.float32)
        hm = hitf[..., None]
        for tap_idx, gt in zip((j00, j01, j10, j11), g):
            bf = bf.at[tap_idx.reshape(-1)].add(
                (gt * hm).reshape(-1, c), mode="drop"
            )
        f0 = jax.dtypes.float0
        z = lambda a: np.zeros(jnp.shape(a), f0)
        return (
            z(q), bf.reshape(base.shape), z(j00), z(j01), z(j10), z(j11),
            jnp.zeros_like(hitf),
        )

    st_taps.defvjp(st_fwd, st_bwd)
    t00, t01, t10, t11 = st_taps(
        q, base, i00, i01, i10, i11, hit.astype(jnp.float32)
    )
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    smp_all = top * (1.0 - fy) + bot * fy  # (..., L·3)

    sky_rgb = None
    if sky_words is not None:
        def rgb8(word):
            return jnp.stack(
                [
                    (word & 0xFF).astype(jnp.float32),
                    ((word >> 8) & 0xFF).astype(jnp.float32),
                    ((word >> 16) & 0xFF).astype(jnp.float32),
                ],
                axis=-1,
            ) * (1.0 / 255.0)

        qs = jax.lax.stop_gradient(q)
        topk = rgb8(qs[..., 0]) * (1.0 - fxs) + rgb8(qs[..., 1]) * fxs
        botk = rgb8(qs[..., 2]) * (1.0 - fxs) + rgb8(qs[..., 3]) * fxs
        sky_rgb = topk * (1.0 - fys) + botk * fys

    return smp_all, sky_rgb


def ambient_ibl(
    ibl: IBLMaps,
    n: jnp.ndarray,  # (..., 3) shading normal (unit)
    v: jnp.ndarray,  # (..., 3) view dir (unit, surface→eye)
    albedo: jnp.ndarray,  # (..., 3)
    f0: jnp.ndarray,  # (..., 3)
    metallic: jnp.ndarray,  # (...,)
    roughness: jnp.ndarray,  # (...,)
    use_lut: bool = False,
) -> jnp.ndarray:
    """IBL ambient term, completing the reference's commented-out block
    (Default.hlsl:140-149) plus split-sum specular:

        kS = F_schlick(n·v); kD = (1−kS)(1−metallic)
        diffuse  = kD · irradiance(n) · albedo
        specular = prefiltered(reflect(−v,n), rough) · (F0·lutA + lutB)
    """
    ndotv = jnp.maximum(math3d.dot(n, v), 0.0)
    # Fresnel at the macro surface (cosTheta = n·v), as the reference's
    # FresnelSchlick(N, V, F0) call does.
    ks = f0 + (1.0 - f0) * jnp.power(1.0 - ndotv, 5.0)[..., None]
    kd = (1.0 - ks) * (1.0 - metallic)[..., None]

    if ibl.irradiance_sh9 is not None:
        irr = sh9_irradiance(ibl.irradiance_sh9, n)
    elif ibl.irradiance_f16 is not None:
        from .texture import sample_equirect_quad_f16

        irr = sample_equirect_quad_f16(
            ibl.irradiance_f16, ibl.irradiance, world_to_sky_uv(n)
        )
    else:
        irr = sample_equirect_dir_paired(ibl.irradiance, n)[..., :3]
    diffuse = kd * irr * albedo

    r = 2.0 * ndotv[..., None] * n - v  # reflect(-v, n)
    r = math3d.normalize(r)

    nl = ibl.num_specular_levels
    lod = jnp.clip(roughness, 0.0, 1.0) * (nl - 1)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    pre0 = jnp.zeros_like(albedo)
    pre1 = jnp.zeros_like(albedo)
    if ibl.specular_stack_f16 is not None:
        from .texture import sample_equirect_quad_f16

        smp_all = sample_equirect_quad_f16(
            ibl.specular_stack_f16, ibl.specular_stack, world_to_sky_uv(r)
        )
        for li in range(nl):
            sel0 = (l0 == li).astype(jnp.float32)[..., None]
            sel1 = (jnp.clip(l0 + 1, 0, nl - 1) == li).astype(jnp.float32)[..., None]
            smp = smp_all[..., 3 * li : 3 * li + 3]
            pre0 = pre0 + sel0 * smp
            pre1 = pre1 + sel1 * smp
    elif ibl.specular_stack is not None:
        # One 4-tap gather for the whole roughness chain; level selection is
        # an elementwise channel blend on the fetched row.
        smp_all = sample_equirect_dir_paired(ibl.specular_stack, r)  # (..., L·3)
        for li in range(nl):
            sel0 = (l0 == li).astype(jnp.float32)[..., None]
            sel1 = (jnp.clip(l0 + 1, 0, nl - 1) == li).astype(jnp.float32)[..., None]
            smp = smp_all[..., 3 * li : 3 * li + 3]
            pre0 = pre0 + sel0 * smp
            pre1 = pre1 + sel1 * smp
    else:
        for li in range(nl):
            sel0 = (l0 == li).astype(jnp.float32)[..., None]
            sel1 = (jnp.clip(l0 + 1, 0, nl - 1) == li).astype(jnp.float32)[..., None]
            smp = sample_equirect_dir(ibl.specular_levels[li], r)
            pre0 = pre0 + sel0 * smp
            pre1 = pre1 + sel1 * smp
    prefiltered = pre0 * (1.0 - frac) + pre1 * frac

    if use_lut:
        s = ibl.lut.shape[0]
        ri = jnp.clip((roughness * s - 0.5).astype(jnp.int32), 0, s - 1)
        vi = jnp.clip((ndotv * s - 0.5).astype(jnp.int32), 0, s - 1)
        ab = ibl.lut[ri, vi]  # (..., 2) — one gather per pixel
    else:
        ab = env_brdf_approx(ndotv, roughness)  # gather-free
    specular = prefiltered * (f0 * ab[..., 0:1] + ab[..., 1:2])

    return diffuse + specular
