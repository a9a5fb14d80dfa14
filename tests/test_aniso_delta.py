"""Quantify the anisotropic-filtering delta (VERDICT r3 ask #9).

The reference shades through ``SamplerAnisotropicWrap``
(``Default.hlsl:80``, samplers at ``PBRApp.cpp:1138-1193``) — but loads
1-mip textures (``WICTextureLoader.h:78``), so its effective filtering is
aliased bilinear. Our pipeline tops out at derivative-LOD trilinear
(``ops/texture.sample_atlas`` + ``screen_space_lod``). This test puts a
number on both deltas against a 16-tap anisotropic oracle on the classic
worst case — a grazing perspective floor:

    measured (round 4, 256×256, 8-texel checker, 8×-supersampled ground
    truth):
        RMS error vs ground truth:  bilinear mip-0  = 0.322
                                    our trilinear   = 0.127
                                    16-tap aniso    = 0.117
    i.e. trilinear cuts the reference's effective-sampling error 2.5× and
    sits within 8.5% RMS of true 16-tap aniso even on this torture case —
    the residual is isotropic over-blur along the minor footprint axis.

The assertions pin the ORDERING and coarse magnitudes so the documented
delta stays true as the sampler evolves.
"""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu.ops.texture import (
    build_atlas,
    sample_atlas,
    screen_space_lod,
)

W = H = 256
S = 64  # texture size


def _checker(size, period=8):
    y, x = np.mgrid[0:size, 0:size]
    c = (((x // period) + (y // period)) % 2).astype(np.float32)
    return np.stack([c, c, c], axis=-1)


def _floor_uv(w, h, scale=6.0):
    """Grazing perspective floor: uv(x, y) = (x·s/d, s/d) with depth d
    growing toward the horizon — du/dx ∝ 1/d, dv/dy ∝ 1/d²: strongly
    anisotropic footprints near the top."""
    ys = (np.arange(h) + 0.5) / h  # 0 = horizon side
    xs = (np.arange(w) + 0.5) / w - 0.5
    d = 0.08 + ys  # depth per row
    u = (xs[None, :] * scale) / d[:, None]  # (h, w)
    v = np.broadcast_to(scale / d[:, None], u.shape)
    return np.stack([u, v], axis=-1).astype(np.float32)


def _ground_truth(tex, uv_fn, ss=8):
    """Box-filter ground truth: supersample the exact mapping ss× per axis
    and point-sample the texture (wrap)."""
    hw = H * ss
    ww = W * ss
    uv = uv_fn(ww, hw)
    tx = np.mod((uv[..., 0] * S).astype(np.int64), S)
    ty = np.mod((uv[..., 1] * S).astype(np.int64), S)
    smp = tex[ty, tx]  # (hw, ww, 3)
    return smp.reshape(H, ss, W, ss, 3).mean((1, 3))


def _mips(tex):
    out = [tex]
    while out[-1].shape[0] > 1:
        p = out[-1]
        out.append(p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2, 3).mean((1, 3)))
    return out


def _bilinear(mip, uv):
    s = mip.shape[0]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    g = lambda yy, xx: mip[np.mod(yy, s), np.mod(xx, s)]
    top = g(y0, x0) * (1 - fx) + g(y0, x0 + 1) * fx
    bot = g(y0 + 1, x0) * (1 - fx) + g(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _trilinear(mips, uv, lod):
    lod = np.clip(lod, 0, len(mips) - 1)
    l0 = np.floor(lod).astype(int)
    l1 = np.minimum(l0 + 1, len(mips) - 1)
    frac = (lod - l0)[..., None]
    t0 = np.zeros(uv.shape[:-1] + (3,), np.float32)
    t1 = np.zeros_like(t0)
    for li in range(len(mips)):
        m0 = l0 == li
        m1 = l1 == li
        if m0.any():
            t0[m0] = _bilinear(mips[li], uv[m0])
        if m1.any():
            t1[m1] = _bilinear(mips[li], uv[m1])
    return t0 * (1 - frac) + t1 * frac


def _aniso16(mips, uv, taps=16):
    """16-tap anisotropic oracle: derivative footprint per pixel, taps along
    the MAJOR axis, each at the lod of the MINOR axis (the D3D11 aniso
    model)."""
    ddx = np.diff(uv, axis=1, append=uv[:, -1:])
    ddy = np.diff(uv, axis=0, append=uv[-1:])
    lx = np.hypot(ddx[..., 0], ddx[..., 1]) * S
    ly = np.hypot(ddy[..., 0], ddy[..., 1]) * S
    major_is_x = lx >= ly
    major = np.maximum(np.where(major_is_x, lx, ly), 1e-6)
    minor = np.maximum(np.where(major_is_x, ly, lx), 1e-6)
    ratio = np.clip(major / minor, 1.0, taps)
    # lod of the minor axis, widened if the ratio clamp kicked in
    eff_minor = np.maximum(minor, major / ratio)
    lod = np.maximum(np.log2(eff_minor), 0.0)
    axis = np.where(major_is_x[..., None], ddx, ddy)  # (..., 2) uv step
    out = np.zeros(uv.shape[:-1] + (3,), np.float32)
    for k in range(taps):
        f = (k + 0.5) / taps - 0.5  # taps span one pixel along the major axis
        out += _trilinear(mips, uv + axis * f, lod)
    return out / taps


def test_aniso_delta_quantified():
    tex = _checker(S)
    mips = _mips(tex)
    uv = _floor_uv(W, H)

    gt = _ground_truth(tex, _floor_uv)

    # (a) the reference's EFFECTIVE sampling: bilinear mip 0 (1-mip loads)
    ref_eff = _bilinear(mips[0], uv)
    # (b) our real code path: sample_atlas trilinear with screen_space_lod
    atlas = build_atlas([tex], [False], size=S)
    lod = np.asarray(screen_space_lod(jnp.asarray(uv, jnp.float32), S))
    ours = np.asarray(
        sample_atlas(atlas, jnp.zeros((H, W), jnp.int32),
                     jnp.asarray(uv, jnp.float32), lod=jnp.asarray(lod))
    )[..., :3]
    # (c) the 16-tap anisotropic oracle
    aniso = _aniso16(mips, uv)

    rms = lambda a: float(np.sqrt(np.mean((a - gt) ** 2)))
    e_ref, e_ours, e_aniso = rms(ref_eff), rms(ours), rms(aniso)

    # Documented ordering: aliased 1-mip ≫ trilinear ≳ aniso.
    assert e_ref > 2.2 * e_ours, (e_ref, e_ours)
    assert e_aniso <= e_ours * 1.02, (e_aniso, e_ours)
    assert e_ours < 1.3 * e_aniso, (e_ours, e_aniso)  # the documented delta
    print(f"RMS vs ground truth: mip0={e_ref:.4f} trilinear={e_ours:.4f} "
          f"aniso16={e_aniso:.4f}")


def test_cheap_aniso_taps_close_the_delta():
    """The implemented aniso mode (VERDICT r4 ask #6): N trilinear taps
    along the major footprint axis (sample_atlas_aniso / render's
    aniso_taps=N). 4 taps must land within ~3% RMS of the 16-tap oracle on
    the grazing-floor case, and 2 taps must already beat plain trilinear."""
    from physically_based_renderer_tpu.ops.texture import sample_atlas_aniso

    tex = _checker(S)
    mips = _mips(tex)
    uv = _floor_uv(W, H)
    gt = _ground_truth(tex, _floor_uv)
    atlas = build_atlas([tex], [False], size=S)
    uvj = jnp.asarray(uv, jnp.float32)
    page = jnp.zeros((H, W), jnp.int32)

    rms = lambda a: float(np.sqrt(np.mean((a - gt) ** 2)))
    lod = np.asarray(screen_space_lod(uvj, S))
    e_tri = rms(
        np.asarray(sample_atlas(atlas, page, uvj, lod=jnp.asarray(lod)))[..., :3]
    )
    e_oracle = rms(_aniso16(mips, uv))

    e4 = rms(np.asarray(sample_atlas_aniso(atlas, page, uvj, num_taps=4))[..., :3])
    e2 = rms(np.asarray(sample_atlas_aniso(atlas, page, uvj, num_taps=2))[..., :3])

    assert e4 <= e_oracle * 1.03, (e4, e_oracle)  # within ~3% of 16-tap
    assert e2 < e_tri, (e2, e_tri)  # 2 taps already beat trilinear
    print(f"RMS: trilinear={e_tri:.4f} taps2={e2:.4f} taps4={e4:.4f} "
          f"oracle16={e_oracle:.4f}")
