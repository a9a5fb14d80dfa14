"""Shared per-pixel Cook-Torrance + IBL shading math for the fused Pallas
kernels (forward AND backward).

The fused raster+shade kernel (``ops/raster_pallas.py``) and the fused
shading-backward kernel both need the exact same pixel shader — the
reference's ``Default.hlsl:47-161`` PS with ``LightingUtil.hlsl`` BRDF
semantics, plus the in-kernel half of the IBL ambient term. Keeping the
expression in ONE place lets the backward kernel differentiate it with
``jax.vjp`` *inside* the kernel (linearization is just tracing), so forward
and backward can never drift.

Layout-agnostic: every per-pixel quantity is an array of one common shape S
(the fused forward kernel passes (1, P) lane rows; the backward kernel
passes (BH, BW) pixel planes), vectors are 3-tuples of such arrays, and the
shading uniforms are one (1, U) f32 row whose elements broadcast against S.

Uniform row layout (``pack_shading_uniforms``):
    [0:3]  eye position
    [3:6]  ambient light (constant term; unused when ``ibl=True``)
    [6:8]  pad
    [8 + 10·i : 18 + 10·i]  light i: strength(3), direction(3), position(3),
                            spot_power(1)   (Core.hlsl Light layout)
    [8 + 10·L :]            (ibl only) 27 SH9 irradiance coefficients,
                            k-major: sh[k][c] at 8 + 10·L + 3·k + c
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = 3.14159265359  # LightingUtil.hlsl literal (see ops/brdf.py)
LN2 = 0.6931471805599453

UNI_LIGHT0 = 8
UNI_PER_LIGHT = 10


def uniform_count(num_lights: int, ibl: bool) -> int:
    return UNI_LIGHT0 + UNI_PER_LIGHT * num_lights + (27 if ibl else 0)


def pack_shading_uniforms(
    light_strength: jnp.ndarray,  # (L, 3)
    light_direction: jnp.ndarray,  # (L, 3)
    light_position: jnp.ndarray,  # (L, 3)
    light_spot_power: jnp.ndarray,  # (L,)
    ambient: jnp.ndarray,  # (3,)
    eye: jnp.ndarray,  # (3,)
    sh9: jnp.ndarray | None = None,  # (9, 3) irradiance SH coefficients
) -> jnp.ndarray:
    """Pack the shading uniforms into one (1, U) f32 row (differentiable —
    the backward kernel's uniform cotangent slices straight back out, see
    :func:`unpack_uniform_grads`)."""
    lrows = light_strength.shape[0]
    parts = [
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
    if sh9 is not None:
        parts.append(sh9.reshape(27))
    return jnp.concatenate(parts).reshape(1, -1)


def unpack_uniform_grads(g_uni: jnp.ndarray, num_lights: int, ibl: bool):
    """Inverse of :func:`pack_shading_uniforms` for the cotangent row:
    (1, ≥U) → (g_strength, g_direction, g_position, g_spot_power, g_ambient,
    g_eye, g_sh9-or-None)."""
    g = g_uni.reshape(-1)
    g_eye = g[0:3]
    g_amb = g[3:6]
    l0 = UNI_LIGHT0
    lblock = g[l0 : l0 + UNI_PER_LIGHT * num_lights].reshape(num_lights, 10)
    g_ls = lblock[:, 0:3]
    g_ld = lblock[:, 3:6]
    g_lp = lblock[:, 6:9]
    g_lsp = lblock[:, 9]
    g_sh9 = None
    if ibl:
        s0 = l0 + UNI_PER_LIGHT * num_lights
        g_sh9 = g[s0 : s0 + 27].reshape(9, 3)
    return g_ls, g_ld, g_lp, g_lsp, g_amb, g_eye, g_sh9


def shade_core(
    pos,  # 3-tuple of S-shaped arrays: world position
    nrm,  # 3-tuple: raw interpolated normal (NOT normalized)
    props,  # 9-tuple: diffuse rgb, metallic, fresnel_r0 rgb, roughness, opacity
    uni,  # (1, U) f32 row (broadcasts against S)
    *,
    num_dir: int,
    num_point: int,
    num_spot: int,
    ibl: bool,
    apply_tonemap: bool,
):
    """The pixel shader as pure elementwise math (VPU code in-kernel).

    Returns a tuple of S-shaped output channels:
      ``ibl=False``: (r, g, b, opacity) — display-encoded when
        ``apply_tonemap`` (Reinhard + gamma, ``Default.hlsl:152-155``),
        HDR otherwise. Matches ``renderer.shade_pixels`` for untextured
        materials bit-for-expression.
      ``ibl=True``: (hdr_r, hdr_g, hdr_b, sf_r, sf_g, sf_b, rx, ry, rz,
        roughness, opacity) — the in-kernel half of the IBL ambient
        (``ops/ibl.ambient_ibl`` semantics): hdr = direct + kd·irr_SH9·albedo
        (Default.hlsl:140-149 completed), sf = F0·lutA + lutB
        (``env_brdf_approx``), r = unit reflect direction. The env-gather
        half (prefiltered specular lookup + sky) runs outside the kernel —
        final hdr = hdr + sf · prefiltered(r, roughness).
    """

    def u(k):  # (1, 1) uniform element — broadcasts like a scalar
        return uni[0:1, k : k + 1]

    def vdot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def vnormalize(a):  # math3d.normalize parity (1e-20 guard)
        inv = jax.lax.rsqrt(jnp.maximum(vdot(a, a), 1e-20))
        return (a[0] * inv, a[1] * inv, a[2] * inv)

    alb = props[0:3]
    met = props[3]
    f0c = props[4:7]
    rough = props[7]
    opac = props[8]

    n = vnormalize(nrm)  # renormalize interp normal (Default.hlsl:50)
    v = vnormalize((u(0) - pos[0], u(1) - pos[1], u(2) - pos[2]))
    # F0 = lerp(const F0, albedo, metallic) (Default.hlsl:94-96)
    f0 = tuple(f0c[c] + (alb[c] - f0c[c]) * met for c in range(3))

    ndotv = jnp.maximum(vdot(n, v), 0.0)
    r_cl = jnp.maximum(rough, 0.05)  # LightingUtil.hlsl:51
    a_g = r_cl * r_cl
    a2 = a_g * a_g
    kg = (rough + 1.0) * (rough + 1.0) / 8.0  # LightingUtil.hlsl:66-67
    gv = ndotv / (ndotv * (1.0 - kg) + kg)
    one_m_met = 1.0 - met
    inv_pi_alb = tuple(alb[c] * (1.0 / PI) for c in range(3))

    out_c = [None, None, None]

    def add_light(strength, l, atten):
        """One BRDFCookTorrance accumulation (LightingUtil.hlsl:85-104)."""
        h = vnormalize((v[0] + l[0], v[1] + l[1], v[2] + l[2]))
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
            out_c[c] = contrib if out_c[c] is None else out_c[c] + contrib

    li = 0
    for _ in range(num_dir):
        b = UNI_LIGHT0 + li * UNI_PER_LIGHT
        add_light(
            (u(b), u(b + 1), u(b + 2)),
            (-u(b + 3), -u(b + 4), -u(b + 5)),
            1.0,
        )
        li += 1
    for _ in range(num_point):
        b = UNI_LIGHT0 + li * UNI_PER_LIGHT
        tl = (u(b + 6) - pos[0], u(b + 7) - pos[1], u(b + 8) - pos[2])
        d = jnp.sqrt(jnp.maximum(vdot(tl, tl), 1e-20))
        inv_d = 1.0 / jnp.maximum(d, 1e-20)
        l = (tl[0] * inv_d, tl[1] * inv_d, tl[2] * inv_d)
        d_sat = jnp.maximum(d, 0.01)
        atten = jnp.where(d <= 100.0, 1.0 / (d_sat * d_sat), 0.0)
        add_light((u(b), u(b + 1), u(b + 2)), l, atten)
        li += 1
    for _ in range(num_spot):
        b = UNI_LIGHT0 + li * UNI_PER_LIGHT
        tl = (u(b + 6) - pos[0], u(b + 7) - pos[1], u(b + 8) - pos[2])
        d = jnp.sqrt(jnp.maximum(vdot(tl, tl), 1e-20))
        inv_d = 1.0 / jnp.maximum(d, 1e-20)
        l = (tl[0] * inv_d, tl[1] * inv_d, tl[2] * inv_d)
        d_sat = jnp.maximum(d, 0.01)
        cone = jnp.maximum(
            -(l[0] * u(b + 3) + l[1] * u(b + 4) + l[2] * u(b + 5)), 0.0
        )
        atten = jnp.where(
            d <= 100.0,
            jnp.power(cone, u(b + 9)) / (d_sat * d_sat),
            0.0,
        )
        add_light((u(b), u(b + 1), u(b + 2)), l, atten)
        li += 1

    zero = pos[0] * 0.0
    if out_c[0] is None:
        out_c = [zero, zero, zero]

    if not ibl:
        rows = []
        for c in range(3):
            lit = u(3 + c) * alb[c] + out_c[c]  # ambient·albedo + direct
            if apply_tonemap:
                x = jnp.maximum(lit, 0.0)
                x = x / (x + 1.0)  # Reinhard (Default.hlsl:153)
                lit = jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.2)
            rows.append(lit)
        rows.append(opac)
        return tuple(rows)

    # --- IBL ambient, in-kernel half (ambient_ibl parity) -----------------
    num_lights = num_dir + num_point + num_spot
    s0 = UNI_LIGHT0 + UNI_PER_LIGHT * num_lights

    def sh(k, c):
        return u(s0 + 3 * k + c)

    t5v = (1.0 - ndotv)
    t5v = (t5v * t5v) * (t5v * t5v) * t5v  # (1-n·v)^5

    x, y, z = n
    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    xx_yy = x * x - y * y
    zz = z * z
    xy = x * y
    xz = x * z
    yz = y * z

    # env_brdf_approx (Karis/Lazarov) — jnp.exp2 written as exp(x·ln2) for
    # Mosaic transcendental support.
    e2 = jnp.exp(jnp.minimum(-9.28 * ndotv, 0.0) * LN2)
    r40 = rough * -1.0 + 1.0
    r41 = rough * -0.0275 + 0.0425
    r42 = rough * -0.572 + 1.04
    r43 = rough * 0.022 - 0.04
    a004 = jnp.minimum(r40 * r40, e2) * r40 + r41
    scale = a004 * -1.04 + r42
    bias = a004 * 1.04 + r43

    rows = []
    for c in range(3):
        irr = (
            c1 * sh(8, c) * xx_yy
            + c3 * sh(6, c) * zz
            + c4 * sh(0, c)
            - c5 * sh(6, c)
            + 2.0 * c1 * (sh(4, c) * xy + sh(7, c) * xz + sh(5, c) * yz)
            + 2.0 * c2 * (sh(3, c) * x + sh(1, c) * y + sh(2, c) * z)
        ) * (1.0 / PI)
        ks = f0[c] + (1.0 - f0[c]) * t5v
        kd = (1.0 - ks) * one_m_met
        rows.append(out_c[c] + kd * irr * alb[c])
    for c in range(3):
        rows.append(f0[c] * scale + bias)  # specular env factor
    # reflect(-v, n), normalized (ambient_ibl parity)
    rvec = vnormalize(
        (
            2.0 * ndotv * n[0] - v[0],
            2.0 * ndotv * n[1] - v[1],
            2.0 * ndotv * n[2] - v[2],
        )
    )
    rows.extend(rvec)
    rows.append(rough)
    rows.append(opac)
    return tuple(rows)


def num_output_channels(ibl: bool) -> int:
    return 11 if ibl else 4
