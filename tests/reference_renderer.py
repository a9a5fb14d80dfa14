"""Independent NumPy oracle renderer.

Written directly from the reference HLSL spec (LightingUtil.hlsl /
Default.hlsl / the D3D rasterization rules) with NO shared code with the
JAX package — per-triangle Python loop, scalar-ish math — so agreement
between the two is meaningful evidence of correctness. Slow: use tiny images.
"""

from __future__ import annotations

import math

import numpy as np

PI = 3.14159265359


# --- camera math (from MathUtil.h:224-236 semantics) -----------------------

def perspective_fov_lh(fov_y, aspect, near, far):
    h = 1.0 / math.tan(fov_y / 2)
    w = h / aspect
    zr = far / (far - near)
    m = np.zeros((4, 4), np.float64)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = zr
    m[2, 3] = 1.0
    m[3, 2] = -near * zr
    return m


def look_to_lh(eye, forward, up):
    f = forward / np.linalg.norm(forward)
    s = np.cross(up, f)
    s = s / np.linalg.norm(s)
    u = np.cross(f, s)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = (s[0], u[0], f[0])
    m[1, :3] = (s[1], u[1], f[1])
    m[2, :3] = (s[2], u[2], f[2])
    m[3, :3] = (-np.dot(s, eye), -np.dot(u, eye), -np.dot(f, eye))
    return m


# --- BRDF (from LightingUtil.hlsl) -----------------------------------------

def fresnel_schlick(h, v, f0):
    ct = np.clip(np.dot(h, v), 0.0, 1.0)
    return f0 + (1.0 - f0) * (1.0 - ct) ** 5


def distribution_ggx(n, h, roughness):
    roughness = max(roughness, 0.05)
    a = roughness * roughness
    a2 = a * a
    ndoth = max(np.dot(n, h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(ndotv, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness):
    ndotv = max(np.dot(n, v), 0.0)
    ndotl = max(np.dot(n, l), 0.0)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(ndotl, roughness)


def brdf_cook_torrance(albedo, metallic, f0, roughness, radiance, n, v, l, h):
    ndf = distribution_ggx(n, h, roughness)
    g = geometry_smith(n, v, l, roughness)
    f = fresnel_schlick(h, v, f0)
    denom = 4.0 * max(np.dot(n, v), 0.0) * max(np.dot(n, l), 0.0) + 0.001
    specular = ndf * g * f / denom
    kd = (1.0 - f) * (1.0 - metallic)
    ndotl = max(np.dot(n, l), 0.0)
    return (kd * albedo / PI + specular) * radiance * ndotl


def shade_point(pos, n, eye, albedo, metallic, f0, roughness, dir_lights, ambient):
    v = eye - pos
    v = v / np.linalg.norm(v)
    out = np.zeros(3)
    for direction, strength in dir_lights:
        l = -np.asarray(direction, np.float64)
        hv = v + l
        hv = hv / np.linalg.norm(hv)
        out += brdf_cook_torrance(
            np.asarray(albedo, np.float64),
            metallic,
            np.asarray(f0, np.float64),
            roughness,
            np.asarray(strength, np.float64),
            n,
            v,
            l,
            hv,
        )
    lit = np.asarray(ambient) * np.asarray(albedo) + out
    lit = lit / (lit + 1.0)
    return lit ** (1.0 / 2.2)


# --- texture sampling (bilinear, wrap — g_SamAnisotropicWrap approx) -------

def sample_bilinear_np(tex, u, v):
    """tex (S,S,C) float; scalar u,v; DirectX texel centers, wrap."""
    s = tex.shape[0]
    x = u * s - 0.5
    y = v * s - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    xi = [(x0) % s, (x0 + 1) % s]
    yi = [(y0) % s, (y0 + 1) % s]
    top = tex[yi[0], xi[0]] * (1 - fx) + tex[yi[0], xi[1]] * fx
    bot = tex[yi[1], xi[0]] * (1 - fx) + tex[yi[1], xi[1]] * fx
    return top * (1 - fy) + bot * fy


def shade_point_textured(
    pos, n, t, b, uv, eye, mat, dir_lights, ambient=(0.03, 0.03, 0.03)
):
    """Full PS semantics with optional texture maps. ``mat`` dict keys:
    diffuse, metallic, fresnel_r0, roughness (constants) and optional
    tex_diffuse/tex_metallic/tex_roughness/tex_normal/tex_specular (S,S,C)."""
    albedo = np.asarray(mat.get("diffuse", (1, 1, 1)), np.float64)
    if "tex_diffuse" in mat:
        albedo = sample_bilinear_np(mat["tex_diffuse"], uv[0], uv[1])[:3]
    metallic = mat.get("metallic", 0.0)
    if "tex_metallic" in mat:
        metallic = float(sample_bilinear_np(mat["tex_metallic"], uv[0], uv[1])[0])
    rough = mat.get("roughness", 1.0)
    if "tex_roughness" in mat:
        rough = float(sample_bilinear_np(mat["tex_roughness"], uv[0], uv[1])[0])
    if "tex_specular" in mat:
        f0 = sample_bilinear_np(mat["tex_specular"], uv[0], uv[1])[:3]
    else:
        f0c = np.asarray(mat.get("fresnel_r0", (0.04,) * 3), np.float64)
        f0 = f0c * (1 - metallic) + albedo * metallic
    if "tex_normal" in mat:
        ns = sample_bilinear_np(mat["tex_normal"], uv[0], uv[1])[:3]
        nt = 2.0 * ns - 1.0
        n = nt[0] * t + nt[1] * b + nt[2] * n  # NOT renormalised (parity)
    return shade_point(pos, n, eye, albedo, metallic, f0, rough, dir_lights, ambient)


# --- rasterizer (per-triangle loop, D3D rules) -----------------------------

def render_general(
    positions,
    normals,
    tangents,
    bitangents,
    uvs,
    tris,
    face_materials,  # (T,) int — index into materials list
    materials,  # list of dicts (see shade_point_textured)
    world,
    view_proj,
    eye,
    width,
    height,
    dir_lights,
    ambient=(0.03, 0.03, 0.03),
    clear=(0.5, 0.5, 0.5),
):
    """General oracle: per-face materials, textures, normal mapping."""
    positions = np.asarray(positions, np.float64)
    normals = np.asarray(normals, np.float64)
    tangents = np.asarray(tangents, np.float64)
    bitangents = np.asarray(bitangents, np.float64)
    uvs = np.asarray(uvs, np.float64)
    pos_w = positions @ world[:3, :3] + world[3, :3]
    nrm_w = normals @ world[:3, :3]
    tan_w = tangents @ world[:3, :3]
    bit_w = bitangents @ world[:3, :3]
    ph = np.concatenate([pos_w, np.ones((len(pos_w), 1))], axis=1) @ view_proj
    w = ph[:, 3]
    ndc = ph[:, :3] / w[:, None]
    px = (ndc[:, 0] + 1) * 0.5 * width
    py = (1 - ndc[:, 1]) * 0.5 * height
    z = ndc[:, 2]

    depth = np.full((height, width), np.inf)
    best = np.full((height, width), -1, np.int64)
    bary = np.zeros((height, width, 3))
    img = np.zeros((height, width, 3))
    img[:] = clear

    ys, xs = np.mgrid[0:height, 0:width]
    pcx = xs + 0.5
    pcy = ys + 0.5

    for ti in range(len(tris)):
        i0, i1, i2 = tris[ti]
        if w[i0] <= 1e-6 or w[i1] <= 1e-6 or w[i2] <= 1e-6:
            continue
        x0, y0, x1, y1, x2, y2 = px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        if area <= 1e-12:
            continue
        xmin = max(int(np.floor(min(x0, x1, x2))), 0)
        xmax = min(int(np.ceil(max(x0, x1, x2))), width - 1)
        ymin = max(int(np.floor(min(y0, y1, y2))), 0)
        ymax = min(int(np.ceil(max(y0, y1, y2))), height - 1)
        if xmin > xmax or ymin > ymax:
            continue
        sx = pcx[ymin : ymax + 1, xmin : xmax + 1]
        sy = pcy[ymin : ymax + 1, xmin : xmax + 1]
        e0 = (x2 - x1) * (sy - y1) - (y2 - y1) * (sx - x1)
        e1 = (x0 - x2) * (sy - y2) - (y0 - y2) * (sx - x2)
        e2 = (x1 - x0) * (sy - y0) - (y1 - y0) * (sx - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        b0, b1, b2 = e0 / area, e1 / area, e2 / area
        zpix = b0 * z[i0] + b1 * z[i1] + b2 * z[i2]
        ok = inside & (zpix >= 0) & (zpix <= 1)
        sub_d = depth[ymin : ymax + 1, xmin : xmax + 1]
        upd = ok & (zpix < sub_d)
        if not upd.any():
            continue
        depth[ymin : ymax + 1, xmin : xmax + 1][upd] = zpix[upd]
        best[ymin : ymax + 1, xmin : xmax + 1][upd] = ti
        for k, bk in enumerate((b0, b1, b2)):
            bary[ymin : ymax + 1, xmin : xmax + 1, k][upd] = bk[upd]

    hit_r, hit_c = np.nonzero(best >= 0)
    for r, c in zip(hit_r, hit_c):
        ti = best[r, c]
        i0, i1, i2 = tris[ti]
        b0, b1, b2 = bary[r, c]
        iw = b0 / w[i0] + b1 / w[i1] + b2 / w[i2]
        pb = np.asarray([b0 / w[i0], b1 / w[i1], b2 / w[i2]]) / iw
        p = pb[0] * pos_w[i0] + pb[1] * pos_w[i1] + pb[2] * pos_w[i2]
        n = pb[0] * nrm_w[i0] + pb[1] * nrm_w[i1] + pb[2] * nrm_w[i2]
        n = n / np.linalg.norm(n)
        t = pb[0] * tan_w[i0] + pb[1] * tan_w[i1] + pb[2] * tan_w[i2]
        b = pb[0] * bit_w[i0] + pb[1] * bit_w[i1] + pb[2] * bit_w[i2]
        uv = pb[0] * uvs[i0] + pb[1] * uvs[i1] + pb[2] * uvs[i2]
        mat = materials[face_materials[ti]]
        img[r, c] = shade_point_textured(
            p, n, t, b, uv, np.asarray(eye, np.float64), mat, dir_lights, ambient
        )
    return img, depth


def render_constant_material(
    positions,
    normals,
    tris,
    world,  # (4,4) row-vector
    view_proj,  # (4,4) row-vector
    eye,
    width,
    height,
    albedo,
    metallic,
    f0,
    roughness,
    dir_lights,
    ambient=(0.03, 0.03, 0.03),
    clear=(0.5, 0.5, 0.5),
):
    positions = np.asarray(positions, np.float64)
    normals = np.asarray(normals, np.float64)
    pos_w = positions @ world[:3, :3] + world[3, :3]
    nrm_w = normals @ world[:3, :3]
    ph = np.concatenate([pos_w, np.ones((len(pos_w), 1))], axis=1) @ view_proj
    w = ph[:, 3]
    ndc = ph[:, :3] / w[:, None]
    px = (ndc[:, 0] + 1) * 0.5 * width
    py = (1 - ndc[:, 1]) * 0.5 * height
    z = ndc[:, 2]

    depth = np.full((height, width), np.inf)
    img = np.zeros((height, width, 3))
    img[:] = clear

    ys, xs = np.mgrid[0:height, 0:width]
    pcx = xs + 0.5
    pcy = ys + 0.5

    for t in range(len(tris)):
        i0, i1, i2 = tris[t]
        if w[i0] <= 1e-6 or w[i1] <= 1e-6 or w[i2] <= 1e-6:
            continue
        x0, y0, x1, y1, x2, y2 = px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        if area <= 1e-12:  # backface cull (front = CW = positive in y-down)
            continue
        xmin = max(int(np.floor(min(x0, x1, x2))), 0)
        xmax = min(int(np.ceil(max(x0, x1, x2))), width - 1)
        ymin = max(int(np.floor(min(y0, y1, y2))), 0)
        ymax = min(int(np.ceil(max(y0, y1, y2))), height - 1)
        if xmin > xmax or ymin > ymax:
            continue
        sx = pcx[ymin : ymax + 1, xmin : xmax + 1]
        sy = pcy[ymin : ymax + 1, xmin : xmax + 1]
        # e_i = cross(b−a, p−a) for the edge opposite vertex i; interior of a
        # CW (positive-area, y-down) triangle has all e_i ≥ 0, and Σe_i = area.
        e0 = (x2 - x1) * (sy - y1) - (y2 - y1) * (sx - x1)
        e1 = (x0 - x2) * (sy - y2) - (y0 - y2) * (sx - x2)
        e2 = (x1 - x0) * (sy - y0) - (y1 - y0) * (sx - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        b0, b1, b2 = e0 / area, e1 / area, e2 / area
        zpix = b0 * z[i0] + b1 * z[i1] + b2 * z[i2]
        ok = inside & (zpix >= 0) & (zpix <= 1)
        sub_d = depth[ymin : ymax + 1, xmin : xmax + 1]
        upd = ok & (zpix < sub_d)
        if not upd.any():
            continue
        # perspective-correct barycentrics
        iw0, iw1, iw2 = 1.0 / w[i0], 1.0 / w[i1], 1.0 / w[i2]
        pw0, pw1, pw2 = b0 * iw0, b1 * iw1, b2 * iw2
        s = pw0 + pw1 + pw2
        pb0, pb1, pb2 = pw0 / s, pw1 / s, pw2 / s
        yy, xx = np.nonzero(upd)
        for k in range(len(yy)):
            r, c = yy[k], xx[k]
            gr, gc = r + ymin, c + xmin
            depth[gr, gc] = zpix[r, c]
            p = pb0[r, c] * pos_w[i0] + pb1[r, c] * pos_w[i1] + pb2[r, c] * pos_w[i2]
            n = pb0[r, c] * nrm_w[i0] + pb1[r, c] * nrm_w[i1] + pb2[r, c] * nrm_w[i2]
            n = n / np.linalg.norm(n)
            img[gr, gc] = shade_point(
                p, n, np.asarray(eye, np.float64), albedo, metallic, f0, roughness,
                dir_lights, ambient,
            )
    return img, depth
