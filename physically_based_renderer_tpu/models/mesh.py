"""Mesh pytrees and procedural generators.

TPU-native replacement for ``Source/App/Mesh.h``. Geometry lives as flat
``jnp`` arrays (structure-of-arrays) instead of D3D vertex/index buffers; the
vertex layout mirrors the reference ``Vertex{Pos,Normal,Tangent,Bitangent,
TexCoord}`` (``FrameResource.h:46-76``). The UV-sphere generator reproduces the
exact vertex/index topology of ``SphereMesh::Initialize``
(``Mesh.h:473-591``): north pole + (stacks-1) rings of (slices+1) vertices
(duplicated seam column) + south pole; identical winding and UV parametrisation
so golden images and vertex counts match.

Generators run in NumPy at scene-build time (host, once) and produce device
arrays; they are not traced. Differentiable geometry edits happen downstream
on the arrays themselves.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mesh:
    """Triangle mesh, SoA layout. All per-vertex arrays share dim 0."""

    positions: jnp.ndarray  # (V, 3) f32
    normals: jnp.ndarray  # (V, 3) f32
    tangents: jnp.ndarray  # (V, 3) f32 — NOT normalised (parity: Mesh.h:518-523)
    bitangents: jnp.ndarray  # (V, 3) f32
    uvs: jnp.ndarray  # (V, 2) f32
    tris: jnp.ndarray  # (T, 3) i32

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tris.shape[0]

    @staticmethod
    def from_numpy(positions, normals, tangents, bitangents, uvs, tris) -> "Mesh":
        f = lambda x: jnp.asarray(x, jnp.float32)
        return Mesh(
            positions=f(positions),
            normals=f(normals),
            tangents=f(tangents),
            bitangents=f(bitangents),
            uvs=f(uvs),
            tris=jnp.asarray(tris, jnp.int32),
        )


def sphere_mesh(radius: float = 1.0, slices: int = 64, stacks: int = 32) -> Mesh:
    """UV sphere with the reference's exact topology (``Mesh.h:473-591``).

    Vertex order: north pole, then rings i=1..stacks-1 each with slices+1
    columns j=0..slices (seam duplicated for UV wrap), then south pole.
    Position: (r sinφ cosθ, r cosφ, r sinφ sinθ); normal = pos/r; tangent =
    ∂P/∂θ (unnormalised, as in the reference); bitangent = normal × tangent;
    UV = (θ/2π, φ/π). Default scene uses 64×32 (PBRApp.cpp:508-510).
    """
    assert slices <= 250 and stacks <= 250  # Mesh.h:489 parity

    ring_count = stacks - 1
    ring_verts = slices + 1
    nv = 2 + ring_count * ring_verts

    phi = (np.arange(1, stacks)[:, None]) * (math.pi / stacks)  # (rings, 1)
    theta = (np.arange(ring_verts)[None, :]) * (2.0 * math.pi / slices)  # (1, ring_verts)
    sp, cp = np.sin(phi), np.cos(phi)
    st, ct = np.sin(theta), np.cos(theta)

    pos = np.zeros((nv, 3), np.float32)
    nrm = np.zeros((nv, 3), np.float32)
    tan = np.zeros((nv, 3), np.float32)
    bit = np.zeros((nv, 3), np.float32)
    uv = np.zeros((nv, 2), np.float32)

    # Poles (Mesh.h:493-498)
    pos[0] = (0.0, radius, 0.0)
    nrm[0] = (0.0, 1.0, 0.0)
    tan[0] = (1.0, 0.0, 0.0)
    bit[0] = (0.0, 0.0, -1.0)
    uv[0] = (0.0, 0.0)
    pos[-1] = (0.0, -radius, 0.0)
    nrm[-1] = (0.0, -1.0, 0.0)
    tan[-1] = (1.0, 0.0, 0.0)
    bit[-1] = (0.0, 0.0, 1.0)
    uv[-1] = (0.0, 1.0)

    ring_pos = np.stack(
        [
            radius * sp * ct,
            np.broadcast_to(radius * cp, (ring_count, ring_verts)),
            radius * sp * st,
        ],
        axis=-1,
    )
    ring_pos = ring_pos.reshape(-1, 3)
    ring_nrm = ring_pos / np.linalg.norm(ring_pos, axis=-1, keepdims=True)
    # Tangent = ∂P/∂θ, unnormalised (Mesh.h:518-521)
    ring_tan = np.stack(
        [-radius * sp * st, np.zeros((ring_count, ring_verts)), radius * sp * ct], axis=-1
    ).reshape(-1, 3)
    ring_bit = np.cross(ring_nrm, ring_tan)
    ring_uv = np.stack(
        [
            np.broadcast_to(theta / (2.0 * math.pi), (ring_count, ring_verts)),
            np.broadcast_to(phi / math.pi, (ring_count, ring_verts)),
        ],
        axis=-1,
    ).reshape(-1, 2)

    pos[1:-1] = ring_pos
    nrm[1:-1] = ring_nrm
    tan[1:-1] = ring_tan
    bit[1:-1] = ring_bit
    uv[1:-1] = ring_uv

    # Indices — identical order/winding to Mesh.h:534-565
    tris = []
    for i in range(1, slices + 1):  # top cap
        tris.append((0, i + 1, i))
    base = 1
    for i in range(stacks - 2):  # inner quads
        for j in range(slices):
            a = base + i * ring_verts + j
            b = base + i * ring_verts + j + 1
            c = base + (i + 1) * ring_verts + j
            d = base + (i + 1) * ring_verts + j + 1
            tris.append((a, b, c))
            tris.append((c, b, d))
    south = nv - 1
    base = south - ring_verts
    for i in range(slices):  # bottom cap
        tris.append((south, base + i, base + i + 1))

    return Mesh.from_numpy(pos, nrm, tan, bit, uv, np.asarray(tris, np.int32))


def subdivide(mesh: Mesh) -> Mesh:
    """Midpoint 1→4 subdivision (``Mesh.h:80-152`` semantics: naive midpoints,
    attributes averaged, no vertex sharing across split edges)."""
    p = np.asarray(mesh.positions)
    n = np.asarray(mesh.normals)
    t = np.asarray(mesh.tangents)
    b = np.asarray(mesh.bitangents)
    u = np.asarray(mesh.uvs)
    tris = np.asarray(mesh.tris)

    # Vectorised: emit 6 vertices per input triangle (v0, m01, v1, m12, v2, m20)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]

    def six(a):
        return np.stack(
            [a[v0], 0.5 * (a[v0] + a[v1]), a[v1], 0.5 * (a[v1] + a[v2]), a[v2], 0.5 * (a[v2] + a[v0])],
            axis=1,
        )

    P = six(p).reshape(-1, 3)
    N = six(n).reshape(-1, 3)
    T = six(t).reshape(-1, 3)
    B = six(b).reshape(-1, 3)
    U = six(u).reshape(-1, 2)
    nt = tris.shape[0]
    offs = (np.arange(nt) * 6)[:, None]
    # local indices: 0=v0 1=m01 2=v1 3=m12 4=v2 5=m20
    local = np.asarray([[0, 1, 5], [1, 2, 3], [5, 3, 4], [1, 3, 5]], np.int32)
    TR = (offs[:, :, None] + local[None, :, :]).reshape(-1, 3)
    return Mesh.from_numpy(P, N, T, B, U, TR)


def quad_mesh(width: float = 1.0, depth: float = 1.0) -> Mesh:
    """XZ-plane quad facing +y (the commented Quad generator, Mesh.h:155-200)."""
    hw, hd = width / 2.0, depth / 2.0
    pos = np.asarray(
        [[-hw, 0, -hd], [hw, 0, -hd], [hw, 0, hd], [-hw, 0, hd]], np.float32
    )
    nrm = np.tile([0.0, 1.0, 0.0], (4, 1))
    tan = np.tile([1.0, 0.0, 0.0], (4, 1))
    bit = np.tile([0.0, 0.0, 1.0], (4, 1))
    uv = np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    tris = np.asarray([[0, 3, 1], [1, 3, 2]], np.int32)
    return Mesh.from_numpy(pos, nrm, tan, bit, uv, tris)


def grid_mesh(width: float, depth: float, m: int, n: int) -> Mesh:
    """m×n vertex grid in the XZ plane (the commented Grid generator,
    Mesh.h:203-320)."""
    xs = np.linspace(-width / 2, width / 2, n)
    zs = np.linspace(depth / 2, -depth / 2, m)
    zz, xx = np.meshgrid(zs, xs, indexing="ij")
    pos = np.stack([xx, np.zeros_like(xx), zz], axis=-1).reshape(-1, 3)
    nrm = np.tile([0.0, 1.0, 0.0], (m * n, 1))
    tan = np.tile([1.0, 0.0, 0.0], (m * n, 1))
    bit = np.tile([0.0, 0.0, 1.0], (m * n, 1))
    us = np.linspace(0, 1, n)
    vs = np.linspace(0, 1, m)
    vv, uu = np.meshgrid(vs, us, indexing="ij")
    uv = np.stack([uu, vv], axis=-1).reshape(-1, 2)
    tris = []
    for i in range(m - 1):
        for j in range(n - 1):
            a = i * n + j
            tris.append((a, a + 1, a + n))
            tris.append((a + n, a + 1, a + n + 1))
    return Mesh.from_numpy(pos, nrm, tan, bit, uv, np.asarray(tris, np.int32))


def box_mesh(width: float = 1.0, height: float = 1.0, depth: float = 1.0) -> Mesh:
    """Axis-aligned box, 24 vertices / 12 triangles (the commented Box
    generator, Mesh.h:323-471), CW front faces, per-face normals/tangents."""
    w, h, d = width / 2, height / 2, depth / 2
    # (normal, tangent, corner order) per face; uv (0,0) top-left.
    faces = [
        ((0, 0, -1), (1, 0, 0)),   # front  (−z)
        ((0, 0, 1), (-1, 0, 0)),   # back   (+z)
        ((0, 1, 0), (1, 0, 0)),    # top
        ((0, -1, 0), (-1, 0, 0)),  # bottom
        ((-1, 0, 0), (0, 0, -1)),  # left
        ((1, 0, 0), (0, 0, 1)),    # right
    ]
    pos, nrm, tan, bit, uv, tris = [], [], [], [], [], []
    for fi, (n, t) in enumerate(faces):
        n = np.asarray(n, np.float32)
        t = np.asarray(t, np.float32)
        b = np.cross(n, t)
        # corners: (+t+b, -t+b, -t-b, +t-b) scaled to the box half-extents,
        # wound clockwise viewed from outside (LH front)
        ext = np.asarray([w, h, d], np.float32)
        c = n * ext
        tt = t * ext
        bb = b * ext
        corners = [c - tt + bb, c + tt + bb, c + tt - bb, c - tt - bb]
        base = fi * 4
        pos += corners
        nrm += [n] * 4
        tan += [t] * 4
        bit += [b] * 4
        uv += [(0, 0), (1, 0), (1, 1), (0, 1)]
        tris += [(base, base + 1, base + 2), (base, base + 2, base + 3)]
    return Mesh.from_numpy(
        np.asarray(pos, np.float32), np.asarray(nrm, np.float32),
        np.asarray(tan, np.float32), np.asarray(bit, np.float32),
        np.asarray(uv, np.float32), np.asarray(tris, np.int32),
    )


def geosphere_mesh(radius: float = 1.0, subdivisions: int = 3) -> Mesh:
    """Icosahedron-subdivision sphere — the reference's ``GeosphereMesh``
    stub (Mesh.h:594-598) actually implemented. Even triangle areas (no pole
    slivers), UV = equirect of the normal."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float32,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(subdivisions):
        edge_mid: dict[tuple, int] = {}
        new_faces = []
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(vlist)
                vlist.append(m)
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        verts = np.asarray(vlist, np.float32)
        faces = np.asarray(new_faces, np.int32)

    nrm = verts.copy()
    pos = verts * radius
    theta = np.arctan2(nrm[:, 2], nrm[:, 0]) % (2 * math.pi)
    phi = np.arccos(np.clip(nrm[:, 1], -1, 1))
    uv = np.stack([theta / (2 * math.pi), phi / math.pi], axis=-1).astype(np.float32)
    tan = np.stack([-np.sin(theta), np.zeros_like(theta), np.cos(theta)], axis=-1)
    bit = np.cross(nrm, tan)
    # Match the UV-sphere's winding convention (outward faces CW from outside).
    fixed = []
    for a, b, c in faces:
        n_face = np.cross(verts[b] - verts[a], verts[c] - verts[a])
        if np.dot(n_face, verts[a] + verts[b] + verts[c]) < 0:
            fixed.append((a, b, c))
        else:
            fixed.append((a, c, b))
    return Mesh.from_numpy(pos, nrm, tan.astype(np.float32), bit.astype(np.float32), uv, np.asarray(fixed, np.int32))


def cylinder_mesh(
    bottom_radius: float = 0.5,
    top_radius: float = 0.5,
    height: float = 1.0,
    slices: int = 32,
    stacks: int = 4,
) -> Mesh:
    """Capped cylinder/cone — the ``CylinderMesh`` stub (Mesh.h:600-604)
    implemented, Frank-Luna parametrisation."""
    verts, tris = [], []
    dh = height / stacks
    dr = (top_radius - bottom_radius) / stacks
    ring_verts = slices + 1
    for i in range(stacks + 1):
        y = -height / 2 + i * dh
        r = bottom_radius + i * dr
        for j in range(ring_verts):
            th = j * 2 * math.pi / slices
            c, s = math.cos(th), math.sin(th)
            pos = (r * c, y, r * s)
            tan = (-s, 0.0, c)
            bit_ = (dr * c, -height, dr * s)
            n = np.cross(tan, bit_)
            n = n / np.linalg.norm(n)
            verts.append((pos, tuple(n), tan, tuple(np.asarray(bit_) / np.linalg.norm(bit_)), (j / slices, 1 - i / stacks)))
    for i in range(stacks):
        for j in range(slices):
            a = i * ring_verts + j
            b = (i + 1) * ring_verts + j
            tris += [(a, b, a + 1), (a + 1, b, b + 1)]
    # caps
    for top in (True, False):
        y = height / 2 if top else -height / 2
        r = top_radius if top else bottom_radius
        n = (0.0, 1.0, 0.0) if top else (0.0, -1.0, 0.0)
        center = len(verts) + ring_verts
        base = len(verts)
        for j in range(ring_verts):
            th = j * 2 * math.pi / slices
            c, s = math.cos(th), math.sin(th)
            verts.append(((r * c, y, r * s), n, (1, 0, 0), (0, 0, 1 if top else -1), (c / 2 + 0.5, s / 2 + 0.5)))
        verts.append(((0.0, y, 0.0), n, (1, 0, 0), (0, 0, 1 if top else -1), (0.5, 0.5)))
        for j in range(slices):
            if top:
                tris.append((center, base + j, base + j + 1))
            else:
                tris.append((center, base + j + 1, base + j))
    pos = np.asarray([v[0] for v in verts], np.float32)
    nrm = np.asarray([v[1] for v in verts], np.float32)
    tan = np.asarray([v[2] for v in verts], np.float32)
    bit = np.asarray([v[3] for v in verts], np.float32)
    uv = np.asarray([v[4] for v in verts], np.float32)
    return Mesh.from_numpy(pos, nrm, tan, bit, uv, np.asarray(tris, np.int32))


def capsule_mesh(radius: float = 0.5, height: float = 1.0, slices: int = 24, stacks: int = 12) -> Mesh:
    """Capsule — the ``CapsuleMesh`` stub (Mesh.h:606-610) implemented:
    a UV sphere split at the equator with the cylinder section inserted."""
    sph = sphere_mesh(radius, slices, max(2, stacks))
    pos = np.asarray(sph.positions).copy()
    off = height / 2.0
    pos[:, 1] = np.where(pos[:, 1] >= 0, pos[:, 1] + off, pos[:, 1] - off)
    return Mesh.from_numpy(
        pos,
        np.asarray(sph.normals),
        np.asarray(sph.tangents),
        np.asarray(sph.bitangents),
        np.asarray(sph.uvs),
        np.asarray(sph.tris),
    )


def merge_meshes(meshes: list[Mesh]) -> tuple[Mesh, np.ndarray]:
    """Concatenate meshes into one; returns merged mesh + per-triangle
    submesh id (the DrawArgs/Submesh analog, ``Mesh.h:12-20``)."""
    offset = 0
    parts, sub_ids = [], []
    arrays = {k: [] for k in ("positions", "normals", "tangents", "bitangents", "uvs")}
    tris = []
    for si, m in enumerate(meshes):
        for k in arrays:
            arrays[k].append(np.asarray(getattr(m, k)))
        tris.append(np.asarray(m.tris) + offset)
        sub_ids.append(np.full((m.num_triangles,), si, np.int32))
        offset += m.num_vertices
    merged = Mesh.from_numpy(
        np.concatenate(arrays["positions"]),
        np.concatenate(arrays["normals"]),
        np.concatenate(arrays["tangents"]),
        np.concatenate(arrays["bitangents"]),
        np.concatenate(arrays["uvs"]),
        np.concatenate(tris),
    )
    return merged, np.concatenate(sub_ids)
