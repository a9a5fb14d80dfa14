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
