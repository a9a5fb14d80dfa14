"""Scene pytrees: instanced draws, flattening to rasterizer inputs.

TPU-native replacement for the reference's RenderItem / render-layer
orchestration (``PBRApp.cpp:28-59, 976-1094``). A scene is a pytree of
batched arrays: each :class:`InstancedDraw` shares one geometry across I
instances with per-instance world matrices and material ids (the RenderItem
analog, but batched so instance vertex transform is one einsum on the MXU).
Render layers disappear: the shading kernel is uniform over material classes
via texture-presence masks, and draw order is irrelevant under depth testing
(transparency, when used, is handled by the renderer's blend pass).

All fields are differentiable inputs — world matrices, material properties,
texture atlas, lights, env map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.brdf import Lights
from ..ops.ibl import IBLMaps
from ..ops.texture import TextureAtlas
from .material import MaterialBank
from .mesh import Mesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstancedDraw:
    """One shared mesh drawn I times (the batched RenderItem).

    Materials: per-instance ``material_ids`` by default; multi-material
    meshes (OBJ submeshes, ``Mesh.h:12-20`` DrawArgs) instead carry
    ``face_materials`` — global material-bank ids per triangle, shared by
    all instances."""

    mesh: Mesh
    worlds: jnp.ndarray  # (I, 4, 4) row-vector world matrices
    material_ids: jnp.ndarray  # (I,) int32
    face_materials: jnp.ndarray | None = None  # (T,) int32 or None

    @property
    def num_instances(self) -> int:
        return self.worlds.shape[0]

    @staticmethod
    def create(mesh: Mesh, worlds, material_ids, face_materials=None) -> "InstancedDraw":
        worlds = jnp.asarray(worlds, jnp.float32)
        if worlds.ndim == 2:
            worlds = worlds[None]
        return InstancedDraw(
            mesh=mesh,
            worlds=worlds,
            material_ids=jnp.atleast_1d(jnp.asarray(material_ids, jnp.int32)),
            face_materials=(
                jnp.asarray(face_materials, jnp.int32)
                if face_materials is not None
                else None
            ),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    draws: tuple[InstancedDraw, ...]
    materials: MaterialBank
    atlas: TextureAtlas | None
    lights: Lights
    ambient: jnp.ndarray  # (3,) — g_AmbientLight.rgb (0.03 in the default scene)
    env_map: jnp.ndarray | None = None  # (He, We, 3) equirect HDR sky
    ibl: IBLMaps | None = None  # precomputed irradiance/specular/LUT (replaces
    # the constant-ambient term when set — the reference's g_SkyArray[1] slot)
    sky_map: jnp.ndarray | None = None  # visible-sky override: the sIBL set's
    # hi-res LDR background (the reference's g_SkyArray[0], PBRApp.cpp:1199-
    # 1208). When None the skybox samples env_map. May be pre-paired
    # (channels doubled, ops/texture.pair_equirect) to skip per-frame copies.
    combined_atlas: object | None = None  # CombinedAtlas — the fast one-gather
    # texture path (build with .with_combined_textures())
    clear_color: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    )  # PBRApp.cpp:274

    def with_ibl(self) -> "Scene":
        """Precompute IBL maps from env_map (requires env_map)."""
        assert self.env_map is not None, "scene has no environment map"
        return dataclasses.replace(self, ibl=IBLMaps.build(self.env_map))

    def with_combined_textures(
        self, packed: bool = False, mode: str | None = None
    ) -> "Scene":
        """Bake per-material combined texture pages (one-gather sampling).

        ``mode`` (overrides the legacy ``packed`` flag):
          * ``"f32"``   — full-precision pages, differentiable (default);
          * ``"quad"``  — f32 QUAD-packed pages: ONE row gather per sample
            (latency-bound gathers make gather COUNT the cost), bit-exact
            f32 forward AND exact texel gradients — the fast exact path
            (4× page memory; see ``texture_combined.QuadCombinedAtlas``);
          * ``"half"``  — f16-quad-packed pages: one narrow gather,
            straight-through texel grads to the f32 originals
            (see ``texture_combined.HalfCombinedAtlas``);
          * ``"packed"`` — u8/uint32 pages: fastest, RGBA8 parity with the
            reference's texture units, NOT differentiable w.r.t. texels."""
        assert self.atlas is not None, "scene has no texture atlas"
        from ..ops.texture_combined import (
            build_combined,
            build_combined_half,
            build_combined_packed,
            build_combined_quad,
        )

        if mode is None:
            mode = "packed" if packed else "f32"
        build = {
            "f32": build_combined,
            "quad": build_combined_quad,
            "half": build_combined_half,
            "packed": build_combined_packed,
        }[mode]
        return dataclasses.replace(
            self, combined_atlas=build(self.materials, self.atlas)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatGeometry:
    """World-space triangle soup, ready for the rasterizer. Static shapes
    derived from the scene structure at trace time."""

    pos_w: jnp.ndarray  # (V, 3)
    normal_w: jnp.ndarray  # (V, 3)
    tangent_w: jnp.ndarray  # (V, 3)
    bitangent_w: jnp.ndarray  # (V, 3)
    uv: jnp.ndarray  # (V, 2)
    tris: jnp.ndarray  # (T, 3) int32
    face_material: jnp.ndarray  # (T,) int32


def flatten_scene(scene: Scene) -> FlatGeometry:
    """Instance-expand every draw into world space.

    The per-instance vertex transform is the VS world stage
    (``Default.hlsl:27-35``): positions through the full 4x4, direction
    attributes through the 3x3 (no inverse-transpose — parity with the
    reference's uniform-scale assumption). Batched as einsums → MXU."""
    pos_parts, nrm_parts, tan_parts, bit_parts, uv_parts = [], [], [], [], []
    tri_parts, mat_parts = [], []
    v_offset = 0
    for draw in scene.draws:
        m = draw.mesh
        w = draw.worlds  # (I,4,4)
        num_i = w.shape[0]
        nv = m.num_vertices

        rot = w[:, :3, :3]  # (I,3,3)
        trans = w[:, 3, :3]  # (I,3)
        pos = jnp.einsum("vc,icd->ivd", m.positions, rot) + trans[:, None, :]
        nrm = jnp.einsum("vc,icd->ivd", m.normals, rot)
        tan = jnp.einsum("vc,icd->ivd", m.tangents, rot)
        bit = jnp.einsum("vc,icd->ivd", m.bitangents, rot)
        uv = jnp.broadcast_to(m.uvs[None], (num_i, nv, 2))

        pos_parts.append(pos.reshape(-1, 3))
        nrm_parts.append(nrm.reshape(-1, 3))
        tan_parts.append(tan.reshape(-1, 3))
        bit_parts.append(bit.reshape(-1, 3))
        uv_parts.append(uv.reshape(-1, 2))

        inst_off = v_offset + jnp.arange(num_i, dtype=jnp.int32) * nv  # (I,)
        tris = m.tris[None, :, :] + inst_off[:, None, None]  # (I,T,3)
        tri_parts.append(tris.reshape(-1, 3))
        if draw.face_materials is not None:
            face_mat = jnp.broadcast_to(
                draw.face_materials[None, :], (num_i, m.num_triangles)
            )
        else:
            face_mat = jnp.broadcast_to(
                draw.material_ids[:, None], (num_i, m.num_triangles)
            )
        mat_parts.append(face_mat.reshape(-1))
        v_offset += num_i * nv

    return FlatGeometry(
        pos_w=jnp.concatenate(pos_parts),
        normal_w=jnp.concatenate(nrm_parts),
        tangent_w=jnp.concatenate(tan_parts),
        bitangent_w=jnp.concatenate(bit_parts),
        uv=jnp.concatenate(uv_parts),
        tris=jnp.concatenate(tri_parts),
        face_material=jnp.concatenate(mat_parts),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CornerGeometry:
    """World-space triangle soup in CORNER-MAJOR layout: every triangle's
    three corners stored contiguously, no vertex indices.

    This is the TPU-native geometry representation for the hot render path:
    vertex-major layouts force (T·3)-row random gathers per frame (the
    dominant raster-setup cost — XLA gathers are latency-bound per row,
    ~8 ns · 583k rows ≈ 4.5 ms at 195k triangles), while corner-major pays
    one tiny per-BASE-MESH gather at flatten time (topology is shared across
    instances) and replaces the rest with dense einsums on the MXU.

    ``attrs`` packs the interpolated vertex attributes (the ``Vertex`` layout
    of ``FrameResource.h:46-76``): [pos_w(3), normal_w(3)] untextured, plus
    [tangent_w(3), bitangent_w(3), uv(2)] when textured.
    """

    attrs: jnp.ndarray  # (T, 3, C) with C = 6 or 14
    face_material: jnp.ndarray  # (T,) int32

    @property
    def pos_w(self) -> jnp.ndarray:
        return self.attrs[..., 0:3]

    @property
    def num_triangles(self) -> int:
        return self.attrs.shape[0]


def flatten_scene_corners(scene: Scene, *, textured: bool) -> CornerGeometry:
    """Instance-expand every draw into a corner-major world-space soup.

    The corner gather happens per BASE mesh (3·T_base rows — tiny, amortized
    over all instances); the instance expansion is a dense einsum (MXU), so
    no per-world-triangle gathers remain anywhere in the frame."""
    attr_parts, mat_parts = [], []
    for draw in scene.draws:
        m = draw.mesh
        w = draw.worlds  # (I,4,4)
        num_i = w.shape[0]
        idx = m.tris  # (Tb, 3)

        # Per-base-mesh corner gather (small) then pack local attrs.
        if textured:
            local = jnp.concatenate(
                [m.positions, m.normals, m.tangents, m.bitangents], axis=-1
            )[idx]  # (Tb, 3, 12)
            uv_c = m.uvs[idx]  # (Tb, 3, 2)
        else:
            local = jnp.concatenate([m.positions, m.normals], axis=-1)[idx]

        rot = w[:, :3, :3]  # (I,3,3)
        trans = w[:, 3, :3]  # (I,3)
        # Direction blocks (normals/tangents/bitangents) transform by the
        # 3x3; positions additionally translate (Default.hlsl:27-35).
        nblk = local.shape[-1] // 3
        lb = local.reshape(*local.shape[:-1], nblk, 3)
        wb = jnp.einsum("tkbc,icd->itkbd", lb, rot)
        wb = wb.at[..., 0, :].add(trans[:, None, None, :])
        world = wb.reshape(num_i, *local.shape[:-1], nblk * 3)
        if textured:
            uv_i = jnp.broadcast_to(uv_c[None], (num_i, *uv_c.shape))
            world = jnp.concatenate([world, uv_i], axis=-1)
        attr_parts.append(world.reshape(-1, 3, world.shape[-1]))

        if draw.face_materials is not None:
            face_mat = jnp.broadcast_to(
                draw.face_materials[None, :], (num_i, m.num_triangles)
            )
        else:
            face_mat = jnp.broadcast_to(
                draw.material_ids[:, None], (num_i, m.num_triangles)
            )
        mat_parts.append(face_mat.reshape(-1))

    return CornerGeometry(
        attrs=jnp.concatenate(attr_parts),
        face_material=jnp.concatenate(mat_parts),
    )


def translation_world(x, y, z) -> np.ndarray:
    """Row-vector translation matrix (host-side convenience)."""
    m = np.eye(4, dtype=np.float32)
    m[3, :3] = (x, y, z)
    return m
