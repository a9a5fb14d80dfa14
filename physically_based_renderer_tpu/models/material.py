"""Material bank: structure-of-arrays material properties + texture slots.

TPU-native replacement for ``Source/App/Material.h`` and the per-material
constant buffer ``cbMaterial`` (``Core.hlsl:64-81``). Instead of one CB per
material bound per draw, ALL materials live in a single batched pytree of
(M, …) arrays; per-pixel material ids gather from it inside the shading
kernel. The 12 texture-slot pointers (``Material.h:47-58``) become integer
indices into a shared texture atlas plus a float presence mask — the mask
plays the role of the reference's shader-permutation macros
(``PBRApp.cpp:715-754``) but stays uniform across pixels so one fused kernel
shades every material class.

Every scalar/vector field is differentiable (these are the prime targets of
inverse-rendering optimisation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Texture slot order = g_TextureArray binding order (Core.hlsl:18,
# Default.hlsl:80-112) and Material.h pointer order.
SLOT_DIFFUSE = 0
SLOT_SPECULAR = 1
SLOT_METALLIC = 2
SLOT_ROUGHNESS = 3
SLOT_NORMAL = 4
SLOT_DISPLACEMENT = 5
SLOT_BUMP = 6
SLOT_AMBIENT_OCCLUSION = 7
SLOT_CAVITY = 8
SLOT_SHEEN = 9
SLOT_EMISSIVE = 10
SLOT_OPACITY = 11
NUM_SLOTS = 12

SLOT_NAMES = (
    "diffuse",
    "specular",
    "metallic",
    "roughness",
    "normal",
    "displacement",
    "bump",
    "ambient_occlusion",
    "cavity",
    "sheen",
    "emissive",
    "opacity",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialBank:
    """All (M, …) arrays. Defaults mirror MaterialProperties (Material.h:10-29)."""

    diffuse: jnp.ndarray  # (M, 3), default (1,1,1)
    metallic: jnp.ndarray  # (M,),   default 0
    fresnel_r0: jnp.ndarray  # (M, 3), default 0.04
    roughness: jnp.ndarray  # (M,),   default 1
    transmission: jnp.ndarray  # (M, 3), default 1
    height_scale: jnp.ndarray  # (M,),   default 1
    emissive: jnp.ndarray  # (M, 3), default 0
    opacity: jnp.ndarray  # (M,),   default 1
    sheen: jnp.ndarray  # (M,)
    clearcoat_thickness: jnp.ndarray  # (M,)
    clearcoat_roughness: jnp.ndarray  # (M,)
    anisotropy: jnp.ndarray  # (M,)
    anisotropy_rotation: jnp.ndarray  # (M,)
    uv_transform: jnp.ndarray  # (M, 3, 2) affine uv transform (MatTransform)
    tex_index: jnp.ndarray  # (M, 12) i32 — atlas page per slot (0 if absent)
    has_tex: jnp.ndarray  # (M, 12) f32 — 1.0 where the slot is bound
    alpha_test: jnp.ndarray  # (M,) f32 — 1.0 for alpha-tested materials
    # 1.0 for blended materials (the Transparent render layer: SrcAlpha /
    # InvSrcAlpha, CULL_NONE — PBRApp.cpp:830-844)
    transparent: jnp.ndarray  # (M,) f32
    # Static feature flag: any material binds a displacement map → the
    # parallax uv-offset path compiles in (otherwise zero cost).
    any_displacement: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Static feature flag: any alpha-tested material → render() compiles in
    # the second depth-peel pass (clip(opacity-0.1), Default.hlsl:111-116);
    # scenes without alpha test pay nothing.
    any_alpha_test: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def num_materials(self) -> int:
        return self.diffuse.shape[0]


class MaterialBuilder:
    """Host-side builder: accumulate named materials, then freeze to a bank."""

    def __init__(self):
        self._rows: list[dict] = []
        self.index: dict[str, int] = {}

    def add(
        self,
        name: str,
        *,
        diffuse=(1.0, 1.0, 1.0),
        metallic=0.0,
        fresnel_r0=(0.04, 0.04, 0.04),
        roughness=1.0,
        transmission=(1.0, 1.0, 1.0),
        height_scale=1.0,
        emissive=(0.0, 0.0, 0.0),
        opacity=1.0,
        sheen=0.0,
        clearcoat_thickness=0.0,
        clearcoat_roughness=0.0,
        anisotropy=0.0,
        anisotropy_rotation=0.0,
        uv_transform=None,
        textures: dict[str, int] | None = None,
        alpha_test=False,
        transparent=False,
    ) -> int:
        """textures: slot-name → atlas page index (see SLOT_NAMES)."""
        if name in self.index:
            raise ValueError(f"duplicate material {name!r}")
        tex_index = np.zeros((NUM_SLOTS,), np.int32)
        has_tex = np.zeros((NUM_SLOTS,), np.float32)
        for slot_name, page in (textures or {}).items():
            s = SLOT_NAMES.index(slot_name)
            tex_index[s] = page
            has_tex[s] = 1.0
        row = dict(
            diffuse=diffuse,
            metallic=metallic,
            fresnel_r0=fresnel_r0,
            roughness=roughness,
            transmission=transmission,
            height_scale=height_scale,
            emissive=emissive,
            opacity=opacity,
            sheen=sheen,
            clearcoat_thickness=clearcoat_thickness,
            clearcoat_roughness=clearcoat_roughness,
            anisotropy=anisotropy,
            anisotropy_rotation=anisotropy_rotation,
            uv_transform=np.asarray(
                uv_transform if uv_transform is not None else [[1, 0], [0, 1], [0, 0]],
                np.float32,
            ),
            tex_index=tex_index,
            has_tex=has_tex,
            alpha_test=1.0 if alpha_test else 0.0,
            transparent=1.0 if transparent else 0.0,
        )
        idx = len(self._rows)
        self._rows.append(row)
        self.index[name] = idx
        return idx

    def build(self) -> MaterialBank:
        if not self._rows:
            raise ValueError("no materials")

        def col(key, dtype=np.float32):
            return jnp.asarray(np.stack([np.asarray(r[key], dtype) for r in self._rows]))

        return MaterialBank(
            diffuse=col("diffuse"),
            metallic=col("metallic"),
            fresnel_r0=col("fresnel_r0"),
            roughness=col("roughness"),
            transmission=col("transmission"),
            height_scale=col("height_scale"),
            emissive=col("emissive"),
            opacity=col("opacity"),
            sheen=col("sheen"),
            clearcoat_thickness=col("clearcoat_thickness"),
            clearcoat_roughness=col("clearcoat_roughness"),
            anisotropy=col("anisotropy"),
            anisotropy_rotation=col("anisotropy_rotation"),
            uv_transform=col("uv_transform"),
            tex_index=jnp.asarray(np.stack([r["tex_index"] for r in self._rows])),
            has_tex=col("has_tex"),
            alpha_test=col("alpha_test"),
            transparent=col("transparent"),
            any_displacement=any(
                r["has_tex"][SLOT_DISPLACEMENT] > 0 for r in self._rows
            ),
            any_alpha_test=any(r["alpha_test"] > 0 for r in self._rows),
        )
