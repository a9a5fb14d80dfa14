"""Built-in scene builders replicating the reference app's scenes.

TPU-native replacement for ``PBRApp::{LoadTextures, BuildMaterials,
BuildGeometry, BuildRenderItems}`` (``PBRApp.cpp:504-1094``): the 58-sphere
PBR.png scene (9 textured spheres in a row + 7×7 roughness×metallic sweep of
red analytic spheres), the single rustediron sphere of
``Samples/rusted_iron_pbr.png``, and the config-1 analytic sphere.

Asset decode happens host-side once; everything lands in device arrays.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .models.material import MaterialBuilder
from .models.mesh import Mesh, sphere_mesh
from .models.scene import InstancedDraw, Scene, translation_world
from .ops.brdf import Lights
from .ops.texture import build_atlas
from .utils.image_io import find_asset_root, load_hdr, load_image

AMBIENT = (0.03, 0.03, 0.03)  # PBRApp.cpp:478

# Texture-set directories and file stems (PBRApp::LoadTextures,
# PBRApp.cpp:1196-1467). Maps logical set name → (dir, stem, size-tag).
TEXTURE_SETS = {
    "rusted_iron": ("rustediron", "rustediron2_{}", None),
    "rock_copper": ("rockcopper", "copper-rock1-{}", None),
    "brick_modern": ("Brick_Modern_1K", "semlcibb_8K_{}", None),
    "concrete_dirty": ("Concrete_Dirty_1K", "rm4kshp_4K_{}", None),
    "concrete_rough": ("Concrete_Rough_1K", "sdbhdd3b_8K_{}", None),
    "grass_wild": ("Grass_Wild_1K", "sfknaeoa_8K_{}", None),
    "metal_bare": ("Metal_Bare_1K", "se2abbvc_8K_{}", None),
    "soil_mud": ("Soil_Mud_1K", "sghjcnyo_8K_{}", None),
    "stone_wall": ("Stone_Wall_1K", "sdambcec_8K_{}", None),
}

# slot name → filename tokens to try (Albedo/Specular/... naming of the assets)
SLOT_FILE_TOKENS = {
    "diffuse": ("Albedo", "basecolor", "albedo"),
    "specular": ("Specular", "specular"),
    "metallic": ("Metalness", "metallic", "Metallic"),
    "roughness": ("Roughness", "roughness"),
    "normal": ("Normal", "normal"),
    "displacement": ("Displacement",),
}

SRGB_SLOTS = {"diffuse", "specular"}

ENVIRONMENTS = {
    "chelsea_stairs": ("Chelsea_Stairs", "Chelsea_Stairs_Env.hdr"),
    "papermill": ("PaperMill_Ruins_E", "PaperMill_E_Env.hdr"),
    "subway_lights": ("Subway_Lights", "20_Subway_Lights_Env.hdr"),
}


def _find_texture_file(root: str, set_name: str, slot: str) -> str | None:
    dirname, stem, _ = TEXTURE_SETS[set_name]
    d = os.path.join(root, dirname)
    if not os.path.isdir(d):
        return None
    files = os.listdir(d)
    for token in SLOT_FILE_TOKENS.get(slot, ()):
        for f in files:
            if token.lower() in f.lower() and f.lower().endswith((".jpg", ".png", ".jpeg")):
                return os.path.join(d, f)
    return None


class AssetCache:
    """Loads and packs texture sets once per process."""

    def __init__(self, asset_root: str | None = None, texture_size: int = 512):
        self.root = asset_root or find_asset_root()
        self.texture_size = texture_size
        self.pages: list[np.ndarray] = []
        self.srgb: list[bool] = []
        self._page_index: dict[str, int] = {}

    def page(self, set_name: str, slot: str) -> int | None:
        """Atlas page for (texture set, slot); decodes lazily. None if the
        file doesn't exist (slot left unbound, like a null texture ptr)."""
        key = f"{set_name}/{slot}"
        if key in self._page_index:
            return self._page_index[key]
        if self.root is None:
            return None
        path = _find_texture_file(self.root, set_name, slot)
        if path is None:
            return None
        img = load_image(path)
        idx = len(self.pages)
        self.pages.append(img)
        self.srgb.append(slot in SRGB_SLOTS)
        self._page_index[key] = idx
        return idx

    def build_atlas(self):
        if not self.pages:
            return None
        return build_atlas(self.pages, self.srgb, size=self.texture_size)

    def load_environment(self, name: str) -> jnp.ndarray:
        dirname, filename = ENVIRONMENTS[name]
        path = os.path.join(self.root, dirname, filename)
        return jnp.asarray(load_hdr(path))

    def load_sky_background(self, name: str) -> jnp.ndarray | None:
        """Visible-sky map: the sIBL set's LDR background (what the reference
        samples for g_SkyArray[0], PBRApp.cpp:1199-1208), quad-packed to u8
        words at build time (ops/texture.quad_pack_equirect_u8): the whole
        2×2 bilinear footprint rides ONE narrow gather per pixel — the f32
        4-gather path cost ~44 ms/frame at 1080p on a 3k background. The
        source PNG is 8-bit, so the u8 words are bit-exact against the file.
        None if the set has no LDR background."""
        from .models.sibl import find_ibl, parse_ibl
        from .ops.texture import quad_pack_equirect_u8

        dirname, _ = ENVIRONMENTS[name]
        path = find_ibl(os.path.join(self.root, dirname))
        if path is None:
            return None
        bg = parse_ibl(path).load_background()
        if bg is None:
            return None
        return quad_pack_equirect_u8(jnp.asarray(bg, jnp.float32))

    def load_sibl(self, name: str):
        """Parse the environment's sIBL descriptor (.ibl): env/reflection
        files + multipliers, sun and artist-placed lights. See models/sibl."""
        from .models.sibl import find_ibl, parse_ibl

        dirname, _ = ENVIRONMENTS[name]
        path = find_ibl(os.path.join(self.root, dirname))
        assert path is not None, f"no .ibl descriptor in {dirname}"
        return parse_ibl(path)

    def sibl_lights(self, name: str):
        """Directional lights synthesized from the sIBL descriptor's
        [Sun]/[LightN] hotspots."""
        from .models.sibl import sibl_scene_lights

        return sibl_scene_lights(self.load_sibl(name))


# ---------------------------------------------------------------------------
# Scene builders (the BASELINE.json configs)
# ---------------------------------------------------------------------------


def analytic_sphere_scene(
    albedo=(1.0, 0.0, 0.0),
    roughness=0.5,
    metallic=0.5,
    slices: int = 64,
    stacks: int = 32,
    lights: Lights | None = None,
) -> Scene:
    """Config 1: one constant-material sphere, default 4 directional lights."""
    mb = MaterialBuilder()
    mb.add("sphere", diffuse=albedo, roughness=roughness, metallic=metallic)
    return Scene(
        draws=(
            InstancedDraw.create(sphere_mesh(1.0, slices, stacks), np.eye(4, dtype=np.float32), [0]),
        ),
        materials=mb.build(),
        atlas=None,
        lights=lights if lights is not None else Lights.default_scene_lights(),
        ambient=jnp.asarray(AMBIENT, jnp.float32),
    )


def red_sphere_grid_scene(slices: int = 64, stacks: int = 32) -> Scene:
    """The 7×7 analytic red-sphere sweep (roughness=(i%7)/6, metallic=1-(i//7)/6,
    positions from the 'hacky translation' at PBRApp.cpp:1016-1024)."""
    mb = MaterialBuilder()
    worlds, mids = [], []
    for i in range(49):
        mid = mb.add(
            f"sphere_red_{i}",
            diffuse=(1.0, 0.0, 0.0),
            fresnel_r0=(0.04, 0.04, 0.04),
            roughness=(i % 7) / 6.0,
            metallic=1.0 - (i // 7) / 6.0,
        )
        x = (i % 7) * 2.5 - 3 * 2.5
        y = (i // 7) * -2.5 - 2.5
        worlds.append(translation_world(x, y, 0.0))
        mids.append(mid)
    mesh = sphere_mesh(1.0, slices, stacks)
    return Scene(
        draws=(InstancedDraw.create(mesh, np.stack(worlds), mids),),
        materials=mb.build(),
        atlas=None,
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray(AMBIENT, jnp.float32),
    )


# Textured sphere rows of the full PBR scene: material name →
# (texture set, bound slots, x position) — PBRApp.cpp:892-974, 1026-1068.
_TEXTURED_SPHERES = {
    "sphere_rust": ("rusted_iron", ("diffuse", "metallic", "roughness", "normal"), 0.0),
    "sphere_rock_copper": ("rock_copper", ("diffuse", "metallic", "roughness", "normal"), -2.5),
    "sphere_brick_modern": ("brick_modern", ("diffuse", "specular", "roughness", "normal"), -5.0),
    "sphere_concrete_dirty": ("concrete_dirty", ("diffuse", "specular", "roughness", "normal"), -7.5),
    "sphere_concrete_rough": ("concrete_rough", ("diffuse", "specular", "roughness", "normal"), -10.0),
    "sphere_grass_wild": ("grass_wild", ("diffuse", "specular", "roughness", "normal"), 2.5),
    "sphere_metal_bare": ("metal_bare", ("diffuse", "specular", "metallic", "roughness", "normal"), 5.0),
    "sphere_soil_mud": ("soil_mud", ("diffuse", "specular", "roughness", "normal"), 7.5),
    "sphere_stone_wall": ("stone_wall", ("diffuse", "specular", "roughness", "normal"), 10.0),
}


def pbr_scene(
    assets: AssetCache | None = None,
    texture_size: int = 512,
    slices: int = 64,
    stacks: int = 32,
    environment: str | None = None,
) -> Scene:
    """The full 58-sphere PBR.png scene: 9 textured spheres in a row at y=0
    plus the 7×7 red sweep below (PBRApp.cpp:892-1094). If assets are
    unavailable the textured row falls back to analytic materials."""
    assets = assets or AssetCache(texture_size=texture_size)
    mb = MaterialBuilder()
    worlds, mids = [], []

    for name, (set_name, slots, x) in _TEXTURED_SPHERES.items():
        textures = {}
        for slot in slots:
            page = assets.page(set_name, slot)
            if page is not None:
                textures[slot] = page
        mid = mb.add(name, diffuse=(1.0, 1.0, 1.0), roughness=0.5, metallic=0.0,
                     textures=textures)
        worlds.append(translation_world(x, 0.0, 0.0))
        mids.append(mid)

    for i in range(49):
        mid = mb.add(
            f"sphere_red_{i}",
            diffuse=(1.0, 0.0, 0.0),
            roughness=(i % 7) / 6.0,
            metallic=1.0 - (i // 7) / 6.0,
        )
        worlds.append(translation_world((i % 7) * 2.5 - 7.5, (i // 7) * -2.5 - 2.5, 0.0))
        mids.append(mid)

    mesh = sphere_mesh(1.0, slices, stacks)
    env = assets.load_environment(environment) if environment else None
    sky = assets.load_sky_background(environment) if environment else None
    return Scene(
        draws=(InstancedDraw.create(mesh, np.stack(worlds), mids),),
        materials=mb.build(),
        atlas=assets.build_atlas(),
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray(AMBIENT, jnp.float32),
        env_map=env,
        sky_map=sky,
    )


def obj_scene(
    path: str,
    assets: AssetCache | None = None,
    texture_size: int = 512,
    world=None,
    environment: str | None = None,
    lights: Lights | None = None,
    prefer_native: bool = True,
) -> Scene:
    """Load an OBJ model (with MTL materials + textures) into a scene —
    the LoadOBJModel path (PBRApp.cpp:1471-1639)."""
    from .models.obj_loader import load_obj
    from .utils.image_io import load_image

    loaded = load_obj(path, prefer_native=prefer_native)
    assets = assets or AssetCache(texture_size=texture_size)

    mb = MaterialBuilder()
    local_to_global = []
    if not loaded.material_names:
        local_to_global.append(mb.add("obj::default"))
    for name, kwargs, textures in zip(
        loaded.material_names, loaded.material_kwargs, loaded.material_textures
    ):
        pages = {}
        for slot, tex_path in textures.items():
            if os.path.exists(tex_path):
                key = f"obj:{tex_path}"
                if key not in assets._page_index:
                    img = load_image(tex_path)
                    idx = len(assets.pages)
                    assets.pages.append(img)
                    assets.srgb.append(slot in SRGB_SLOTS)
                    assets._page_index[key] = idx
                pages[slot] = assets._page_index[key]
        local_to_global.append(mb.add(name, textures=pages, **kwargs))

    face_mat = np.asarray(local_to_global, np.int32)[loaded.face_material]
    if world is None:
        world = np.eye(4, dtype=np.float32)
    env = assets.load_environment(environment) if environment else None
    return Scene(
        draws=(
            InstancedDraw.create(loaded.mesh, world, [local_to_global[0]], face_materials=face_mat),
        ),
        materials=mb.build(),
        atlas=assets.build_atlas(),
        lights=lights if lights is not None else Lights.default_scene_lights(),
        ambient=jnp.asarray(AMBIENT, jnp.float32),
        env_map=env,
        sky_map=assets.load_sky_background(environment) if environment else None,
    )


def mori_knob_scene(
    assets: AssetCache | None = None,
    texture_size: int = 512,
    environment: str | None = None,
    world=None,
) -> Scene:
    """BASELINE config 4: the mori_knob test model (6,091 verts / 11,970 tris
    / 5 materials — Assets/mori_knob/testObj.obj)."""
    assets = assets or AssetCache(texture_size=texture_size)
    path = os.path.join(assets.root, "mori_knob", "testObj.obj")
    return obj_scene(path, assets=assets, texture_size=texture_size,
                     world=world, environment=environment)


def rustediron_sphere_scene(
    assets: AssetCache | None = None, texture_size: int = 512, environment: str | None = None
) -> Scene:
    """Config 3: single textured sphere with the rustediron metallic-roughness
    + normal maps (``Samples/rusted_iron_pbr.png``)."""
    assets = assets or AssetCache(texture_size=texture_size)
    mb = MaterialBuilder()
    textures = {}
    for slot in ("diffuse", "metallic", "roughness", "normal"):
        page = assets.page("rusted_iron", slot)
        if page is not None:
            textures[slot] = page
    mb.add("sphere_rust", textures=textures)
    env = assets.load_environment(environment) if environment else None
    return Scene(
        draws=(InstancedDraw.create(sphere_mesh(1.0, 64, 32), np.eye(4, dtype=np.float32), [0]),),
        materials=mb.build(),
        atlas=assets.build_atlas(),
        lights=Lights.default_scene_lights(),
        ambient=jnp.asarray(AMBIENT, jnp.float32),
        env_map=env,
        sky_map=assets.load_sky_background(environment) if environment else None,
    )
