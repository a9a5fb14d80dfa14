"""sIBL-archive environment sets: descriptor parsing + light extraction.

The reference's three environments (``Assets/{Chelsea_Stairs,
PaperMill_Ruins_E, Subway_Lights}``) are hdrlabs sIBL sets: an ``.ibl``
INI descriptor naming the equirect maps (LDR background, HDR environment,
HDR reflection) plus artist-placed light hotspots ([Sun] and [LightN]
sections with equirect (u,v) anchors, RGB color and a multiplier). The
reference app ignores the descriptor and hardcodes one LDR env PNG
(``PBRApp.cpp:1207-1208``) with four fixed directional lights
(``PBRApp.cpp:478-487``); we parse the whole set so a scene can load the
HDR environment at the right intensity AND synthesize its directional
lights from the descriptor.

Directions: an sIBL (u,v) anchors a point on the same equirect mapping the
sky shader uses, so the light direction is ``sky_uv_to_direction(u, v)``
(the inverse of ``WorldToSkyUV``, LightingUtil.hlsl:216-225).
"""

from __future__ import annotations

import configparser
import dataclasses
import os
import re

import numpy as np


@dataclasses.dataclass(frozen=True)
class SIBLLight:
    """One [Sun]/[LightN] hotspot: direction FROM the light (like the
    reference's directional lights), linear RGB strength."""

    name: str
    color: tuple[float, float, float]  # 0-1 sRGB-ish primaries
    multiplier: float
    u: float
    v: float

    @property
    def strength(self) -> tuple[float, float, float]:
        return tuple(c * self.multiplier for c in self.color)

    def direction(self) -> np.ndarray:
        """World-space direction of light travel (from the hotspot toward
        the scene origin)."""
        from ..ops.ibl import sky_uv_to_direction

        d = np.asarray(sky_uv_to_direction(np.float32(self.u), np.float32(self.v)))
        return -d  # light travels from the sky point toward the scene


@dataclasses.dataclass(frozen=True)
class SIBLSet:
    """Parsed .ibl descriptor (paths resolved relative to the set dir)."""

    name: str
    directory: str
    background_file: str | None  # LDR equirect (what the reference samples)
    environment_file: str | None  # low-res HDR for diffuse lighting
    environment_multiplier: float
    reflection_file: str | None  # hi-res HDR for specular
    reflection_multiplier: float
    sun: SIBLLight | None
    lights: tuple[SIBLLight, ...]

    def load_environment(self) -> np.ndarray:
        """HDR environment map (H, W, 3) float32, multiplier applied."""
        from ..utils.image_io import load_hdr

        assert self.environment_file, f"{self.name} has no EVfile"
        img = load_hdr(os.path.join(self.directory, self.environment_file))
        return img * np.float32(self.environment_multiplier)

    def load_reflection(self) -> np.ndarray:
        from ..utils.image_io import load_hdr

        assert self.reflection_file, f"{self.name} has no REFfile"
        img = load_hdr(os.path.join(self.directory, self.reflection_file))
        return img * np.float32(self.reflection_multiplier)

    def load_background(self) -> np.ndarray | None:
        """Visible-sky source, (H, W, 3) float32 — what the skybox pass
        samples, mirroring the reference's choice of the sIBL set's LDR
        sky image over the small HDR env (``PBRApp.cpp:1199-1208`` loads
        ``*_3k.png``/``*_Env.png`` for the g_SkyArray[0] background slot).

        Tries, in order: the descriptor's BGfile, any ``*_[0-9]k`` hi-res
        LDR beside it, the LDR ``*_Env.png``. LDR pixel values are returned
        RAW in [0,1] (no sRGB decode) — the reference samples the PNG as
        UNORM and tonemaps the raw values (``Skybox.hlsl:44-47``). Returns
        None if no LDR background exists (callers fall back to the HDR env).
        """
        from ..utils.image_io import load_hdr, load_image

        candidates: list[str] = []
        if self.background_file:
            candidates.append(self.background_file)
        for f in sorted(os.listdir(self.directory)):
            fl = f.lower()
            if re.search(r"_\d+k\.(png|jpg|jpeg)$", fl) or fl.endswith("_env.png"):
                candidates.append(f)
        for name in candidates:
            path = os.path.join(self.directory, name)
            if not os.path.exists(path):
                continue
            if name.lower().endswith(".hdr"):
                return load_hdr(path).astype(np.float32)
            img = load_image(path)  # (H, W, C) uint8
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            return (img[..., :3].astype(np.float32)) / 255.0
        return None

    def directional_lights(self) -> list[SIBLLight]:
        out = list(self.lights)
        if self.sun is not None:
            out.insert(0, self.sun)
        return out


def _unquote(v: str) -> str:
    v = v.split(";")[0].strip()
    return v.strip('"')


def _color(v: str) -> tuple[float, float, float]:
    parts = [float(x) for x in re.split(r"[,\s]+", _unquote(v)) if x]
    c = (parts + [0.0, 0.0, 0.0])[:3]
    return tuple(x / 255.0 for x in c)


def parse_ibl(path: str) -> SIBLSet:
    """Parse an sIBL .ibl descriptor file."""
    cp = configparser.ConfigParser(strict=False, inline_comment_prefixes=(";",))
    with open(path, "r", errors="replace") as f:
        cp.read_string(f.read())

    def get(section, key, default=None):
        try:
            return _unquote(cp.get(section, key))
        except (configparser.NoSectionError, configparser.NoOptionError):
            return default

    def getf(section, key, default=0.0):
        v = get(section, key)
        try:
            return float(v) if v is not None else default
        except ValueError:
            return default

    def light_from(section, prefix, fallback_name):
        if not cp.has_section(section):
            return None
        return SIBLLight(
            name=get(section, f"{prefix}name", fallback_name) or fallback_name,
            color=_color(get(section, f"{prefix}color", "255,255,255")),
            multiplier=getf(section, f"{prefix}multi", 1.0),
            u=getf(section, f"{prefix}u", 0.0),
            v=getf(section, f"{prefix}v", 0.0),
        )

    lights = []
    for i in range(1, 33):
        li = light_from(f"Light{i}", "LIGHT", f"Light{i}")
        if li is None:
            break
        lights.append(li)

    # Note the sIBL spec's spelling: the section really is "Enviroment".
    env_section = "Enviroment" if cp.has_section("Enviroment") else "Environment"
    return SIBLSet(
        name=get("Header", "Name", os.path.basename(path)) or "",
        directory=os.path.dirname(os.path.abspath(path)),
        background_file=get("Background", "BGfile"),
        environment_file=get(env_section, "EVfile"),
        environment_multiplier=getf(env_section, "EVmulti", 1.0),
        reflection_file=get("Reflection", "REFfile"),
        reflection_multiplier=getf("Reflection", "REFmulti", 1.0),
        sun=light_from("Sun", "SUN", "Sun"),
        lights=tuple(lights),
    )


def find_ibl(directory: str) -> str | None:
    """Locate the .ibl descriptor inside a set directory."""
    for f in sorted(os.listdir(directory)):
        if f.lower().endswith(".ibl"):
            return os.path.join(directory, f)
    return None


def sibl_scene_lights(s: SIBLSet, max_lights: int = 16):
    """Build a renderer ``Lights`` bank from the descriptor's sun + light
    hotspots (all directional, matching the reference's light model)."""
    from ..ops.brdf import Lights

    ls = s.directional_lights()[:max_lights]
    if not ls:
        return Lights.default_scene_lights()
    return Lights.build(
        directional=[(tuple(l.direction()), l.strength) for l in ls]
    )
