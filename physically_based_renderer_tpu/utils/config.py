"""Render configuration + debug modes.

TPU-native replacement for the reference's flag system (SURVEY.md §5):
compile-time shader macros become fields of a static RenderConfig baked into
the jit; the D3D12 debug layer / CRT leak checks become jax debug toggles.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging

import jax

log = logging.getLogger("pbr_tpu")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (hashable → usable as a jit static arg).

    Mirrors: window size (``d3dApp.h:126-127`` 1200×800 default), tonemap
    on/off, backface culling, raster backend and tile geometry. The
    reference's five shader-macro permutations need no flags here — material
    texture masks specialise uniformly (see models/material.py).
    """

    width: int = 1200
    height: int = 800
    apply_tonemap: bool = True
    cull_backface: bool = True
    raster_backend: str = "auto"
    tile_h: int | None = None
    tile_w: int = 128
    # Binning pair capacity for the Pallas backends (None = T-sized default,
    # raster_bin.bin_triangles). RenderLoop auto-sizes this on the first
    # frame via renderer.check_raster_capacity (the overflow guard that
    # works on backends without host callbacks).
    raster_pairs_cap: int | None = None
    # Screen-space-derivative mip selection for textured materials (needs
    # atlas/combined mip chains; see ops/texture.screen_space_lod). Off by
    # default: mip-0 bilinear matches the reference's 1-mip loads.
    mip_lod: bool = False

    def render_kwargs(self) -> dict:
        return dict(
            width=self.width,
            height=self.height,
            apply_tonemap=self.apply_tonemap,
            cull_backface=self.cull_backface,
            raster_backend=self.raster_backend,
            tile_h=self.tile_h,
            tile_w=self.tile_w,
            raster_pairs_cap=self.raster_pairs_cap,
            mip_lod=self.mip_lod,
        )


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True):
    """The D3D12-debug-layer analog: enable NaN/Inf checking inside jitted
    code for the scope (slows everything; use for repro hunts)."""
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", nan_checks)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def log_startup_info() -> None:
    """Log device topology at init (the LogAdapters analog)."""
    from .profiling import device_summary

    log.info("physically_based_renderer_tpu startup\n%s", device_summary())
