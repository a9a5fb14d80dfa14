from . import brdf, raster, sky, texture, tonemap

__all__ = ["brdf", "raster", "sky", "texture", "tonemap"]
