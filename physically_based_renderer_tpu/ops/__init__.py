from . import brdf, raster, raster_bin, raster_pallas, sky, texture, tonemap

__all__ = ["brdf", "raster", "raster_bin", "raster_pallas", "sky", "texture", "tonemap"]
