from . import material, mesh, scene

__all__ = ["material", "mesh", "scene"]
