"""physically_based_renderer_tpu — a TPU-native differentiable PBR renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
trevordblack/Physically_Based_Renderer (a Windows D3D12 forward PBR renderer):
rasterize-then-shade Cook-Torrance PBR with texture/normal mapping, punctual
lights, equirect sky and IBL — redesigned as one pure, differentiable,
shardable function instead of a retained-mode GPU app.

Quick start::

    import physically_based_renderer_tpu as pbr
    scene = pbr.scenes.sphere_grid_scene()
    cam = pbr.Camera.create()
    img = pbr.render(scene, cam, width=1200, height=800)
"""

from . import math3d
from .camera import Camera
from .models.material import MaterialBank, MaterialBuilder
from .models.mesh import Mesh, sphere_mesh
from .models.scene import InstancedDraw, Scene, flatten_scene
from .ops.brdf import Lights, MaterialSample
from .renderer import render, shade_pixels

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "InstancedDraw",
    "Lights",
    "MaterialBank",
    "MaterialBuilder",
    "MaterialSample",
    "Mesh",
    "Scene",
    "flatten_scene",
    "math3d",
    "render",
    "shade_pixels",
    "sphere_mesh",
]
