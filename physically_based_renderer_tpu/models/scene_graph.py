"""Hierarchical scene graph that lowers to the flat render representation.

The reference carries a vestigial scene graph — ``Node`` with a toWorld
transform, children and components (``Node.h:12-69``, ``Component.h:5-25``)
and Direct/Point/Spot light nodes (``Light.h:11-64``) — which PBRApp never
instantiates. Here it is first-class: author hierarchies of transforms,
meshes, materials and lights, then :func:`lower` composes world matrices
(row-vector, child @ parent) and emits the batched ``Scene`` pytree the
renderer consumes. Instances of the same (mesh, material-less) geometry
batch into one ``InstancedDraw``.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Iterable

import jax.numpy as jnp
import numpy as np

from ..ops.brdf import Lights
from .material import MaterialBank
from .mesh import Mesh
from .scene import InstancedDraw, Scene

_ids = itertools.count()


@dataclasses.dataclass
class Component:
    """Base component (Component.h:5-25)."""

    name: str = ""


@dataclasses.dataclass
class MeshComponent(Component):
    mesh: Mesh | None = None
    material: int = 0  # material-bank index
    face_materials: np.ndarray | None = None


@dataclasses.dataclass
class LightComponent(Component):
    """Direct/Point/Spot light property bag (Light.h:11-64). Direction and
    position are taken from the owning node's world transform: position =
    world translation, direction = +z row transformed."""

    kind: str = "directional"  # directional | point | spot
    strength: tuple = (1.0, 1.0, 1.0)
    spot_power: float = 16.0


@dataclasses.dataclass
class Node:
    """Transform-tree node (Node.h:12-69): uniqueID, local transform,
    children, components, active flag."""

    name: str = ""
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )  # local, row-vector
    children: list["Node"] = dataclasses.field(default_factory=list)
    components: list[Component] = dataclasses.field(default_factory=list)
    active: bool = True
    unique_id: int = dataclasses.field(default_factory=lambda: next(_ids))

    def add(self, child: "Node") -> "Node":
        self.children.append(child)
        return child

    def walk(self, parent_world: np.ndarray | None = None) -> Iterable[tuple["Node", np.ndarray]]:
        """Yield (node, world) for every active node (row-vector compose:
        world = local @ parent)."""
        if not self.active:
            return
        world = self.transform if parent_world is None else self.transform @ parent_world
        yield self, world
        for ch in self.children:
            yield from ch.walk(world)


def lower(
    root: Node,
    materials: MaterialBank,
    *,
    atlas=None,
    ambient=(0.03, 0.03, 0.03),
    env_map=None,
    extra_lights: Lights | None = None,
) -> Scene:
    """Flatten the graph into a renderable Scene.

    Meshes sharing the same geometry object batch into one InstancedDraw
    (unless they carry per-face materials). Lights collect into the packed
    light set, directional first (the ComputeLighting ordering)."""
    batches: dict[int, list[tuple[np.ndarray, int]]] = {}
    mesh_of: dict[int, Mesh] = {}
    face_mats: dict[int, np.ndarray | None] = {}
    directional, point, spot = [], [], []

    for node, world in root.walk():
        for comp in node.components:
            if isinstance(comp, MeshComponent) and comp.mesh is not None:
                key = id(comp.mesh) if comp.face_materials is None else -node.unique_id
                mesh_of[key] = comp.mesh
                face_mats[key] = comp.face_materials
                batches.setdefault(key, []).append((world, comp.material))
            elif isinstance(comp, LightComponent):
                pos = tuple(np.asarray(world[3, :3], np.float64))
                # local +z through the row-vector rotation = row 2 of world
                direction = np.asarray(world[2, :3], np.float64)
                direction = tuple(direction / max(np.linalg.norm(direction), 1e-12))
                if comp.kind == "directional":
                    directional.append((direction, comp.strength))
                elif comp.kind == "point":
                    point.append((pos, comp.strength))
                else:
                    spot.append((pos, direction, comp.strength, comp.spot_power))

    draws = []
    for key, instances in batches.items():
        worlds = np.stack([w for w, _ in instances]).astype(np.float32)
        mats = [m for _, m in instances]
        draws.append(
            InstancedDraw.create(
                mesh_of[key], worlds, mats, face_materials=face_mats[key]
            )
        )

    if extra_lights is not None:
        lights = extra_lights
    else:
        lights = Lights.build(directional=directional, point=point, spot=spot)

    return Scene(
        draws=tuple(draws),
        materials=materials,
        atlas=atlas,
        lights=lights,
        ambient=jnp.asarray(ambient, jnp.float32),
        env_map=env_map,
    )
