"""Scene graph lowering tests."""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, MaterialBuilder, render, sphere_mesh
from physically_based_renderer_tpu.models.scene_graph import (
    LightComponent,
    MeshComponent,
    Node,
    lower,
)
from physically_based_renderer_tpu.models.scene import translation_world


def _bank():
    mb = MaterialBuilder()
    mb.add("red", diffuse=(1, 0, 0), roughness=0.5)
    mb.add("green", diffuse=(0, 1, 0), roughness=0.5)
    return mb.build()


def test_world_composition_and_batching():
    mesh = sphere_mesh(1.0, 8, 4)
    root = Node("root", transform=translation_world(0, 0, 5))
    a = root.add(Node("a", transform=translation_world(-2, 0, 0)))
    a.components.append(MeshComponent(mesh=mesh, material=0))
    b = root.add(Node("b", transform=translation_world(2, 0, 0)))
    b.components.append(MeshComponent(mesh=mesh, material=1))
    root.components.append(
        LightComponent(kind="directional", strength=(0.5, 0.5, 0.5))
    )

    scene = lower(root, _bank())
    # same geometry → ONE instanced draw with 2 instances
    assert len(scene.draws) == 1
    assert scene.draws[0].num_instances == 2
    w = np.asarray(scene.draws[0].worlds)
    # child local @ parent: translations compose
    assert {tuple(w[0, 3, :3]), tuple(w[1, 3, :3])} == {(-2.0, 0.0, 5.0), (2.0, 0.0, 5.0)}
    assert scene.lights.num_dir == 1


def test_inactive_subtree_skipped():
    mesh = sphere_mesh(1.0, 8, 4)
    root = Node("root")
    off = root.add(Node("off", active=False))
    off.components.append(MeshComponent(mesh=mesh, material=0))
    on = root.add(Node("on"))
    on.components.append(MeshComponent(mesh=mesh, material=0))
    scene = lower(root, _bank())
    assert scene.draws[0].num_instances == 1


def test_graph_scene_renders():
    mesh = sphere_mesh(1.0, 12, 6)
    root = Node("root")
    n = root.add(Node("s"))
    n.components.append(MeshComponent(mesh=mesh, material=0))
    sun = root.add(Node("sun"))
    sun.components.append(LightComponent(kind="directional", strength=(0.4, 0.4, 0.4)))
    scene = lower(root, _bank())
    img = np.asarray(render(scene, Camera.create(aspect=1.0), width=64, height=64))
    assert np.isfinite(img).all()
    assert (np.abs(img[..., :3] - 0.5).max(-1) > 1e-6).mean() > 0.05


def test_point_and_spot_lights():
    root = Node("root")
    p = root.add(Node("p", transform=translation_world(0, 3, 0)))
    p.components.append(LightComponent(kind="point", strength=(2, 2, 2)))
    s = root.add(Node("s", transform=translation_world(0, 0, -4)))
    s.components.append(LightComponent(kind="spot", strength=(1, 1, 1), spot_power=8))
    scene = lower(root, _bank())
    assert scene.lights.num_point == 1 and scene.lights.num_spot == 1
    np.testing.assert_allclose(np.asarray(scene.lights.position[0]), [0, 3, 0])
