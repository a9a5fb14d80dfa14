"""Binned Pallas rasterizer vs the jnp tiled rasterizer (interpret mode on
CPU — same kernel code path as the TPU, minus Mosaic codegen)."""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, math3d, sphere_mesh
from physically_based_renderer_tpu.ops import raster
from physically_based_renderer_tpu.ops.raster import setup_triangles
from physically_based_renderer_tpu.ops.raster_bin import bin_triangles
from physically_based_renderer_tpu.ops.raster_pallas import rasterize_binned

W, H = 256, 192


def _clip_sphere(slices=24, stacks=12):
    mesh = sphere_mesh(1.0, slices, stacks)
    cam = Camera.create(aspect=W / H)
    return math3d.transform_points_h(mesh.positions, cam.view_proj()), mesh.tris


def test_binned_matches_jnp_sphere():
    clip, tris = _clip_sphere()
    a = raster.rasterize(clip, tris, width=W, height=H)
    b = rasterize_binned(clip, tris, width=W, height=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_binned_matches_jnp_random_soup(rng):
    verts = rng.uniform(-1, 1, size=(90, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(1.0, 5.0, size=90)
    tris = jnp.asarray(rng.integers(0, 90, size=(64, 3)), jnp.int32)
    cam = Camera.create(position=(0, 0, 0), aspect=W / H)
    clip = math3d.transform_points_h(jnp.asarray(verts), cam.view_proj())
    a = raster.rasterize(clip, tris, width=W, height=H, cull_backface=False)
    b = rasterize_binned(clip, tris, width=W, height=H, cull_backface=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_binned_jumbo_fullscreen():
    clip = jnp.asarray(
        [[-3.0, -1.0, 0.5, 1.0], [3.0, -1.0, 0.5, 1.0], [0.0, 3.0, 0.5, 1.0]]
    )
    tris = jnp.asarray([[0, 2, 1]], jnp.int32)
    out = rasterize_binned(clip, tris, width=W, height=H, interpret=True, max_span=1)
    assert (np.asarray(out) == 0).all()


def test_binned_band_rendering():
    clip, tris = _clip_sphere()
    full = rasterize_binned(clip, tris, width=W, height=H, interpret=True)
    band = rasterize_binned(
        clip, tris, width=W, height=H, rows=64, y_offset=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(band), np.asarray(full)[64:128])


def test_binning_structure():
    clip, tris = _clip_sphere()
    st = setup_triangles(clip, tris, W, H, True, None)
    b = bin_triangles(st, width=W, height=H, tile_h=16, tile_w=128)
    starts = np.asarray(b.starts)
    assert starts[-1] == int(b.num_pairs)
    assert (np.diff(starts) >= 0).all()
    assert not bool(b.overflowed)
    # every real pair's triangle id is valid
    pt = np.asarray(b.pair_tri)[: int(b.num_pairs)]
    assert (pt[starts[0] :] >= 0).all()


def test_binning_overflow_flag():
    clip, tris = _clip_sphere()
    st = setup_triangles(clip, tris, W, H, True, None)
    b = bin_triangles(st, width=W, height=H, tile_h=16, tile_w=128, pairs_cap=16)
    assert bool(b.overflowed)


def test_render_pallas_backend_matches_jnp():
    from physically_based_renderer_tpu import render, scenes

    scene = scenes.analytic_sphere_scene(slices=16, stacks=8)
    cam = Camera.create(aspect=W / H)
    a = render(scene, cam, width=W, height=H, raster_backend="jnp")
    b = render(scene, cam, width=W, height=H, raster_backend="pallas_interpret")
    # Same interpolation math (interpolate_corners) on the same tri ids —
    # the paths differ only in the raster kernel, so they agree to fp32 ulp.
    # (Fused G-buffer parity lives in test_raster_gbuf.py.)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_material_resolve_matches_gather():
    from physically_based_renderer_tpu import scenes
    from physically_based_renderer_tpu.models.scene import flatten_scene

    scene = scenes.red_sphere_grid_scene(slices=12, stacks=6)
    cam = Camera.create(position=(0.0, -5.0, -16.0), aspect=W / H)
    geom = flatten_scene(scene)
    clip = math3d.transform_points_h(geom.pos_w, cam.view_proj())
    tid, mat = rasterize_binned(
        clip,
        geom.tris,
        width=W,
        height=H,
        face_material=geom.face_material,
        num_materials=scene.materials.num_materials,
        interpret=True,
    )
    expect_tid = rasterize_binned(clip, geom.tris, width=W, height=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(tid), np.asarray(expect_tid))
    expect_mat = np.where(
        np.asarray(tid) >= 0,
        np.asarray(geom.face_material)[np.maximum(np.asarray(tid), 0)],
        0,
    )
    np.testing.assert_array_equal(np.asarray(mat), expect_mat)


def test_binned_big_block_and_spill(rng):
    """Triangles spanning 3..max_span tiles ride the compacted big block;
    forcing big_cap overflow must spill them to the (correct) jumbo run."""
    # Mid-size triangles: ~40 px across → bbox spans 2-6 of the 16×128 tiles.
    verts = []
    tris = []
    for i in range(12):
        cx = rng.uniform(40, W - 40)
        cy = rng.uniform(40, H - 40)
        base = len(verts)
        verts += [
            [cx - 35, cy - 30, 2.0],
            [cx + 35, cy - 25, 2.0],
            [cx, cy + 38, 2.0],
        ]
        tris.append([base, base + 2, base + 1])
    cam = Camera.create(position=(0, 0, 0), aspect=W / H)
    v = jnp.asarray(np.asarray(verts, np.float32))
    # Orthographic-ish: place directly in pixel space via a crafted clip.
    # Distinct per-triangle depths: exact z ties between overlapping
    # triangles would tie-break on fp32 noise that legitimately differs
    # between the two rasterizers' z formulations.
    px = v[:, 0] / W * 2.0 - 1.0
    py = 1.0 - v[:, 1] / H * 2.0
    zs = jnp.repeat(0.3 + 0.02 * jnp.arange(len(verts) // 3), 3)
    clip = jnp.stack([px, py, zs.astype(jnp.float32), jnp.ones_like(px)], -1)
    t = jnp.asarray(tris, jnp.int32)
    a = raster.rasterize(clip, t, width=W, height=H, cull_backface=False)
    b = rasterize_binned(clip, t, width=W, height=H, cull_backface=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Force the big block to hold only 2 triangles: the rest spill to jumbo.
    c = rasterize_binned(
        clip, t, width=W, height=H, cull_backface=False, interpret=True, big_cap=2
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert (np.asarray(a) >= 0).sum() > 500  # scene actually covers pixels
