"""Rasterizer tests: tiled vs brute, culling, depth, interpolation."""

import numpy as np
import jax
import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, math3d, sphere_mesh
from physically_based_renderer_tpu.ops import raster

W, H = 128, 96


def _clip_of(verts_world, cam):
    return math3d.transform_points_h(jnp.asarray(verts_world, jnp.float32), cam.view_proj())


def _fullscreen_tri(z=0.5):
    # Big CW (front-facing) triangle covering the viewport at NDC depth z.
    # CW in y-up NDC: (-3,-1), (0,3), (3,-1) is CCW; reverse for CW.
    return jnp.asarray(
        [[-3.0, -1.0, z, 1.0], [3.0, -1.0, z, 1.0], [0.0, 3.0, z, 1.0]], jnp.float32
    ), jnp.asarray([[0, 2, 1]], jnp.int32)


def test_fullscreen_triangle_covers():
    clip, tris = _fullscreen_tri()
    tid = raster.rasterize(clip, tris, width=W, height=H)
    assert (np.asarray(tid) == 0).all()


def test_backface_culled():
    clip, tris = _fullscreen_tri()
    tris_ccw = tris[:, ::-1]
    tid = raster.rasterize(clip, tris_ccw, width=W, height=H)
    assert (np.asarray(tid) == raster.BACKGROUND).all()
    tid2 = raster.rasterize(clip, tris_ccw, width=W, height=H, cull_backface=False)
    assert (np.asarray(tid2) == 0).all()


def test_depth_test_front_wins():
    clip_a, _ = _fullscreen_tri(z=0.8)
    clip_b, _ = _fullscreen_tri(z=0.2)
    clip = jnp.concatenate([clip_a, clip_b])
    tris = jnp.asarray([[0, 2, 1], [3, 5, 4]], jnp.int32)
    tid = raster.rasterize(clip, tris, width=W, height=H)
    assert (np.asarray(tid) == 1).all()


def test_out_of_depth_range_rejected():
    clip, tris = _fullscreen_tri(z=1.5)
    tid = raster.rasterize(clip, tris, width=W, height=H)
    assert (np.asarray(tid) == raster.BACKGROUND).all()


def test_behind_camera_rejected():
    clip, tris = _fullscreen_tri()
    clip = clip.at[:, 3].set(-1.0)
    tid = raster.rasterize(clip, tris, width=W, height=H)
    assert (np.asarray(tid) == raster.BACKGROUND).all()


def test_tiled_equals_brute_sphere():
    mesh = sphere_mesh(1.0, 24, 12)
    cam = Camera.create(aspect=W / H)
    clip = _clip_of(mesh.positions, cam)
    a = raster.rasterize(clip, mesh.tris, width=W, height=H)
    b = raster.rasterize_brute(clip, mesh.tris, width=W, height=H)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiled_equals_brute_random_soup(rng):
    verts = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(1.0, 5.0, size=60)  # in front of camera
    tris = rng.integers(0, 60, size=(40, 3)).astype(np.int32)
    cam = Camera.create(position=(0, 0, 0), aspect=W / H)
    clip = _clip_of(verts, cam)
    a = raster.rasterize(clip, tris, width=W, height=H, cull_backface=False, tri_block=16)
    b = raster.rasterize_brute(clip, tris, width=W, height=H, cull_backface=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_barycentric_interpolation_exact():
    # Interpolating clip-space x,y over the fullscreen triangle must
    # reproduce each pixel center's NDC coordinates (perspective-correct
    # bary == screen bary for w=1).
    clip, tris = _fullscreen_tri(z=0.5)
    tid = raster.rasterize(clip, tris, width=W, height=H)
    bary_p, bary_s, depth, mask = raster.compute_barycentrics(
        clip, tris, tid, width=W, height=H
    )
    attr = clip[:, :2]  # x,y in NDC (w=1)
    out = raster.interpolate(attr, tris, tid, bary_p)
    px = (np.arange(W) + 0.5) / W * 2 - 1
    py = 1 - (np.arange(H) + 0.5) / H * 2
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.broadcast_to(px, (H, W)), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.broadcast_to(py[:, None], (H, W)), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(depth), 0.5, atol=1e-5)
    assert mask.all()


def test_perspective_correct_interpolation():
    # A quad receding in depth: perspective-correct interpolation of a
    # linear-in-world attribute must match the analytic projective value.
    near_z, far_z = 2.0, 10.0
    verts = np.asarray(
        [[-1, -1, near_z], [1, -1, near_z], [-1, 1, far_z], [1, 1, far_z]], np.float32
    )
    tris = jnp.asarray([[0, 3, 2], [0, 1, 3]], jnp.int32)
    cam = Camera.create(position=(0, 0, 0), aspect=1.0)
    clip = _clip_of(verts, cam)
    tid = raster.rasterize(clip, tris, width=64, height=64, cull_backface=False)
    bary_p, _, _, mask = raster.compute_barycentrics(clip, tris, tid, width=64, height=64)
    zattr = jnp.asarray(verts[:, 2:3])
    z_interp = raster.interpolate(zattr, tris, tid, bary_p)[..., 0]
    # Check a covered column: for pixels on the center vertical line, world z
    # satisfies projection: y_ndc = (y_world * h / z); invert analytically.
    m = np.asarray(mask)
    zi = np.asarray(z_interp)
    ys, xs = np.nonzero(m)
    h_proj = 1.0 / np.tan(cam.fov_y / 2)
    for r, c in list(zip(ys, xs))[:: max(1, len(ys) // 50)]:
        y_ndc = 1 - (r + 0.5) / 64 * 2
        # world point on the quad: y_w = lerp(-1, 1, t), z_w = lerp(near, far, t)
        # projection: y_ndc = y_w * h / z_w → solve for t
        # y_w = -1 + 2t, z_w = near + (far-near) t
        # y_ndc (near + (far-near) t) = h (-1 + 2t)
        t = (y_ndc * near_z + h_proj) / (2 * h_proj - y_ndc * (far_z - near_z))
        z_expect = near_z + (far_z - near_z) * t
        assert abs(zi[r, c] - z_expect) < 2e-2, (r, c, zi[r, c], z_expect)


def test_gradients_flow_to_vertices():
    clip_np, tris = _fullscreen_tri(z=0.5)

    def loss(clip):
        tid = raster.rasterize(clip, tris, width=32, height=32)
        bary_p, _, depth, mask = raster.compute_barycentrics(clip, tris, tid, width=32, height=32)
        return jnp.sum(jnp.where(mask, depth, 0.0))

    g = jax.grad(loss)(clip_np)
    assert np.isfinite(np.asarray(g)).all()
    # depth is constant 0.5 over the tri: dz/dz_clip sums to #pixels / w
    np.testing.assert_allclose(float(jnp.sum(g[:, 2])), 32 * 32, rtol=1e-3)
