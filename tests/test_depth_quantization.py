"""Packed-key depth-quantization contract (PERF.md round 4, commit 8c1cf87).

The fused gbuf/shade kernels resolve depth with a packed int32 key
``(bitcast(z) & ~0x7F) | lane`` — the depth TEST is quantized to 128 f32
ulps (~1e-5 relative). This file pins the resulting tie semantics as a
TESTED contract instead of a PERF.md argument:

  * two surfaces separated by LESS than the quantum → the FIRST-DRAWN
    surface wins (draw order, like the reference's strict < z-test on
    equal depths), in whichever order they are drawn;
  * separation well beyond the quantum → the nearer surface wins, always;
  * the plain id-only kernel (``rasterize_binned``) keeps an EXACT f32
    depth test — sub-quantum separations still resolve to the nearer
    surface there.
"""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu.ops.raster_pallas import (
    rasterize_binned,
    rasterize_binned_gbuffer,
    rasterize_binned_shade,
)

W, H = 128, 64
ULP = np.float32(2.0**-24)  # ulp of f32 values in [0.5, 1)
QUANTUM = 128 * ULP  # the packed key masks 7 mantissa bits

# Both depths sit inside ONE quantization bucket with ≥30-ulp margins to
# its boundaries, so interpolation noise (~1-2 ulp) cannot flip buckets.
Z_NEAR_SUBQ = np.float32(0.5) + 30 * ULP
Z_FAR_SUBQ = np.float32(0.5) + 90 * ULP  # 60 ulp behind — sub-quantum
Z_FAR_SUPER = np.float32(0.5 + 1e-3)  # ~2000 ulp behind — super-quantum


def _two_quads(z_first, z_second):
    """Two full-viewport quads; the first-listed quad is tris {0, 1}."""

    def quad(z):
        return [
            [-3.0, -3.0, z, 1.0],
            [3.0, -3.0, z, 1.0],
            [3.0, 3.0, z, 1.0],
            [-3.0, 3.0, z, 1.0],
        ]

    verts = jnp.asarray(quad(z_first) + quad(z_second), jnp.float32)
    tris = jnp.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32
    )
    return verts, tris


def _ids_plain(z_first, z_second):
    verts, tris = _two_quads(z_first, z_second)
    return np.asarray(
        rasterize_binned(
            verts, tris, width=W, height=H, cull_backface=False, interpret=True
        )
    )


def _ids_gbuf(z_first, z_second):
    verts, tris = _two_quads(z_first, z_second)
    attrs = jnp.ones((8, 6), jnp.float32)
    _a, _d, tri_id, _m = rasterize_binned_gbuffer(
        verts, tris, attrs, width=W, height=H, cull_backface=False,
        interpret=True,
    )
    return np.asarray(tri_id)


def _ids_shade(z_first, z_second):
    verts, tris = _two_quads(z_first, z_second)
    vc = verts[tris]  # (T, 3, 4) corner-major
    pa = jnp.ones((4, 3, 6), jnp.float32)
    fm = jnp.zeros((4,), jnp.int32)
    mat = jnp.ones((1, 9), jnp.float32) * 0.5
    l3 = jnp.zeros((1, 3), jnp.float32)
    _rgba, tri_id, _m = rasterize_binned_shade(
        vc, pa, fm, mat, l3, l3, l3, jnp.zeros((1,)), jnp.zeros((3,)),
        jnp.zeros((3,)),
        width=W, height=H, cull_backface=False, num_materials=1,
        interpret=True,
    )
    return np.asarray(tri_id)


def test_subquantum_tie_is_first_drawn_in_quantized_kernels():
    """gbuf + fused-shade kernels: within one quantization bucket the
    first-drawn quad wins, regardless of which quad is nearer."""
    for ids_fn in (_ids_gbuf, _ids_shade):
        # near quad drawn first → first quad (ids 0/1) wins
        ids = ids_fn(Z_NEAR_SUBQ, Z_FAR_SUBQ)
        assert set(np.unique(ids)) <= {0, 1}, ids_fn.__name__
        # FAR quad drawn first → still the first quad (ids 0/1) wins:
        # the 60-ulp depth advantage is invisible to the quantized test
        ids = ids_fn(Z_FAR_SUBQ, Z_NEAR_SUBQ)
        assert set(np.unique(ids)) <= {0, 1}, ids_fn.__name__


def test_superquantum_separation_nearer_wins_everywhere():
    for ids_fn in (_ids_plain, _ids_gbuf, _ids_shade):
        # near quad first → ids 0/1 win
        ids = ids_fn(Z_NEAR_SUBQ, Z_FAR_SUPER)
        assert set(np.unique(ids)) <= {0, 1}, ids_fn.__name__
        # near quad second → ids 2/3 win
        ids = ids_fn(Z_FAR_SUPER, Z_NEAR_SUBQ)
        assert set(np.unique(ids)) >= {2, 3} and set(np.unique(ids)) <= {2, 3}, (
            ids_fn.__name__
        )


def test_plain_kernel_depth_test_is_exact():
    """The id-only kernel keeps full f32 depth precision: a 60-ulp
    separation resolves to the nearer quad in either draw order."""
    ids = _ids_plain(Z_NEAR_SUBQ, Z_FAR_SUBQ)
    assert set(np.unique(ids)) <= {0, 1}
    ids = _ids_plain(Z_FAR_SUBQ, Z_NEAR_SUBQ)
    assert set(np.unique(ids)) <= {2, 3}
