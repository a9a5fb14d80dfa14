"""Round-5 experiment: locality-aware texel layout for big-table gathers.

The round-4 gather law (PERF.md): beyond ~tens of MB, row-gather cost grows
with table FOOTPRINT — random-access HBM traffic. Hypothesis: uv-coherent
screen gathers hit scattered HBM lines under row-major texel order; a 2-D
tile-major (page, tileY, tileX, y-in-tile, x-in-tile) order puts the
neighborhood of a screen tile into adjacent HBM rows, so the same gather
becomes line-local.

Measures a 1080p-shaped gather (2M rows) from a (rows, 48) f32 table under
row-major vs T×T tile-major index order, at several zoom factors (texel:
pixel scales) plus a random-index control.

    python scripts/exp_texlayout.py [pages] [size]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu.utils.profiling import time_device_loop

W, H = 1920, 1080


def screen_indices(pages, s, zoom, key):
    """Per-pixel (page, x, y) for a screen-coherent uv mapping: each 128×128
    screen block samples one page at ``zoom`` texels/pixel with a random
    pan — the shape of a real material-id + uv_transform gather."""
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    by = (yy // 128).astype(jnp.int32)
    bx = (xx // 128).astype(jnp.int32)
    blk = by * ((W + 127) // 128) + bx
    kp, ku, kv = jax.random.split(key, 3)
    nblk = int(jnp.max(blk)) + 1
    page = jax.random.randint(kp, (nblk,), 0, pages)[blk]
    panu = jax.random.uniform(ku, (nblk,), maxval=float(s))[blk]
    panv = jax.random.uniform(kv, (nblk,), maxval=float(s))[blk]
    x = (jnp.mod(xx * zoom + panu, s)).astype(jnp.int32)
    y = (jnp.mod(yy * zoom + panv, s)).astype(jnp.int32)
    return page, x, y


def main():
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rows = pages * s * s
    print(f"table ({rows}, 48) f32 = {rows * 48 * 4 / 1e6:.0f} MB", flush=True)
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, 48), jnp.float32)

    def bench(label, idx):
        def f(t, i):
            return t[i].sum(axis=-1)

        r = time_device_loop(
            f, table, idx, iters=10,
            perturb=lambda a, c: (a[0], a[1] + (c * 0.0).astype(jnp.int32)),
        )
        print(f"{label:40s} {r.ms_per_iter:8.2f} ms", flush=True)

    key = jax.random.PRNGKey(1)
    # random control
    ridx = jax.random.randint(key, (H, W), 0, rows)
    bench("random", ridx)

    for zoom in (1.0, 2.0, 4.0):
        page, x, y = screen_indices(pages, s, zoom, jax.random.PRNGKey(2))
        idx_rm = (page * s + y) * s + x
        bench(f"zoom{zoom} row-major", idx_rm)
        for t in (8, 16, 32):
            nt = s // t
            idx_tl = (
                page * (s * s)
                + ((y // t) * nt + (x // t)) * (t * t)
                + (y % t) * t
                + (x % t)
            )
            bench(f"zoom{zoom} tile{t}x{t}", idx_tl)


if __name__ == "__main__":
    main()
