"""Round-4 experiment: can Mosaic do per-pixel dynamic gathers from a
VMEM-resident table — and at what speed vs XLA's latency-bound HBM gather?

Decides the architecture of the fused textured/IBL shade kernel (VERDICT
round-3 ask #1): if an in-kernel gather of ~2M rows from a small table
beats the ~8-10 ms XLA row-gather floor, the IBL specular + sky lookups
move inside the Pallas shade kernel; otherwise the fallback is a single
merged XLA gather between two fused kernels.

Run exclusively on the real chip (PERF.md methodology).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physically_based_renderer_tpu.utils.profiling import time_device_loop

P = 2048  # pixels per tile
NTILES = 1013  # ~2.07M pixels = 1080p
NPIX = P * NTILES


def t(label, fn, *args, iters=10):
    try:
        r = time_device_loop(fn, *args, iters=iters, pixels=NPIX)
        print(f"{label:55s} {r.ms_per_iter:8.2f} ms")
        return r.ms_per_iter
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{label:55s} FAILED: {type(e).__name__}: {msg}")
        return None


# ---------------------------------------------------------------- kernels


def _gather_sublane_kernel(table_ref, idx_ref, out_ref, *, n, c):
    tbl = table_ref[:]  # (N, C)
    idx = idx_ref[0]  # (P, 1)
    ib = jnp.broadcast_to(idx, (P, c))
    out_ref[0] = jnp.take_along_axis(tbl, ib, axis=0)


def _gather_take_kernel(table_ref, idx_ref, out_ref, *, n, c):
    tbl = table_ref[:]  # (N, C)
    idx = idx_ref[0]  # (P, 1)
    out_ref[0] = jnp.take(tbl, idx[:, 0], axis=0)


def _gather_lane_kernel(table_ref, idx_ref, out_ref, *, n, c):
    tbl = table_ref[:]  # (C, N) — lane-major table
    idx = idx_ref[0]  # (1, P)
    ib = jnp.broadcast_to(idx, (c, P))
    out_ref[0] = jnp.take_along_axis(tbl, ib, axis=1)


def make_pallas_gather(kernel, table, idx, out_shape):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NTILES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
            pl.BlockSpec(
                (1,) + idx.shape[1:], lambda i: (i,) + (0,) * (idx.ndim - 1),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1,) + out_shape[1:], lambda i: (0,) * out_shape.__len__().__class__ and (i,) + (0,) * (len(out_shape) - 1),
            memory_space=pltpu.VMEM,
        ),
    )
    return grid_spec


def run_pallas(kernel, table, idx_tiles, c, dtype):
    n = table.shape[0] if table.ndim == 2 and kernel is not _gather_lane_kernel else table.shape[-1]
    if kernel is _gather_lane_kernel:
        out_block = (1, c, P)
        out_shape = jax.ShapeDtypeStruct((NTILES, c, P), dtype)
    else:
        out_block = (1, P, c)
        out_shape = jax.ShapeDtypeStruct((NTILES, P, c), dtype)

    @jax.jit
    def go(tbl, idx):
        return pl.pallas_call(
            functools.partial(kernel, n=n, c=c),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(NTILES,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1,) + idx.shape[1:],
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    out_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
        )(tbl, idx)

    return go


def main():
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")

    for n in (2048, 8192, 131072):
        for c in (8, 32):
            kf, ki = jax.random.split(jax.random.fold_in(key, n * c))
            table = jax.random.normal(kf, (n, c), jnp.float32)
            idx = jax.random.randint(ki, (NTILES, P, 1), 0, n, jnp.int32)

            # --- Pallas sublane gather ---------------------------------
            go = run_pallas(_gather_sublane_kernel, table, idx, c, jnp.float32)
            t(f"pallas take_along axis0 N={n:6d} C={c}", go, table, idx)

            go = run_pallas(_gather_take_kernel, table, idx, c, jnp.float32)
            t(f"pallas take      axis0 N={n:6d} C={c}", go, table, idx)

            # --- Pallas lane gather (C, N) table -----------------------
            tableT = table.T.copy()  # (C, N)
            idxT = idx.reshape(NTILES, 1, P)
            go = run_pallas(_gather_lane_kernel, tableT, idxT, c, jnp.float32)
            t(f"pallas take_along axis1 N={n:6d} C={c}", go, tableT, idxT)

    return  # baselines measured in the first run
    for m in (8, 64):
        kf, ki = jax.random.split(jax.random.fold_in(key, m))
        table = jax.random.normal(kf, (m, 28), jnp.float32)
        idx = jax.random.randint(ki, (NPIX,), 0, m, jnp.int32)

        @jax.jit
        def fetch_gather(tbl, ix):
            return tbl[ix]

        @jax.jit
        def fetch_onehot(tbl, ix):
            oh = (ix[:, None] == jnp.arange(tbl.shape[0])[None, :]).astype(
                jnp.float32
            )
            return oh @ tbl

        t(f"XLA mat fetch gather   M={m}", fetch_gather, table, idx)
        t(f"XLA mat fetch one-hot  M={m}", fetch_onehot, table, idx)


if __name__ == "__main__":
    main()
