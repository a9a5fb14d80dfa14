"""Probe Mosaic tpu.dynamic_gather: exact take_along_axis forms
(indices.shape == operand.shape) along lanes (axis=1) and sublanes (axis=0),
at growing widths — then throughput at 1080p-scale work."""

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


def t(label, fn, *args, iters=10, pixels=None, check=None):
    try:
        out = fn(*args)
        out.block_until_ready()
        if check is not None:
            import numpy as np

            ok = np.allclose(np.asarray(out), check)
            if not ok:
                print(f"{label:58s} WRONG RESULT")
                return None
        r = time_device_loop(fn, *args, iters=iters)
        print(f"{label:58s} {r.ms_per_iter:8.3f} ms")
        return r.ms_per_iter
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{label:58s} FAILED: {type(e).__name__}: {msg}")
        return None


def lane_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def sub_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def make(kernel, shape, dtype=jnp.float32):
    @jax.jit
    def go(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return go


def main():
    import numpy as np

    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")

    # --- correctness + support probes at small sizes ----------------------
    for (r, n), axis in [
        ((8, 128), 1),
        ((8, 128), 0),
        ((64, 128), 1),
        ((8, 512), 1),
        ((8, 2048), 1),
        ((256, 128), 0),
        ((2048, 8), 0),
        ((2048, 128), 0),
    ]:
        kf, ki = jax.random.split(jax.random.fold_in(key, r * 100000 + n))
        x = jax.random.normal(kf, (r, n), jnp.float32)
        lim = n if axis == 1 else r
        idx = jax.random.randint(ki, (r, n), 0, lim, jnp.int32)
        kern = lane_kernel if axis == 1 else sub_kernel
        go = make(kern, (r, n))
        expect = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
        t(f"probe axis={axis} shape=({r},{n})", go, x, idx, check=expect)

    # --- throughput at 1080p scale ----------------------------------------
    # lane-gather form: out[c, p] = table[c, idx[p]] with table width N.
    # Simulate: grid over 1013 tiles, each (C, P) gather from (C, N) table
    # requires N == P == 2048 (same-shape constraint) → table padded to 2048.
    P = 2048
    NT = 1013
    for c in (8, 32):
        kf, ki = jax.random.split(jax.random.fold_in(key, c))
        table = jax.random.normal(kf, (c, P), jnp.float32)
        idx = jax.random.randint(ki, (NT, c, P), 0, P, jnp.int32)

        def kern(tbl_ref, idx_ref, out_ref):
            out_ref[0] = jnp.take_along_axis(tbl_ref[:], idx_ref[0], axis=1)

        @jax.jit
        def go(tbl, ix):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((NT, c, P), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0,
                    grid=(NT,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (1, c, P), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, c, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                ),
            )(tbl, ix)

        t(f"1080p lane-gather tiles C={c} N=P=2048", go, table, idx)


if __name__ == "__main__":
    main()
