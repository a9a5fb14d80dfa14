"""Material-bank property fetch with an MXU-friendly backward.

The shading stage reads per-pixel material properties from small (M, K)
tables (the ``cbMaterial`` analog, ``Core.hlsl:64-81``) by material id. The
forward gather from a tiny table is cheap on TPU, but its autodiff pullback
is a scatter-add of H·W cotangent rows into M slots — XLA lowers that to a
serialized HLO scatter that dominated the whole backward pass (~17 ms of a
68 ms fwd+bwd frame at 1080p, measured).

``fetch_columns`` keeps the exact gather forward and replaces the backward
with a one-hot contraction on the MXU:

    d_table = onehot(mid)^T @ g      # (M, N) · (N, K), N = #pixels

at ``Precision.HIGH`` (3-pass bf16 ≈ f32 to ~1e-6 relative) — ~2 ms instead
of ~17 ms. On CPU the matmul is exact f32, so CPU gradient goldens are
unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BWD_PRECISION = jax.lax.Precision.HIGH


def fetch_columns(table: jnp.ndarray, mid: jnp.ndarray) -> jnp.ndarray:
    """``table[mid]`` — (M, K) table, integer ids of any batch shape → (..., K).

    Exact-gather forward; backward scatters cotangents into the table as a
    one-hot MXU matmul instead of an HLO scatter. Differentiable w.r.t.
    ``table``; ``mid`` is integer (no gradient)."""
    m, k = table.shape

    @jax.custom_vjp
    def fetch(t, i):
        return t[i]

    def fwd(t, i):
        return t[i], i

    def bwd(i, g):
        gf = g.reshape(-1, k)
        onehot = (i.reshape(-1)[:, None] == jnp.arange(m, dtype=i.dtype)).astype(
            jnp.float32
        )
        dt = jax.lax.dot_general(
            onehot,
            gf,
            (((0,), (0,)), ((), ())),
            precision=_BWD_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (M, K)
        gi = np.zeros(i.shape, dtype=jax.dtypes.float0)
        return dt, gi

    fetch.defvjp(fwd, bwd)
    return fetch(table, mid)
