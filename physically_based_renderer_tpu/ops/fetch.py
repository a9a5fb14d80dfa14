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

# Below this row count the FORWARD also goes through the one-hot MXU matmul:
# XLA's row gather is latency-bound (~6.6 ms for 2M pixels at 1080p,
# INDEPENDENT of table size — measured round 4), while the one-hot
# contraction against a tiny table is ~3.2 ms at the same pixel count. At
# Precision.HIGHEST the matmul reproduces the f32 table values exactly
# (products are 1.0·value; the bf16-split passes recover full f32), so the
# forward stays bit-identical to the gather.
_ONEHOT_FWD_MAX_ROWS = 128


def fetch_columns(table: jnp.ndarray, mid: jnp.ndarray) -> jnp.ndarray:
    """``table[mid]`` — (M, K) table, integer ids of any batch shape → (..., K).

    Exact forward (gather for big tables, exact one-hot MXU matmul for small
    ones — the common material-bank case); backward scatters cotangents into
    the table as a one-hot MXU matmul instead of an HLO scatter.
    Differentiable w.r.t. ``table``; ``mid`` is integer (no gradient).

    Out-of-range ids are clamped to [0, M) up front so the gather and
    one-hot paths agree (XLA's gather clamps; a raw one-hot would return
    zeros for out-of-range ids — semantics must not fork on table size)."""
    m, k = table.shape
    mid = jnp.clip(mid, 0, m - 1)

    def forward(t, i):
        if (
            m <= _ONEHOT_FWD_MAX_ROWS
            and i.size >= (1 << 16)
            and table.dtype == jnp.float32
        ):
            onehot = (i.reshape(-1)[:, None] == jnp.arange(m, dtype=i.dtype)).astype(
                jnp.float32
            )
            out = jax.lax.dot_general(
                onehot,
                t,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return out.reshape(*i.shape, k)
        return t[i]

    @jax.custom_vjp
    def fetch(t, i):
        return forward(t, i)

    def fwd(t, i):
        return forward(t, i), i

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
