"""Pallas kernel: FM second-order interaction.

Fuses the sum/square/reduce chain of ``fm_interaction``
(pytorchrec_tpu/ops/interactions.py) into one VMEM pass per batch block —
one HBM read of the [B, F, E] field tensor, one [B] write, nothing
materialized in between. Backward is closed-form
(``dv = g * (sum_f v - v)``) and implemented as a second elementwise kernel
via custom_vjp so training never falls back to XLA re-derivation.

Layout note: per-row scalars travel as [B, 1] blocks — Mosaic rejects 1-D
blocked operands whose tile does not match the XLA layout of f32[B].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256


def _fm_fwd_kernel(v_ref, out_ref):
    v = v_ref[:]  # [Bb, F, E]
    s = jnp.sum(v, axis=1)  # [Bb, E]
    sq = jnp.sum(v * v, axis=1)  # [Bb, E]
    out_ref[:] = 0.5 * jnp.sum(s * s - sq, axis=-1, keepdims=True)  # [Bb, 1]


def _fm_bwd_kernel(v_ref, g_ref, dv_ref):
    v = v_ref[:]  # [Bb, F, E]
    g = g_ref[:]  # [Bb, 1]
    s = jnp.sum(v, axis=1, keepdims=True)  # [Bb, 1, E]
    dv_ref[:] = g[:, :, None] * (s - v)


def _pad_batch(x, block):
    b = x.shape[0]
    pad = (-b) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    return x, b


def _fm_forward(field_vectors: jnp.ndarray, block_b: int, interpret: bool) -> jnp.ndarray:
    v, b = _pad_batch(field_vectors, block_b)
    bp, f, e = v.shape
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _fm_fwd_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, f, e), lambda i: (i, 0, 0), memory_space=space),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bp, 1), field_vectors.dtype),
        interpret=interpret,
    )(v)
    return out[:b, 0]


def _fm_backward(field_vectors: jnp.ndarray, g: jnp.ndarray, block_b: int,
                 interpret: bool) -> jnp.ndarray:
    v, b = _pad_batch(field_vectors, block_b)
    gp, _ = _pad_batch(g[:, None], block_b)
    bp, f, e = v.shape
    space = pl.ANY if interpret else pltpu.VMEM
    dv = pl.pallas_call(
        _fm_bwd_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, f, e), lambda i: (i, 0, 0), memory_space=space),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=space),
        ],
        out_specs=pl.BlockSpec((block_b, f, e), lambda i: (i, 0, 0), memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bp, f, e), field_vectors.dtype),
        interpret=interpret,
    )(v, gp)
    return dv[:b]


def fm_interaction_pallas(field_vectors: jnp.ndarray, block_b: int = DEFAULT_BLOCK_B,
                          interpret: bool = False) -> jnp.ndarray:
    """[B, F, E] -> [B]. Matches ops.interactions.fm_interaction."""

    @jax.custom_vjp
    def fm(v):
        return _fm_forward(v, block_b, interpret)

    def fwd(v):
        return _fm_forward(v, block_b, interpret), v

    def bwd(v, g):
        return (_fm_backward(v, g, block_b, interpret),)

    fm.defvjp(fwd, bwd)
    return fm(field_vectors)
