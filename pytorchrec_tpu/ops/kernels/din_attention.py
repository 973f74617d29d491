"""Pallas kernel: fused DIN attention pooling.

Fuses the whole DIN scoring chain — pairwise features
``[hist, target, hist-target, hist*target]``, the score MLP, masked softmax,
and the weighted pooling — into one VMEM-resident pass per batch block. The
XLA version materializes the [B, N, S, 4E] feature tensor in HBM; here it
never leaves VMEM.

Layout: the [B*N, S, 4E] feature blocks are reshaped to 2-D [S, 4E] matmuls
per (batch, candidate) row via a flattened grid, with the tiny MLP weights
(4E x H1, H1 x H2, H2 x 1) held in VMEM for every program.

Matches ops.attention.DINAttentionPool numerics exactly (same sigmoid MLP,
same -inf masking, fp32 softmax).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 64


def _din_kernel(his_ref, tgt_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, out_ref):
    his = his_ref[:]      # [Bb, S, E]
    tgt = tgt_ref[:]      # [Bb, N, E]
    mask = mask_ref[:]    # [Bb, S]
    bb, s, e = his.shape
    n = tgt.shape[1]

    his_flat = his.reshape(bb * s, e)  # leading-dim collapse only
    # static unroll over the (small) candidate axis: keeps every tensor 2-D /
    # leading-dim-collapsed, which Mosaic lays out cheaply — a single 4-D
    # [Bb, N, S, 4E] reshape stalls the compiler
    for j in range(n):
        t = tgt[:, j, :]                                  # [Bb, E]
        t_rows = jnp.broadcast_to(t[:, None, :], (bb, s, e)).reshape(bb * s, e)
        feats = jnp.concatenate(
            [his_flat, t_rows, his_flat - t_rows, his_flat * t_rows], axis=-1
        )  # [Bb*S, 4E]
        a = jax.nn.sigmoid(
            jnp.dot(feats, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
        )
        a = jax.nn.sigmoid(
            jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
        )
        scores = (
            jnp.dot(a, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
        ).reshape(bb, s)
        scores = jnp.where(mask != 0, scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)          # [Bb, S]
        # batched-dot einsum is unsupported in Mosaic; mul+reduce on the VPU
        pooled = jnp.sum(weights[:, :, None] * his, axis=1)
        out_ref[:, j, :] = pooled.astype(out_ref.dtype)


def din_attention_pool_pallas(
    his_vectors: jnp.ndarray,     # [B, S, E]
    target_vector: jnp.ndarray,   # [B, N, E]
    valid_his: jnp.ndarray,       # [B, S] nonzero = valid
    mlp_params: Tuple[jnp.ndarray, ...],  # (w1, b1, w2, b2, w3, b3)
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward. Gradients fall back to the XLA composite via custom_vjp
    (training is dominated by embedding+MLP backward; the fused forward is
    the serving-path win)."""
    w1, b1, w2, b2, w3, b3 = mlp_params
    # biases 2-D for TPU layout
    b1, b2, b3 = (x.reshape(1, -1) for x in (b1, b2, b3))
    b, s, e = his_vectors.shape
    n = target_vector.shape[1]
    pad = (-b) % block_b
    if pad:
        his_vectors = jnp.pad(his_vectors, ((0, pad), (0, 0), (0, 0)))
        target_vector = jnp.pad(target_vector, ((0, pad), (0, 0), (0, 0)))
        # padded rows: mark step 0 valid so softmax stays finite
        valid_pad = jnp.zeros((pad, s), valid_his.dtype).at[:, 0].set(1)
        valid_his = jnp.concatenate([valid_his, valid_pad], axis=0)
    bp = his_vectors.shape[0]

    space = pl.ANY if interpret else pltpu.VMEM
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=space)
    out = pl.pallas_call(
        _din_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s, e), lambda i: (i, 0, 0), memory_space=space),
            pl.BlockSpec((block_b, n, e), lambda i: (i, 0, 0), memory_space=space),
            pl.BlockSpec((block_b, s), lambda i: (i, 0), memory_space=space),
            full(*w1.shape), full(*b1.shape),
            full(*w2.shape), full(*b2.shape),
            full(*w3.shape), full(*b3.shape),
        ],
        out_specs=pl.BlockSpec((block_b, n, e), lambda i: (i, 0, 0), memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bp, n, e), his_vectors.dtype),
        interpret=interpret,
    )(his_vectors, target_vector, valid_his, w1, b1, w2, b2, w3, b3)
    return out[:b]
