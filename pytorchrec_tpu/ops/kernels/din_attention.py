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


def _make_din_kernel(n_layers: int):
    """Kernel for a score MLP with ``n_layers`` hidden layers + linear head
    (params arrive flattened: w_0, b_0, ..., w_h, b_h, w_head, b_head)."""

    def kernel(his_ref, tgt_ref, mask_ref, *refs):
        *param_refs, out_ref = refs
        his = his_ref[:]      # [Bb, S, E]
        tgt = tgt_ref[:]      # [Bb, N, E]
        mask = mask_ref[:]    # [Bb, S]
        bb, s, e = his.shape
        n = tgt.shape[1]

        his_flat = his.reshape(bb * s, e)  # leading-dim collapse only
        # static unroll over the (small) candidate axis: keeps every tensor
        # 2-D / leading-dim-collapsed, which Mosaic lays out cheaply — a
        # single 4-D [Bb, N, S, 4E] reshape stalls the compiler
        for j in range(n):
            t = tgt[:, j, :]                                  # [Bb, E]
            t_rows = jnp.broadcast_to(t[:, None, :], (bb, s, e)).reshape(bb * s, e)
            a = jnp.concatenate(
                [his_flat, t_rows, his_flat - t_rows, his_flat * t_rows], axis=-1
            )  # [Bb*S, 4E]
            for layer in range(n_layers):
                w, bias = param_refs[2 * layer], param_refs[2 * layer + 1]
                a = jax.nn.sigmoid(
                    jnp.dot(a, w[:], preferred_element_type=jnp.float32) + bias[:]
                )
            w, bias = param_refs[-2], param_refs[-1]
            scores = (
                jnp.dot(a, w[:], preferred_element_type=jnp.float32) + bias[:]
            ).reshape(bb, s)
            scores = jnp.where(mask != 0, scores, -jnp.inf)
            weights = jax.nn.softmax(scores, axis=-1)          # [Bb, S]
            # batched-dot einsum is unsupported in Mosaic; mul+reduce on the VPU
            pooled = jnp.sum(weights[:, :, None] * his, axis=1)
            out_ref[:, j, :] = pooled.astype(out_ref.dtype)

    return kernel


def din_attention_pool_pallas(
    his_vectors: jnp.ndarray,     # [B, S, E]
    target_vector: jnp.ndarray,   # [B, N, E]
    valid_his: jnp.ndarray,       # [B, S] nonzero = valid
    mlp_params: Tuple[jnp.ndarray, ...],  # (w_0, b_0, ..., w_head, b_head)
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward for an arbitrary-depth sigmoid score MLP + linear head.

    Differentiable: backward recomputes through the XLA composite
    (``_din_xla``) via custom_vjp — the fused kernel is the forward/serving
    win, the backward matmuls fuse fine under XLA.
    """
    kwargs = dict(block_b=block_b, interpret=interpret)

    @jax.custom_vjp
    def pooled_fn(his, tgt, valid, params):
        return _din_forward(his, tgt, valid, params, **kwargs)

    def fwd(his, tgt, valid, params):
        return _din_forward(his, tgt, valid, params, **kwargs), (his, tgt, valid, params)

    def bwd(res, g):
        his, tgt, valid, params = res
        _, vjp = jax.vjp(lambda h, t, p: _din_xla(h, t, valid, p), his, tgt, params)
        dh, dt, dp = vjp(g)
        return dh, dt, None, dp

    pooled_fn.defvjp(fwd, bwd)
    return pooled_fn(his_vectors, target_vector, valid_his, tuple(mlp_params))


def _din_xla(his_vectors, target_vector, valid_his, params):
    """XLA composite (same math as DINAttentionPool's fallback path)."""
    n_layers = len(params) // 2 - 1
    his = his_vectors[:, None, :, :]
    tgt = target_vector[:, :, None, :]
    his_b, tgt_b = jnp.broadcast_arrays(his, tgt)
    a = jnp.concatenate([his_b, tgt_b, his_b - tgt_b, his_b * tgt_b], axis=-1)
    for i in range(n_layers):
        a = jax.nn.sigmoid(a @ params[2 * i] + params[2 * i + 1])
    scores = (a @ params[-2] + params[-1])[..., 0]
    scores = jnp.where(valid_his[:, None, :].astype(bool), scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bns,bse->bne", weights, his_vectors)


def _din_forward(
    his_vectors: jnp.ndarray,
    target_vector: jnp.ndarray,
    valid_his: jnp.ndarray,
    mlp_params: Tuple[jnp.ndarray, ...],
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    assert len(mlp_params) % 2 == 0 and len(mlp_params) >= 4, len(mlp_params)
    n_layers = len(mlp_params) // 2 - 1
    # biases 2-D for TPU layout
    flat_params = []
    for i, p in enumerate(mlp_params):
        flat_params.append(p.reshape(1, -1) if i % 2 == 1 else p)
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
        _make_din_kernel(n_layers),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s, e), lambda i: (i, 0, 0), memory_space=space),
            pl.BlockSpec((block_b, n, e), lambda i: (i, 0, 0), memory_space=space),
            pl.BlockSpec((block_b, s), lambda i: (i, 0), memory_space=space),
        ] + [full(*p.shape) for p in flat_params],
        out_specs=pl.BlockSpec((block_b, n, e), lambda i: (i, 0, 0), memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bp, n, e), his_vectors.dtype),
        interpret=interpret,
    )(his_vectors, target_vector, valid_his, *flat_params)
    return out[:b]
