"""Attention ops: scaled dot-product, SASRec encoder block, DIN pooling.

The XLA reference implementations live here; the Pallas fused kernels in
pytorchrec_tpu/ops/kernels/ are drop-in replacements validated against these.

Semantics parity with reference model/SASRec.py:14-31 (scaled dot-product with
global max-subtraction and additive -inf masking, mask==1 meaning "masked
out") and the DIN attention-pooling shape contract from BASELINE.json.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchrec_tpu.ops.embedding import normal_init
from pytorchrec_tpu.ops.mlp import MLP


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``q [.., Lq, D]``, ``k/v [.., Lk, D]``; ``attn_mask`` nonzero = masked.

    Reproduces reference SASRec.py:14-31 exactly, including the global
    max-subtraction before masking (a stabilization quirk the reference
    applies over the whole attention tensor, not per row).
    """
    attention = jnp.einsum("...qd,...kd->...qk", q, k)
    if scale is not None:
        attention = attention * scale
    attention = attention - jnp.max(attention)
    if attn_mask is not None:
        attention = jnp.where(attn_mask.astype(bool), -jnp.inf, attention)
    attention = jax.nn.softmax(attention, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", attention, v)


class SASRecBlock(nn.Module):
    """One SASRec layer: self-attention -> W1/relu/W2 FFN -> dropout ->
    residual -> LayerNorm (reference SASRec.py:96-107)."""

    emb_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        query = nn.Dense(self.emb_size, use_bias=False, kernel_init=normal_init, name="Q")(x)
        key = nn.Dense(self.emb_size, use_bias=False, kernel_init=normal_init, name="K")(x)
        scale = self.emb_size ** -0.5
        context = scaled_dot_product_attention(query, key, key, scale=scale, attn_mask=attn_mask)
        context = nn.relu(
            nn.Dense(self.emb_size, kernel_init=normal_init, bias_init=normal_init, name="W1")(context)
        )
        x = nn.Dense(self.emb_size, kernel_init=normal_init, bias_init=normal_init, name="W2")(context)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return nn.LayerNorm()(residual + x)


def sasrec_encoder(
    his_vectors: jnp.ndarray,
    valid_his: jnp.ndarray,
    his_len: jnp.ndarray,
    blocks,
    train: bool = False,
) -> jnp.ndarray:
    """Run SASRec blocks then mean-pool valid positions
    (reference SASRec.py:95-110: sum over valid steps / his_len)."""
    batch, max_his_len, _ = his_vectors.shape
    # [B, L, L] mask: 1 where the key position is invalid
    attn_mask = 1 - jnp.broadcast_to(valid_his[:, None, :], (batch, max_his_len, max_his_len))
    x = his_vectors
    for block in blocks:
        x = block(x, attn_mask, train=train)
    pooled = jnp.sum(x * valid_his[..., None].astype(x.dtype), axis=1)
    return pooled / his_len[:, None].astype(x.dtype)


class DINAttentionPool(nn.Module):
    """DIN-style attention pooling of a behavior sequence against a target item.

    No reference-model counterpart (stated per SURVEY §2.10 / BASELINE.json:
    DIN is a required config of the build). Score MLP input is the standard
    DIN concat [hist, target, hist - target, hist * target]; invalid steps are
    masked out of the softmax.

    Owns its 2-hidden-layer sigmoid score MLP + head as explicit params so
    the same weights serve the XLA composite and the fused Pallas kernel
    (ops/kernels/din_attention.py); ``use_pallas=None`` auto-selects.
    """

    hidden_units: tuple = (80, 40)
    activation: str = "sigmoid"
    use_pallas: bool = None  # None = auto (TPU only)

    @nn.compact
    def __call__(
        self,
        his_vectors: jnp.ndarray,  # [B, S, E]
        target_vector: jnp.ndarray,  # [B, E] or [B, N, E]
        valid_his: jnp.ndarray,  # [B, S]
        train: bool = False,
    ) -> jnp.ndarray:
        e = his_vectors.shape[-1]
        dims = [4 * e, *self.hidden_units, 1]
        params = []
        for i in range(len(dims) - 1):
            params.append(self.param(f"w{i}", normal_init, (dims[i], dims[i + 1])))
            params.append(self.param(f"b{i}", normal_init, (dims[i + 1],)))

        squeeze = target_vector.ndim == 2
        if squeeze:
            target_vector = target_vector[:, None, :]

        use_pallas = self.use_pallas
        if use_pallas is None:
            from pytorchrec_tpu.ops.kernels import use_pallas_default

            use_pallas = use_pallas_default()
            # auto mode engages the kernel only at train-shaped candidate
            # counts (where its fused pooling was measured to win, -14%);
            # wide eval blocks ([B, 100 cand, S] leave-1-out scoring) blow
            # the kernel's compile memory (the axon compile helper gets
            # OOM-killed at that shape — found on-chip, round 4) and have
            # no measured win. Explicit use_pallas=True is honored.
            if target_vector.shape[1] > 16:
                use_pallas = False
        if use_pallas:
            from pytorchrec_tpu.ops.kernels.din_attention import (
                din_attention_pool_pallas,
            )

            pooled = din_attention_pool_pallas(
                his_vectors, target_vector, valid_his, tuple(params),
            )
            return pooled[:, 0, :] if squeeze else pooled

        act = jax.nn.sigmoid if self.activation == "sigmoid" else jax.nn.relu
        # [B, N, S, E] pairwise features
        his = his_vectors[:, None, :, :]
        tgt = target_vector[:, :, None, :]
        his_b, tgt_b = jnp.broadcast_arrays(his, tgt)
        a = jnp.concatenate([his_b, tgt_b, his_b - tgt_b, his_b * tgt_b], axis=-1)
        for i in range(len(self.hidden_units)):
            a = act(a @ params[2 * i] + params[2 * i + 1])
        scores = (a @ params[-2] + params[-1])[..., 0]
        scores = jnp.where(valid_his[:, None, :].astype(bool), scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)  # [B, N, S]
        pooled = jnp.einsum("bns,bse->bne", weights, his_vectors)
        return pooled[:, 0, :] if squeeze else pooled


def din_attention_pool(his_vectors, target_vector, valid_his, hidden_units=(80, 40)):
    """Functional convenience wrapper used by tests."""
    module = DINAttentionPool(hidden_units=hidden_units)
    return module, (his_vectors, target_vector, valid_his)
