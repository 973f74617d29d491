"""Feature-interaction ops: FM pairwise interaction and DCN cross layers.

No direct reference-model counterpart (the reference's NCF/SVD++ use
elementwise products; FM/DCN are required configs per BASELINE.json). These
are the XLA implementations; the fused Pallas kernels in
pytorchrec_tpu/ops/kernels/ are validated against them.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pytorchrec_tpu.ops.embedding import normal_init


def fm_interaction(field_vectors: jnp.ndarray) -> jnp.ndarray:
    """FM second-order term, summed over factor dims.

    ``field_vectors [..., F, E]`` -> ``[...]`` using the classic identity
    ``0.5 * sum_e((sum_f v)^2 - sum_f v^2)`` — O(F*E) instead of O(F^2 * E),
    and a pure VPU-friendly reduction on TPU.
    """
    sum_of_fields = jnp.sum(field_vectors, axis=-2)
    sum_of_squares = jnp.sum(jnp.square(field_vectors), axis=-2)
    return 0.5 * jnp.sum(jnp.square(sum_of_fields) - sum_of_squares, axis=-1)


def fm_interaction_vector(field_vectors: jnp.ndarray) -> jnp.ndarray:
    """Per-factor FM interaction (kept vector-valued, e.g. for DeepFM variants):
    ``[..., F, E] -> [..., E]``."""
    sum_of_fields = jnp.sum(field_vectors, axis=-2)
    sum_of_squares = jnp.sum(jnp.square(field_vectors), axis=-2)
    return 0.5 * (jnp.square(sum_of_fields) - sum_of_squares)


class CrossLayerV2(nn.Module):
    """One DCN-v2 cross layer: ``x_{l+1} = x0 * (W x_l + b) + x_l``.

    The matmul maps onto the MXU; the elementwise Hadamard with x0 fuses into
    its epilogue under XLA.
    """

    @nn.compact
    def __call__(self, x0: jnp.ndarray, xl: jnp.ndarray) -> jnp.ndarray:
        dim = x0.shape[-1]
        w = nn.Dense(dim, kernel_init=normal_init, bias_init=normal_init)
        return x0 * w(xl) + xl


def cross_layer_v2(x0: jnp.ndarray, xl: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Functional DCN-v2 cross layer for kernel validation: ``x0*(xl@w+b)+xl``."""
    return x0 * (xl @ w + b) + xl


class CrossNetworkV2(nn.Module):
    """Stack of DCN-v2 cross layers."""

    num_layers: int

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        xl = x0
        for _ in range(self.num_layers):
            xl = CrossLayerV2()(x0, xl)
        return xl
