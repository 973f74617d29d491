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


def fm_interaction(field_vectors: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """FM second-order term, summed over factor dims.

    ``field_vectors [..., F, E]`` -> ``[...]`` using the classic identity
    ``0.5 * sum_e((sum_f v)^2 - sum_f v^2)`` — O(F*E) instead of O(F^2 * E),
    and a pure VPU-friendly reduction on TPU.

    ``use_pallas=True`` routes through the fused kernel
    (ops/kernels/fm.py). Default stays XLA: this op is bandwidth-bound and
    XLA's fusion already wins at typical sizes (measured on v5e —
    scripts/tpu_smoke.py); the kernel exists for composition into larger
    fused pipelines.
    """
    if use_pallas:
        from pytorchrec_tpu.ops.kernels.fm import fm_interaction_pallas

        lead = field_vectors.shape[:-2]
        flat = field_vectors.reshape(-1, *field_vectors.shape[-2:])
        return fm_interaction_pallas(flat).reshape(lead)
    sum_of_fields = jnp.sum(field_vectors, axis=-2)
    sum_of_squares = jnp.sum(jnp.square(field_vectors), axis=-2)
    return 0.5 * jnp.sum(jnp.square(sum_of_fields) - sum_of_squares, axis=-1)


def fm_interaction_vector(field_vectors: jnp.ndarray) -> jnp.ndarray:
    """Per-factor FM interaction (kept vector-valued, e.g. for DeepFM variants):
    ``[..., F, E] -> [..., E]``."""
    sum_of_fields = jnp.sum(field_vectors, axis=-2)
    sum_of_squares = jnp.sum(jnp.square(field_vectors), axis=-2)
    return 0.5 * (jnp.square(sum_of_fields) - sum_of_squares)


def dot_interaction(field_vectors: jnp.ndarray, self_interaction: bool = False) -> jnp.ndarray:
    """DLRM-style pairwise dot interaction: ``[..., F, E] -> [..., F*(F-1)/2]``.

    Computes the Gram matrix ``V V^T`` (one MXU batched matmul) and extracts
    the strictly-lower triangle — each distinct field pair's dot product as
    its own feature, the interaction the DLRM architecture feeds its top MLP
    (vs FM's scalar sum, :func:`fm_interaction`). ``self_interaction=True``
    also keeps the diagonal (``F*(F+1)/2`` outputs).

    The triangle extraction uses a static boolean mask + reshape-free
    ``where``-compress via ``jnp.take`` with precomputed flat indices —
    static shapes, XLA-friendly, no dynamic slicing.
    """
    num_fields = field_vectors.shape[-2]
    gram = jnp.einsum("...fe,...ge->...fg", field_vectors, field_vectors)
    rows, cols = jnp.tril_indices(num_fields, k=0 if self_interaction else -1)
    flat_idx = rows * num_fields + cols  # static index vector
    flat = gram.reshape(*gram.shape[:-2], num_fields * num_fields)
    return jnp.take(flat, flat_idx, axis=-1)


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
    """Stack of DCN-v2 cross layers.

    Owns stacked parameters ``ws [L, D, D]`` / ``bs [L, D]`` so the same
    weights serve both backends: the XLA layer loop and the fused Pallas
    kernel (ops/kernels/cross.py — all layers in one VMEM-resident pass).
    ``use_pallas=None`` auto-selects: kernel on TPU, XLA elsewhere.
    """

    num_layers: int
    use_pallas: bool = None  # None = auto (TPU only)

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        if self.num_layers == 0:
            return x0  # degenerate config: identity (no params)
        dim = x0.shape[-1]
        ws = self.param("ws", normal_init, (self.num_layers, dim, dim))
        bs = self.param("bs", normal_init, (self.num_layers, dim))

        use_pallas = self.use_pallas
        if use_pallas is None:
            from pytorchrec_tpu.ops.kernels import use_pallas_default

            use_pallas = use_pallas_default()
            # the fused kernel keeps ALL layer weights [L, D, D] VMEM-
            # resident; at large D that exceeds the ~128 MB window (found
            # at D=3341: 3 layers = 134 MB -> Mosaic allocation failure).
            # Auto mode falls back to the XLA loop past a safe budget;
            # explicit use_pallas=True is honored (and will fail loudly).
            weight_bytes = 4 * self.num_layers * dim * (dim + 1)
            if weight_bytes > 96 * 1024 * 1024:
                use_pallas = False

        lead = x0.shape[:-1]
        flat = x0.reshape(-1, dim)  # candidate mode [B, N, D] -> [B*N, D]
        if use_pallas:
            from pytorchrec_tpu.ops.kernels.cross import cross_network_pallas

            out = cross_network_pallas(flat, ws, bs)
        else:
            xl = flat
            for layer in range(self.num_layers):
                xl = cross_layer_v2(flat, xl, ws[layer], bs[layer])
            out = xl
        return out.reshape(*lead, dim)
