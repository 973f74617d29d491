"""Masked GRU encoder via ``lax.scan`` — the TPU answer to pack_padded_sequence.

The reference handles variable-length behavior sequences with the
sort -> ``pack_padded_sequence`` -> cuDNN GRU -> unsort idiom
(model/GRU4Rec.py:51-61, model/DQN.py:46-56). That idiom is hostile to XLA:
dynamic shapes, host-side sorting, ragged batches. Here the padded ``[B, S, E]``
sequence is scanned with a per-step validity mask — the hidden state freezes
once ``t >= length``, so the final carry equals the hidden state at each row's
last valid step, exactly what ``pack_padded_sequence`` + take-final-hidden
computes, with static shapes throughout.

Gate equations match ``torch.nn.GRU``:
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
and the init matches torch's GRU default uniform(-1/sqrt(H), 1/sqrt(H))
(the reference's normal(0,0.01) reset only touches Linear/Embedding modules,
IModel.py:61-68, so its GRUs keep the torch default).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import uniform


def _torch_gru_init(hidden_size: int):
    bound = 1.0 / (hidden_size ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MaskedGRU(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """``inputs [B, S, E]``, ``lengths [B]`` -> final hidden ``[B, H]``.

        The scan runs the full padded length; steps at ``t >= length`` keep the
        previous hidden state. One fused matmul computes all three gates.
        """
        batch, seq_len, in_features = inputs.shape
        h_size = self.hidden_size
        init = _torch_gru_init(h_size)

        w_ih = self.param("w_ih", init, (in_features, 3 * h_size))
        w_hh = self.param("w_hh", init, (h_size, 3 * h_size))
        b_ih = self.param("b_ih", init, (3 * h_size,))
        b_hh = self.param("b_hh", init, (3 * h_size,))

        # precompute input projections for the whole sequence in one MXU matmul
        x_proj = jnp.einsum("bse,eh->bsh", inputs, w_ih) + b_ih  # [B, S, 3H]

        def step(h, xs):
            x_t, t = xs
            hp = h @ w_hh + b_hh  # [B, 3H]
            xr, xz, xn = jnp.split(x_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            valid = (t < lengths)[:, None]
            h = jnp.where(valid, h_new, h)
            return h, None

        h0 = jnp.zeros((batch, h_size), dtype=inputs.dtype)
        xs = (jnp.moveaxis(x_proj, 1, 0), jnp.arange(seq_len))
        h_final, _ = jax.lax.scan(step, h0, xs)
        return h_final
