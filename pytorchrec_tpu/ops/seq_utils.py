"""Sequence mask/position helpers.

Capability parity with reference model/utils.py:5-17, including the
deliberate quirk that position 0 is always marked valid (so a user's first
interaction, which has no history, still attends to the PAD item — the PAD
embedding acts as the "no history yet" representation).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_valid_his_index(his_ids: jnp.ndarray) -> jnp.ndarray:
    """``[B, S]`` item ids -> 0/1 validity mask with column 0 forced valid
    (reference model/utils.py:5-10)."""
    valid = (his_ids > 0).astype(jnp.int32)
    return valid.at[:, 0].set(1)


def get_position_ids(valid_ids: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
    """Reverse position ids: ``(len - arange) * valid``
    (reference model/utils.py:13-17). lengths [4,2,5] ->
    [[4,3,2,1,0],[2,1,0,0,0],[5,4,3,2,1]]."""
    batch, max_seq_len = valid_ids.shape
    position = jnp.broadcast_to(jnp.arange(max_seq_len), (batch, max_seq_len))
    return (seq_len[:, None] - position) * valid_ids.astype(jnp.int32)
