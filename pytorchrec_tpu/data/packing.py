"""Packed batch transfer: one host->device copy per dtype group.

A CTR batch is ~40 small named arrays; transferring them individually pays
per-array dispatch/transfer latency 40 times per step (brutal through remote
device links, measurable even locally). The packer concatenates all integer
columns into ONE int32 buffer and all float columns into ONE float32 buffer
(layouts recorded statically), so each step moves two arrays; the jitted
train step unpacks with static slices/reshapes — free under XLA.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

Batch = Dict[str, np.ndarray]


class _Slot(NamedTuple):
    key: str
    offset: int
    size: int
    shape: Tuple[int, ...]


class BatchPacker:
    """Built from one example batch; pack on host, unpack inside jit."""

    def __init__(self, example: Batch):
        self.int_slots: List[_Slot] = []
        self.float_slots: List[_Slot] = []
        int_off = float_off = 0
        for key in sorted(example):
            array = np.asarray(example[key])
            size = int(array.size)
            if np.issubdtype(array.dtype, np.floating):
                self.float_slots.append(_Slot(key, float_off, size, array.shape))
                float_off += size
            else:
                self.int_slots.append(_Slot(key, int_off, size, array.shape))
                int_off += size
        self.int_size = int_off
        self.float_size = float_off

    def pack(self, batch: Batch) -> Tuple[np.ndarray, np.ndarray]:
        ints = np.empty(self.int_size, dtype=np.int32)
        for slot in self.int_slots:
            ints[slot.offset : slot.offset + slot.size] = (
                np.asarray(batch[slot.key]).ravel()
            )
        floats = np.empty(self.float_size, dtype=np.float32)
        for slot in self.float_slots:
            floats[slot.offset : slot.offset + slot.size] = (
                np.asarray(batch[slot.key]).ravel()
            )
        return ints, floats

    def unpack(self, ints: jnp.ndarray, floats: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Static slices — call inside jit."""
        batch: Dict[str, jnp.ndarray] = {}
        for slot in self.int_slots:
            batch[slot.key] = jnp.reshape(
                jnp.asarray(ints)[slot.offset : slot.offset + slot.size], slot.shape
            )
        for slot in self.float_slots:
            batch[slot.key] = jnp.reshape(
                jnp.asarray(floats)[slot.offset : slot.offset + slot.size], slot.shape
            )
        return batch
