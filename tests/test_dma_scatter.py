"""Interpret-mode parity of the conditional row-DMA scatter kernel
(ops/kernels/dma_scatter.py) against the XLA scatter it mirrors
(sparse_update.py:377 call-site semantics: drop mode, unique survivors,
safe_ids routing non-last slots out of range)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.ops.kernels.dma_scatter import dma_scatter_set


def _safe_ids(rng, v, n):
    ids = np.sort(rng.integers(0, v, size=n)).astype(np.int32)
    is_last = np.concatenate([ids[1:] != ids[:-1], [True]])
    return np.where(is_last, ids, v + np.arange(n)).astype(np.int32)


@pytest.mark.parametrize(
    "dtype,w", [(np.float32, 64), (np.float32, 128), (np.uint8, 128),
                (np.float32, 24)])  # 24: non-tile width still parity-exact
def test_parity_vs_xla_scatter(dtype, w):
    rng = np.random.default_rng(0)
    v, n = 512, 5000  # n not divisible by the kernel's program size -> pads
    if dtype is np.uint8:
        table = jnp.asarray(rng.integers(0, 255, size=(v, w)).astype(dtype))
        rows = jnp.asarray(rng.integers(0, 255, size=(n, w)).astype(dtype))
    else:
        table = jnp.asarray(rng.normal(size=(v, w)).astype(dtype))
        rows = jnp.asarray(rng.normal(size=(n, w)).astype(dtype))
    safe = jnp.asarray(_safe_ids(rng, v, n))
    want = np.asarray(
        table.at[safe].set(rows, mode="drop", unique_indices=True))
    got = dma_scatter_set(table, rows, safe, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_all_dropped_is_noop():
    rng = np.random.default_rng(1)
    v, n, w = 64, 100, 32
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    ids = jnp.full((n,), v, jnp.int32)
    want = np.asarray(table)  # before the call — the table arg is donated
    got = dma_scatter_set(table, rows, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
