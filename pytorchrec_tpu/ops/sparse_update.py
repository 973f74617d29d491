"""Sparse-row (lazy) optimizer updates for embedding tables.

The dense-optimizer cost model on TPU: Adam over a [V, E] table reads and
writes params + both moments for every row, every step — ~6 x V x E x 4
bytes of HBM traffic even when the batch touches only B x F rows. These
kernels update ONLY the touched rows, with static shapes throughout (no
``jnp.unique`` — duplicate ids are combined with a sort + segment-sum whose
segment count is the static batch size).

Semantics = "lazy Adam" (torch ``SparseAdam``-style): moments of untouched
rows do not decay; bias correction uses the global step. ``sparse_adagrad``
is the Adagrad variant (the BASELINE.json sparse-table staple).

All functions are pure and jit-friendly; tables/moments are donated by the
caller's train step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SparseRowGrad(NamedTuple):
    """Deduplicated row gradients: ``rows[i]`` applies to ``ids[i]``;
    ``mask[i]=0`` marks padding (applies a zero update to a safe id)."""

    ids: jnp.ndarray    # [n] int32
    rows: jnp.ndarray   # [n, E]
    mask: jnp.ndarray   # [n] 0/1


def dedup_row_grads(ids: jnp.ndarray, dvec: jnp.ndarray) -> SparseRowGrad:
    """Combine duplicate ids by summing their row grads (static shapes).

    ``ids [n]``, ``dvec [n, E]`` -> SparseRowGrad with n slots; the first
    ``#unique`` slots hold summed grads, the rest are masked padding.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    sorted_dvec = dvec[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    segment = jnp.cumsum(is_start) - 1  # [n], values in [0, #unique)
    rows = jax.ops.segment_sum(sorted_dvec, segment, num_segments=n)
    # id of each segment = id at its first element; padding slots get the
    # last unique id (harmless: masked zero update)
    seg_ids = jax.ops.segment_max(sorted_ids, segment, num_segments=n)
    n_unique = segment[-1] + 1
    slot = jnp.arange(n)
    mask = (slot < n_unique).astype(dvec.dtype)
    safe_ids = jnp.where(slot < n_unique, seg_ids, sorted_ids[-1]).astype(jnp.int32)
    return SparseRowGrad(ids=safe_ids, rows=rows, mask=mask)


def sparse_lazy_adam(
    table: jnp.ndarray,  # [V, E]
    m: jnp.ndarray,      # [V, E]
    v: jnp.ndarray,      # [V, E]
    ids: jnp.ndarray,    # [n] (may contain duplicates)
    dvec: jnp.ndarray,   # [n, E]
    step: jnp.ndarray,   # global step (1-based for bias correction)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-sparse Adam: returns (table, m, v) with only touched rows changed."""
    g = dedup_row_grads(ids, dvec)
    mask = g.mask[:, None]

    m_rows = m[g.ids]
    v_rows = v[g.ids]
    new_m = b1 * m_rows + (1.0 - b1) * g.rows
    new_v = b2 * v_rows + (1.0 - b2) * jnp.square(g.rows)

    step = step.astype(jnp.float32)
    m_hat = new_m / (1.0 - b1 ** step)
    v_hat = new_v / (1.0 - b2 ** step)
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)

    # masked scatter: padding slots write a zero delta to a safe row.
    # mode='drop' additionally lets callers pass OUT-OF-RANGE sentinel ids
    # (the sharded trainer's exchange padding) — those updates vanish.
    table = table.at[g.ids].add(-delta * mask, mode="drop")
    m = m.at[g.ids].add((new_m - m_rows) * mask, mode="drop")
    v = v.at[g.ids].add((new_v - v_rows) * mask, mode="drop")
    return table, m, v


def sparse_adagrad(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    ids: jnp.ndarray,
    dvec: jnp.ndarray,
    lr: float,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sparse Adagrad: returns (table, accumulator)."""
    g = dedup_row_grads(ids, dvec)
    mask = g.mask[:, None]
    acc_rows = accum[g.ids]
    new_acc = acc_rows + jnp.square(g.rows)
    delta = lr * g.rows / (jnp.sqrt(new_acc) + eps)
    table = table.at[g.ids].add(-delta * mask, mode="drop")
    accum = accum.at[g.ids].add((new_acc - acc_rows) * mask, mode="drop")
    return table, accum
