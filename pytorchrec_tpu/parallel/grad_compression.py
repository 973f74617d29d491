"""int8 gradient compression with error feedback for slow-axis collectives.

Dense data-parallel gradients are exchanged every step. Over ICI that
all-reduce is effectively free next to the sparse exchange; over DCN
(multi-pod / multi-host links, the reference has no counterpart — it is
single-device, task/Task.py:187-190) it becomes the dense path's bottleneck.
This module provides the classic remedy (gradient quantization + error
feedback, the recipe DCN-collective papers such as arXiv 2407.04272 build
on): each replica quantizes its local gradient to int8 with one f32 scale
per leaf, the int8 payloads ride an ``all_gather`` (1 byte/element on the
wire instead of 4), and every replica dequantizes + averages locally.
Quantization error is fed back: the residual ``g - dequant(quant(g))`` is
carried in the train state and added to the next step's gradient, so the
scheme is unbiased over time and tiny-but-persistent gradient components
are not silently dropped (they accumulate in the residual until they cross
the quantization step).

Traffic math (per device, payload P bytes): ring all-reduce f32 moves
~``2 * 4P * (D-1)/D`` ≈ 8P; int8 all_gather receives ``(D-1) * P``. The
compressed exchange wins for D <= 8 participants — exactly the DCN regime
(few pods/hosts on slow links), NOT the wide ICI axis. Callers therefore
apply it to the slow mesh axis only.

Pure functions, usable inside ``shard_map`` bodies; gradients of models are
pytrees — only float leaves with >= ``min_size`` elements are compressed,
the rest take the plain ``pmean`` path (scalars/biases are not worth a
scale each).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

# leaves smaller than this ride the plain pmean (scale overhead + two
# collectives are not worth it for biases/scalars)
DEFAULT_MIN_SIZE = 1024


def _quantize_leaf(g: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 leaf -> (int8 leaf, f32 scalar scale), absmax scaling."""
    absmax = jnp.max(jnp.abs(g))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.rint(g / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _is_compressible(leaf, min_size: int) -> bool:
    return (
        hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
        and leaf.size >= min_size
    )


def compressed_leaf_pmean(g: jnp.ndarray, r: jnp.ndarray,
                          axis_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One leaf: int8 all_gather mean over ``axis_name`` with error feedback.
    Returns ``(mean, new_residual)``. Inside ``shard_map`` only."""
    g_fb = g + r                       # error feedback
    q, scale = _quantize_leaf(g_fb)
    # [D, ...] int8 + [D] f32 on the wire
    q_all = jax.lax.all_gather(q, axis_name)
    s_all = jax.lax.all_gather(scale, axis_name)
    deq = q_all.astype(jnp.float32) * s_all.reshape(
        (-1,) + (1,) * (q_all.ndim - 1))
    mean = jnp.mean(deq, axis=0)
    new_r = g_fb - q.astype(jnp.float32) * scale  # local leftover
    return mean, new_r


def select_compressible(flat_params: dict, exclude=(),
                        *, min_size: int = DEFAULT_MIN_SIZE) -> dict:
    """Zero residuals for the leaves worth compressing: float, >= min_size
    elements, not in ``exclude`` (table shards manage their own sparse
    exchange and must not grow a dense residual twin)."""
    return {
        path: jnp.zeros_like(leaf)
        for path, leaf in flat_params.items()
        if path not in exclude and _is_compressible(leaf, min_size)
    }


def compressed_pmean_flat(flat_grads: dict, residuals: dict,
                          axis_name: str) -> Tuple[dict, dict]:
    """Mean of a flat {path: grad} dict over ``axis_name``: int8 wire format
    + error feedback for paths present in ``residuals``, plain ``pmean``
    for the rest. Returns ``(flat_means, new_residuals)``."""
    out, new_res = {}, {}
    for path, g in flat_grads.items():
        if path in residuals:
            out[path], new_res[path] = compressed_leaf_pmean(
                g, residuals[path], axis_name)
        else:
            out[path] = jax.lax.pmean(g, axis_name)
    return out, new_res


def compressed_wire_bytes(grads: Any, n_devices: int,
                          *, min_size: int = DEFAULT_MIN_SIZE) -> dict:
    """Analytic per-device traffic comparison (documentation/benchmarks):
    int8 all_gather receive bytes vs ring-all-reduce f32 bytes."""
    compressed = plain = 0
    for leaf in jax.tree_util.tree_leaves(grads):
        nbytes_f32 = leaf.size * 4
        if _is_compressible(leaf, min_size):
            compressed += leaf.size * (n_devices - 1) + 4 * (n_devices - 1)
        else:
            compressed += int(2 * nbytes_f32 * (n_devices - 1) / n_devices)
        plain += int(2 * nbytes_f32 * (n_devices - 1) / n_devices)
    return {"int8_allgather_bytes": compressed, "f32_allreduce_bytes": plain,
            "ratio": compressed / max(plain, 1)}
