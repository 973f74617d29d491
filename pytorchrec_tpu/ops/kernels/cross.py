"""Pallas kernel: fused DCN-v2 cross network.

Runs all L cross layers ``x_{l+1} = x0 * (x_l @ W_l + b_l) + x_l`` in one
kernel invocation per batch block: ``x0``/``x_l`` stay resident in VMEM
across layers (the XLA version round-trips x_l through HBM between layers
when fusion breaks), the [D, D] matmuls ride the MXU with fp32 accumulation.

Backward is custom-VJP: layer inputs are recomputed in the backward pass
(L is small, recompute is cheaper than stashing L activations to HBM) with a
closed-form chain:
    u_l   = x_l @ W_l + b_l
    dW_l  = x_l^T (g ⊙ x0);  db_l = sum(g ⊙ x0);
    dx_l  = (g ⊙ x0) @ W_l^T + g;  dx0 += g ⊙ u_l
expressed in XLA (matmuls fuse fine there; the forward is the serving-path
hot loop).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256


def _cross_fwd_kernel(x0_ref, ws_ref, bs_ref, out_ref):
    x0 = x0_ref[:]  # [Bb, D]
    num_layers = ws_ref.shape[0]
    xl = x0
    for layer in range(num_layers):  # static unroll; weights stay in VMEM
        w = ws_ref[layer]  # [D, D]
        b = bs_ref[layer]  # [1, D] (kept 2-D for TPU layout)
        u = jnp.dot(xl, w, preferred_element_type=jnp.float32) + b
        xl = x0 * u + xl
    out_ref[:] = xl.astype(out_ref.dtype)


def _cross_forward(x0, ws, bs, block_b: int, interpret: bool):
    b = x0.shape[0]
    pad = (-b) % block_b
    x0p = jnp.pad(x0, ((0, pad), (0, 0))) if pad else x0
    bp, d = x0p.shape
    num_layers = ws.shape[0]
    bs2 = bs[:, None, :]  # [L, 1, D]
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _cross_fwd_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=space),
            pl.BlockSpec((num_layers, d, d), lambda i: (0, 0, 0), memory_space=space),
            pl.BlockSpec((num_layers, 1, d), lambda i: (0, 0, 0), memory_space=space),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bp, d), x0.dtype),
        interpret=interpret,
    )(x0p, ws, bs2)
    return out[:b]


def _xla_layer_inputs(x0, ws, bs):
    """Recompute the input x_l of every layer (backward helper)."""
    xs = [x0]
    xl = x0
    for layer in range(ws.shape[0]):
        xl = x0 * (xl @ ws[layer] + bs[layer]) + xl
        xs.append(xl)
    return xs


def cross_network_pallas(x0: jnp.ndarray, ws: jnp.ndarray, bs: jnp.ndarray,
                         block_b: int = DEFAULT_BLOCK_B,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused cross network: ``x0 [B, D]``, ``ws [L, D, D]``, ``bs [L, D]``."""

    @jax.custom_vjp
    def cross(x0, ws, bs):
        return _cross_forward(x0, ws, bs, block_b, interpret)

    def fwd(x0, ws, bs):
        return _cross_forward(x0, ws, bs, block_b, interpret), (x0, ws, bs)

    def bwd(res, g) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x0, ws, bs = res
        num_layers = ws.shape[0]
        xs = _xla_layer_inputs(x0, ws, bs)  # xs[l] is input to layer l
        dx0 = jnp.zeros_like(x0)  # contributions via the Hadamard x0 factor
        dws = []
        dbs = []
        dxl = g  # dL/dx_{l+1}, walked back to dL/dx_0
        for layer in reversed(range(num_layers)):
            xl = xs[layer]
            u = xl @ ws[layer] + bs[layer]
            gx0 = dxl * x0  # dL/du
            dws.append(xl.T @ gx0)
            dbs.append(jnp.sum(gx0, axis=0))
            dx0 = dx0 + dxl * u
            dxl = gx0 @ ws[layer].T + dxl
        # x_0 IS x0, so the walked-back input gradient lands on x0 as well
        dx0 = dx0 + dxl
        dws = jnp.stack(dws[::-1])
        dbs = jnp.stack(dbs[::-1])
        return dx0, dws, dbs

    cross.defvjp(fwd, bwd)
    return cross(x0, ws, bs)
