"""Segmented inclusive sum scan as a single-pass Pallas TPU kernel.

The packed sparse update (ops/sparse_update.py::packed_sparse_update)
combines duplicate-id row grads with a segmented Hillis-Steele scan. The
XLA twin (`_segmented_sum_scan`) runs each doubling pass as a separate
shift/where/add over the whole [n, E] array in HBM — measured ~1.9 ms per
pass at n=852k on the v5e (the shifted fusion runs far below stream rate),
plus a `lax.cond` tail whose carried operands cost another ~8 ms when it
fires. This kernel does the whole scan in ONE pass over HBM: each grid
step pulls a [R, E] block into VMEM, runs the full-depth doubling scan
in-register, and chains blocks through a [1, E] VMEM carry (TPU grid
steps execute sequentially, so the carry is exact for runs of ANY length
— no eager-depth cutoff, no cond).

Exact same semantics as the XLA twin: ``x [n, E]`` rows in segment-sorted
order, ``is_start [n]`` marking segment heads; returns per-position
running sums (each segment's LAST slot holds its total).

STATUS (measured v5e, 2026-08-18): isolated this kernel wins — 1.47 ms at
[852k, 16] vs the XLA twin's ~7.6 ms in-step attribution — but inside the
packed train step the custom-call boundary stops XLA from fusing the scan
into the adjacent permute/optimizer elementwise chain and the full step
LOSES 8.5 ms (763.3k -> 603.7k ex/s, same link window). It is therefore
AUTO-ON at E >= 64 on TPU (measured crossover; ops/sparse_update.py dispatcher)
— the expected regime for it to win end-to-end is larger E (the XLA twin's
pass cost scales with E; the fusion saving does not).

Reference analogue: duplicate-id gradient accumulation inside
``torch.nn.Embedding``'s sparse backward (reference model/FunkSVD.py:40-41
relies on it); the reference gets it from cuda scatter-add, we build it as
a streaming scan because TPU scatter-add serializes per row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: narrow (E < 128 lanes) blocks pad every [R, .] buffer to a
# full 128-lane tile, and the unrolled doubling passes keep O(log R) of
# them live — R=2048 with TWO doubling chains blew the 16 MB scoped-vmem
# limit (17.25M); with the single chain + min-reduction it fits.
DEFAULT_BLOCK_ROWS = 2048


def _seg_scan_kernel(x_ref, start_ref, out_ref, carry_ref):
    # masks are kept as f32 0/1 throughout — Mosaic (2026-08) rejects the
    # i1 vreg bitcasts that [R, 1] bool arithmetic lowers to
    i = pl.program_id(0)
    r = x_ref.shape[0]
    x = x_ref[:]                    # [R, E]
    started = start_ref[:]          # [R, 1] f32 0/1

    @pl.when(i == 0)
    def _init():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    # Full-depth within-block segmented scan (Hillis-Steele). `done` blocks
    # accumulation past a segment head; the shifted-in top rows contribute
    # zeros, so the block start acts as a boundary — the cross-block part
    # is restored below via the carry.
    done = started
    d = 1
    while d < r:
        zeros = jnp.zeros((d, x.shape[1]), x.dtype)
        x = x + (1.0 - done) * jnp.concatenate([zeros, x[:-d]], axis=0)
        ones_head = jnp.ones((d, 1), done.dtype)
        done = jnp.maximum(done, jnp.concatenate([ones_head, done[:-d]],
                                                 axis=0))
        d *= 2

    # `reached[i]` = a segment head lies at or before row i IN THIS BLOCK;
    # rows where it stays 0 continue the previous block's segment. One
    # min-reduction instead of a second doubling chain (halves live VMEM).
    idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    first = jnp.min(jnp.where(started > 0, idx, r))
    reached = jnp.where(idx >= first, 1.0, 0.0).astype(x.dtype)

    out = x + (1.0 - reached) * carry_ref[:]  # [1,E] broadcasts over [R,E]
    out_ref[:] = out
    carry_ref[:] = out[r - 1:r, :]


def segmented_sum_scan_pallas(
    x: jnp.ndarray,
    is_start: jnp.ndarray,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas twin of ``ops.sparse_update._segmented_sum_scan``.

    ``x [n, E]`` f32 in segment-sorted order, ``is_start [n]`` bool heads.
    Exact for all segment lengths (cross-block segments ride the carry).
    """
    n, e = x.shape
    block_rows = min(block_rows, max(8, 1 << (n - 1).bit_length()))
    pad = (-n) % block_rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        # padding rows start fresh segments so they never extend a real one
        is_start = jnp.concatenate(
            [is_start, jnp.ones((pad,), is_start.dtype)])
    n_pad = x.shape[0]
    start_col = is_start.astype(jnp.float32)[:, None]  # [n_pad, 1]

    out = pl.pallas_call(
        _seg_scan_kernel,
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, e), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, e), x.dtype)],
        interpret=interpret,
    )(x, start_col)
    return out[:n]
