"""Pallas kernel: fused score + bin-max candidate selection for full-corpus
retrieval (serving/retrieval.py).

The two-tower retrieval bottleneck is NOT the score matmul (~0.7 ms of MXU
for 4096 x 1M x 128 bf16) but the selection over the scores: XLA's chunked
``lax.top_k`` / ``approx_max_k`` paths first materialize each [B, chunk]
f32 score block in HBM (1 GB per 64k chunk at B=4096) and then reduce it —
measured 93-1413 ms/call end-to-end (RESULTS.md retrieval table).

This kernel fuses selection INTO the matmul epilogue so scores never leave
VMEM. Grid = (query tiles, item chunks); the item-chunk axis is sequential
("arbitrary"), and each output block is revisited for ``chunks_per_group``
consecutive chunks, acting as a VMEM accumulator:

  scores[Tb, Tc] = q_tile @ chunk.T          (MXU, f32 accumulate)
  per 128-lane slice: running max + argmax   (VPU, in VMEM)
  output block [Tb, 128] written once per group of G chunks

Each query thus keeps 128 "bin maxima" per super-chunk of G*Tc items — the
same partial-reduction family as ``lax.approx_max_k`` (Chern et al. 2022),
but with the score matrix never materialized. The caller finishes with an
EXACT ``lax.top_k`` over the [B, n_super*128] candidates (serving/
retrieval.py::make_retrieve_fn(approx="fused")). Expected recall@k for
top-k over n_bins total bins ~ 1 - (k-1)/(2*n_bins) (birthday collisions
of true top-k items in a bin) — measured at the bench shape (4096 x 1M x
128, k=100, v5e): group=16 -> 3968 bins, 29.0 ms/call, recall 0.9875
(theory 0.988); group=4 -> 60.3 ms / 0.996; group=32 -> 23.9 ms / 0.979.
Every point beats the best XLA path (approx_max_k r=0.95: 93 ms) — the
kernel alone runs in 9.4 ms (~dominated by the final top-k over the
candidates). Full table in RESULTS.md.

No reference counterpart (the reference has no retrieval family); the
capability target is the FAISS/ScaNN sidecar a torch stack bolts on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TB = 512        # query rows per tile
DEFAULT_TC = 2048       # corpus rows per chunk (scores block: Tb*Tc*4 = 4 MB)
DEFAULT_GROUP = 16      # chunks accumulated per output block (super-chunk)


PAD_SCORE = -1e30  # what a corpus-tail pad entry scores (never wins a bin)


def _bin_max_kernel(q_ref, items_ref, vals_ref, idx_ref, *, tc, group,
                    n_items, c_pad):
    """Layout discipline (all measured on the v5e, /tmp probes 2026-08-20):

    * D stays EXACTLY 128 lanes — an extra pad-flag column (D=129) breaks
      the items block's lane tiling and tripled the whole kernel (9.4 ->
      33 ms over 1M x 4096).
    * the per-chunk (max, argmax) runs over static 128-lane SLICES of the
      scores block (lane-tile aligned, no relayout); a reshape to
      [Tb, S, 128] relayouts and costs ~50%.
    * corpus-tail masking runs only in the grid steps that contain pad rows
      (``c >= c_pad``, ~1.6% of steps at the bench shape) — the clean
      branch pays nothing.
    """
    c = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:], items_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tb, Tc]

    tb = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    base = c * tc

    def compute(masked):
        cur = scores[:, :LANES]
        idx = base + lane
        if masked:
            cur = jnp.where(idx < n_items, cur, PAD_SCORE)
        for s in range(1, tc // LANES):
            sl = scores[:, s * LANES:(s + 1) * LANES]
            gidx = base + s * LANES + lane
            if masked:
                sl = jnp.where(gidx < n_items, sl, PAD_SCORE)
            upd = sl > cur
            cur = jnp.where(upd, sl, cur)
            idx = jnp.where(upd, gidx, idx)
        return cur, idx

    def write(vals, idx):
        first = (c % group) == 0

        @pl.when(first)
        def _():
            vals_ref[:] = vals
            idx_ref[:] = idx

        @pl.when(jnp.logical_not(first))
        def _():
            prev = vals_ref[:]
            upd = vals > prev
            vals_ref[:] = jnp.where(upd, vals, prev)
            idx_ref[:] = jnp.where(upd, idx, idx_ref[:])

    if c_pad is None:  # static: corpus divides the chunk grid exactly
        write(*compute(False))
    else:
        @pl.when(c < c_pad)
        def _():
            write(*compute(False))

        @pl.when(c >= c_pad)
        def _():
            write(*compute(True))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def bin_max_scores_pallas(queries: jnp.ndarray, items: jnp.ndarray,
                          tb: int = DEFAULT_TB, tc: int = DEFAULT_TC,
                          group: int = DEFAULT_GROUP,
                          interpret: bool = False):
    """Fused score + per-super-chunk bin maxima.

    ``queries [B, D]``, ``items [V, D]`` (any float dtype; the matmul runs
    in the items' dtype with f32 accumulation) ->
    ``(vals [B, n_super * 128] f32, idx [B, n_super * 128] int32)`` where
    ``n_super = ceil(V / (tc * group))``: candidate scores + corpus ids,
    128 bins per super-chunk, each bin holding the max over its stride-128
    residue class. Exact scores for the ids returned.
    """
    b, d = queries.shape
    v = items.shape[0]
    assert items.shape[1] == d, (queries.shape, items.shape)
    assert tc % LANES == 0

    bp = -(-b // tb) * tb
    if bp != b:
        queries = jnp.pad(queries, ((0, bp - b), (0, 0)))
    sup = tc * group
    vp = -(-v // sup) * sup
    queries = queries.astype(items.dtype)
    c_pad = None
    if vp != v:
        items = jnp.pad(items, ((0, vp - v), (0, 0)))
        c_pad = v // tc  # first chunk containing pad rows (masked in-kernel)
    n_super = vp // sup

    space = pl.ANY if interpret else pltpu.VMEM
    kernel = functools.partial(_bin_max_kernel, tc=tc, group=group,
                               n_items=v, c_pad=c_pad)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(bp // tb, vp // tc),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, c: (i, 0), memory_space=space),
            pl.BlockSpec((tc, d), lambda i, c: (c, 0), memory_space=space),
        ],
        out_specs=[
            pl.BlockSpec((tb, LANES), lambda i, c: (i, c // group),
                         memory_space=space),
            pl.BlockSpec((tb, LANES), lambda i, c: (i, c // group),
                         memory_space=space),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n_super * LANES), jnp.float32),
            jax.ShapeDtypeStruct((bp, n_super * LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(queries, items)
    return vals[:b], idx[:b]


def bin_max_scores_xla(queries: jnp.ndarray, items: jnp.ndarray,
                       tb: int = DEFAULT_TB, tc: int = DEFAULT_TC,
                       group: int = DEFAULT_GROUP):
    """XLA twin of ``bin_max_scores_pallas`` (parity tests; CPU path).

    Same bin structure: per super-chunk of ``tc * group`` corpus rows, bin
    ``l`` holds the max score over local ids with ``id % 128 == l``; ties
    resolve to the LOWEST id (the kernel's strict ``>`` update keeps the
    first maximum encountered in ascending id order).
    """
    b, d = queries.shape
    v = items.shape[0]
    sup = tc * group
    vp = -(-v // sup) * sup
    scores = jax.lax.dot_general(
        queries.astype(items.dtype), items,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, V]
    if vp != v:
        scores = jnp.pad(scores, ((0, 0), (0, vp - v)),
                         constant_values=PAD_SCORE)
    n_super = vp // sup
    s = scores.reshape(b, n_super, sup // LANES, LANES)
    vals = jnp.max(s, axis=2)  # [B, n_super, LANES]
    arg = jnp.argmax(s, axis=2)  # first max in ascending row order
    lane = jax.lax.broadcasted_iota(jnp.int32, arg.shape, 3 - 1)  # lane dim
    base = (jnp.arange(n_super, dtype=jnp.int32) * sup)[None, :, None]
    idx = base + arg.astype(jnp.int32) * LANES + lane
    return (vals.reshape(b, n_super * LANES),
            idx.reshape(b, n_super * LANES))
