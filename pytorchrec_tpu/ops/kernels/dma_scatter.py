"""Row-granular DMA scatter-set: ``table.at[ids].set(rows, mode='drop')``.

The sparse update's final pass is ONE absolute scatter-set of each dedup
segment's last packed row (ops/sparse_update.py::packed_sparse_update —
non-last slots route out of range and drop). XLA lowers that to its row
scatter emitter, measured at 73.7 ns/row on random unique ids at W=128 f32
(scripts/dma_rowop_probe.py, v5e-1). This kernel instead issues one
HBM->HBM row DMA per surviving slot through a DEPTH-deep rolling semaphore
window — measured 26.3 ns/row on the same probe (2.8x) — and skips dropped
slots entirely (the XLA emitter pays for every slot, surviving or not).

Structure (pallas_guide.md double-buffer pattern, generalized to a
DEPTH-slot pipeline):

* ids stream HBM -> SMEM one ``(2, CHUNK)`` tile per grid step (SMEM
  cannot hold the full id vector; int32 memrefs tile at (2, 128) so
  leading-dim slices of the 3-D ``[NC, 2, CHUNK]`` view move whole tiles);
* per slot i with ``ids[i] < V``: ``make_async_copy(rows.at[i],
  table.at[ids[i]], sem[i % DEPTH])``; slot i waits for the copy DEPTH
  steps earlier (recomputing ITS skip condition from SMEM) before reusing
  the semaphore, so up to DEPTH row DMAs are in flight;
* the table is donated (``input_output_aliases``) — the pass is in-place,
  like the XLA scatter under donation.

Correctness contract (matches the packed-update call site): surviving ids
are UNIQUE (post-dedup) — concurrent row DMAs never alias. Dropped ids
must be ``>= V`` (``safe_ids`` routes them to ``V + slot``).

Parity vs the XLA scatter runs in interpret mode on CPU
(tests/test_dma_scatter.py); on-TPU enablement is decided by the
end-to-end interleaved A/B (RESULTS.md), not the isolated probe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048      # ids per SMEM refill (one (2, CHUNK) int32 tile slice)
DEPTH = 16        # in-flight row DMAs
_ROWS_PER_PROG = 2 * CHUNK


def _scatter_kernel(ids_ref, rows_ref, table_in_ref, table_out_ref,
                    ids_smem, ids_sem, row_sems, *, n_rows):
    del table_in_ref  # aliased with table_out_ref
    c = pl.program_id(0)
    v = table_out_ref.shape[0]
    base = c * _ROWS_PER_PROG
    idma = pltpu.make_async_copy(ids_ref.at[c], ids_smem, ids_sem)
    idma.start()
    idma.wait()

    def _dma(i):
        rid = ids_smem[i // CHUNK, i % CHUNK]
        # padded-tail slots (id >= v) never start/wait, but the descriptor
        # is built unconditionally — clamp the source index into range
        src = jnp.minimum(base + i, n_rows - 1)
        return rid, pltpu.make_async_copy(
            rows_ref.at[src], table_out_ref.at[rid],
            row_sems.at[i % DEPTH])

    def body(i, _):
        @pl.when(i >= DEPTH)
        def _():
            rid, dma = _dma(i - DEPTH)

            @pl.when(rid < v)
            def _():
                dma.wait()

        rid, dma = _dma(i)

        @pl.when(rid < v)
        def _():
            dma.start()

        return 0

    # the last program may cover a padded tail: padded slots carry id >= v
    # AND sit beyond n_rows, so both the start and the wait skip them
    rows = _ROWS_PER_PROG
    jax.lax.fori_loop(0, rows, body, 0)

    def drain(j, _):
        rid, dma = _dma(rows - DEPTH + j)

        @pl.when(rid < v)
        def _():
            dma.wait()

        return 0

    jax.lax.fori_loop(0, DEPTH, drain, 0)


@functools.partial(jax.jit, donate_argnums=0, static_argnames=("interpret",))
def dma_scatter_set(table: jnp.ndarray, rows: jnp.ndarray,
                    ids: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``table.at[ids].set(rows, mode='drop', unique_indices=True)`` as
    per-row DMAs; ids >= table rows drop. Surviving ids MUST be unique."""
    n, w = rows.shape
    assert table.shape[1] == w and table.dtype == rows.dtype
    pad = -n % _ROWS_PER_PROG
    # pad the ID VECTOR only (tiny); padded slots carry id >= v, so neither
    # the start nor the wait fires for them
    ids = jnp.concatenate(
        [ids.astype(jnp.int32),
         jnp.full((pad,), table.shape[0], jnp.int32)]) if pad else ids
    ids3 = ids.astype(jnp.int32).reshape(-1, 2, CHUNK)
    grid = (ids3.shape[0],)
    kernel = functools.partial(_scatter_kernel, n_rows=n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
        scratch_shapes=[pltpu.SMEM((2, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids3, rows, table)
    return out
