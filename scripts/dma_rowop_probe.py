"""Measure (not project) the Pallas DMA-pipelined row-op ceiling.

VERDICT r3 #4: the single-chip roofline claim ("XLA's row emitters can't be
beaten; a DMA-pipelined Pallas gather would issue at ~100 ns/row") was a
projection. This probe MEASURES it: hand-rolled per-row DMA gather and
scatter kernels with a D-deep rolling semaphore window, timed with the
repo's fetch-forced slope instrument against XLA's own row emitters
(``table[ids]`` / ``table.at[ids].set(rows)``) at the bench shapes
(W=64 f32 rows = 256 B, [2.6M, W] table, n=256k rows).

Kernel structure (pallas_guide.md double-buffer pattern, generalized to a
D-slot pipeline):

* ids stream HBM -> SMEM in CHUNK-sized blocks (SMEM can't hold 256k ids);
* per row, one ``make_async_copy(table.at[id], out.at[row], sem[i % D])``
  HBM->HBM; slot i waits for the copy D steps earlier before reusing its
  semaphore, so up to D row DMAs are in flight;
* scatter is the reverse (rows.at[row] -> table.at[id]) with the table
  donated via input_output_aliases; probe ids are UNIQUE (the production
  scatter runs post-dedup).

Usage:
  python scripts/dma_rowop_probe.py            # on the real chip
  python scripts/dma_rowop_probe.py --interpret  # CPU correctness check
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 2_621_440          # table rows (bench: 26 fields x ~100k, rounded)
# 128 f32 columns per row (512 B): Mosaic row DMAs must move whole 128-lane
# tiles (a 64-column slice of the f32 table failed to compile on-chip), so
# the probe measures at the packed_min_width=128 row config; the per-row
# ISSUE rate is width-independent (row ops are latency-bound), which is the
# quantity the roofline projection hinged on.
W = 128
N = 262_144            # probed rows
CHUNK = 2048           # ids per SMEM refill
DEPTH = 16             # in-flight row DMAs

KS = (3, 9)
REPS = 3
WARM = 12              # tunnel ramp: first ~10 calls of a fresh program are
                       # ~15x slow (CLAUDE.md) — warm past it


def _row_dma(table_ref, out_ref, ids_smem, sems, base, i, gather=True):
    rid = ids_smem[i // CHUNK, i % CHUNK]
    if gather:
        return pltpu.make_async_copy(
            table_ref.at[rid], out_ref.at[base + i], sems.at[i % DEPTH])
    return pltpu.make_async_copy(
        out_ref.at[base + i], table_ref.at[rid], sems.at[i % DEPTH])


def _pipeline_chunk(table_ref, data_ref, ids_smem, sems, base, gather):
    def body(i, _):
        @pl.when(i >= DEPTH)
        def _():
            _row_dma(table_ref, data_ref, ids_smem, sems, base, i - DEPTH,
                     gather).wait()

        _row_dma(table_ref, data_ref, ids_smem, sems, base, i, gather).start()
        return 0

    rows = 2 * CHUNK  # one program covers a full (2, CHUNK) ids tile
    jax.lax.fori_loop(0, rows, body, 0)

    def drain(j, _):
        _row_dma(table_ref, data_ref, ids_smem, sems, base, rows - DEPTH + j,
                 gather).wait()
        return 0

    jax.lax.fori_loop(0, DEPTH, drain, 0)


def _gather_kernel(ids_ref, table_ref, out_ref, ids_smem, ids_sem, row_sems):
    # ids arrive 3-D [num_programs, 2, CHUNK]: int32 memrefs tile at
    # (2, 128), so leading-dim slices move whole tiles (mid-tile slices of
    # 1-D/2-D layouts trip Mosaic — found on-chip)
    c = pl.program_id(0)
    idma = pltpu.make_async_copy(ids_ref.at[c], ids_smem, ids_sem)
    idma.start()
    idma.wait()
    _pipeline_chunk(table_ref, out_ref, ids_smem, row_sems, c * 2 * CHUNK,
                    gather=True)


def _scatter_kernel(ids_ref, rows_ref, table_in_ref, table_out_ref,
                    ids_smem, ids_sem, row_sems):
    del table_in_ref  # aliased with table_out_ref
    c = pl.program_id(0)
    idma = pltpu.make_async_copy(ids_ref.at[c], ids_smem, ids_sem)
    idma.start()
    idma.wait()
    _pipeline_chunk(table_out_ref, rows_ref, ids_smem, row_sems,
                    c * 2 * CHUNK, gather=False)


def build_gather(interpret=False):
    grid = (N // (2 * CHUNK),)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def build_scatter(interpret=False):
    grid = (N // (2 * CHUNK),)
    return pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((V, W), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[pltpu.SMEM((2, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def slope_time(dispatch, fetch, ks=KS, reps=REPS):
    times = {}
    for k in ks:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k):
                dispatch()
            fetch()
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0) * 1e3  # ms per dispatch


def correctness(interpret=True):
    """Tiny-shape check of both kernels (CPU interpret or on-chip)."""
    global V, N, CHUNK, DEPTH
    V0, N0, C0, D0 = V, N, CHUNK, DEPTH
    # CHUNK >= 256: Mosaic tiles 1-D int32 memrefs at (256,) and the ids
    # slice must align to it (found on-chip)
    V, N, CHUNK, DEPTH = 1024, 512, 256, 4
    try:
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(V, W)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, V, size=N).astype(np.int32))
        out = build_gather(interpret)(ids.reshape(-1, 2, CHUNK), table)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))

        uids = jnp.asarray(
            rng.permutation(V)[:N].astype(np.int32))  # unique for scatter
        rows = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
        t2 = build_scatter(interpret)(uids.reshape(-1, 2, CHUNK), rows, table)
        np.testing.assert_array_equal(np.asarray(t2),
                                      np.asarray(table.at[uids].set(rows)))
        print("correctness OK (gather + scatter)")
    finally:
        V, N, CHUNK, DEPTH = V0, N0, C0, D0


def production_scatter_ab():
    """The REAL scatter pass A/B: sorted safe_ids (unique survivors +
    out-of-range drop slots, exactly packed_sparse_update's layout) over
    n=852k slots at the bench configs — f32 W=64 (f32-packed production
    rows), f32 W=128, u8 W=128 (int8-packed byte rows) — XLA's
    ``at[].set(drop)`` vs ops/kernels/dma_scatter.py's conditional row
    DMAs. The random-unique probe above is the isolated ceiling; THIS is
    the number that decides enablement."""
    from pytorchrec_tpu.ops.kernels.dma_scatter import dma_scatter_set

    rng = np.random.default_rng(0)
    n = 851_968  # 26 fields x b32768
    raw = np.sort(rng.integers(0, V, size=n)).astype(np.int32)
    is_last = np.concatenate([raw[1:] != raw[:-1], [True]])
    safe = np.where(is_last, raw, V + np.arange(n)).astype(np.int32)
    n_live = int(is_last.sum())
    print(f"\nproduction scatter pass: n={n} slots, {n_live} survivors")

    for w, dt in ((64, np.float32), (128, np.float32), (128, np.uint8)):
        if dt is np.uint8:
            table0 = rng.integers(0, 255, size=(V, w)).astype(dt)
            rows = jax.device_put(
                rng.integers(0, 255, size=(n, w)).astype(dt))
        else:
            table0 = rng.normal(size=(V, w)).astype(dt)
            rows = jax.device_put(rng.normal(size=(n, w)).astype(dt))
        ids = jax.device_put(safe)

        # EXACT production semantics (sparse_update.py:377 + the trainer's
        # layout pinning, sparse_trainer.py::_jit_train_step): unique-only
        # flags (safe_ids is NOT monotone — drop slots jump to V+slot) and
        # row-major layouts pinned on BOTH ends. Without the pin XLA
        # layout-assigns the W=64 donated table {1,0} (column-major) and the
        # scatter writes strided — measured 177 ns/slot vs 16 pinned.
        from jax.experimental.layout import Format, Layout
        sh = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        fmt2 = Format(Layout((0, 1)), sh)
        fmt1 = Format(Layout((0,)), sh)
        xla = jax.jit(
            lambda t, i, r: t.at[i].set(r, mode="drop", unique_indices=True),
            donate_argnums=0, in_shardings=(fmt2, fmt1, fmt2),
            out_shardings=fmt2)
        pal = jax.jit(lambda t, i, r: dma_scatter_set(t, r, i),
                      donate_argnums=0, in_shardings=(fmt2, fmt1, fmt2),
                      out_shardings=fmt2)

        for name, fn in (("xla", xla), ("pallas_dma", pal)):
            try:
                t = jax.device_put(table0)
                for _ in range(WARM):
                    t = fn(t, ids, rows)
                float(jnp.sum(t[0].astype(jnp.float32)))
            except Exception as e:  # Mosaic layout refusals surface here
                print(f"  {dt.__name__} W={w} {name:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}")
                continue
            state = {"t": t}

            def dispatch():
                state["t"] = fn(state["t"], ids, rows)

            def fetch():
                return float(jnp.sum(state["t"][0].astype(jnp.float32)))

            ms = slope_time(dispatch, fetch)
            print(f"  {dt.__name__} W={w} {name:10s} {ms:8.3f} ms  "
                  f"({ms * 1e6 / n:5.1f} ns/slot, "
                  f"{ms * 1e6 / n_live:5.1f} ns/survivor)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode correctness only")
    ap.add_argument("--production", action="store_true",
                    help="only the production-shaped scatter A/B")
    args = ap.parse_args()

    if args.production:
        production_scatter_ab()
        return

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        correctness(interpret=True)
        return

    correctness(interpret=False)  # on-chip, tiny shapes

    rng = np.random.default_rng(0)
    table = jax.device_put(rng.normal(size=(V, W)).astype(np.float32))
    ids = jax.device_put(rng.integers(0, V, size=N).astype(np.int32))
    uids = jax.device_put(
        rng.permutation(V)[:N].astype(np.int32))
    rows = jax.device_put(rng.normal(size=(N, W)).astype(np.float32))

    # ---- gather ----
    gather_pallas = jax.jit(
        lambda t, i: jnp.sum(build_gather()(i.reshape(-1, 2, CHUNK), t)))
    gather_xla = jax.jit(lambda t, i: jnp.sum(t[i]))

    results = {}
    for name, fn in [("pallas_dma_gather", gather_pallas),
                     ("xla_gather", gather_xla)]:
        out = None
        for _ in range(WARM):
            out = fn(table, ids)
        float(out)
        acc = []

        def dispatch():
            acc.append(fn(table, ids))

        def fetch():
            return float(acc[-1])

        ms = slope_time(dispatch, fetch)
        results[name] = ms
        print(f"{name}: {ms:.3f} ms  ({ms * 1e6 / N:.1f} ns/row)")

    # ---- scatter (state-chained on the donated table) ----
    scat_pallas = jax.jit(
        lambda t, i, r: build_scatter()(i.reshape(-1, 2, CHUNK), r, t),
        donate_argnums=0)
    scat_xla = jax.jit(
        lambda t, i, r: t.at[i].set(r, mode="drop", unique_indices=True,
                                    indices_are_sorted=False),
        donate_argnums=0)

    for name, fn in [("pallas_dma_scatter", scat_pallas),
                     ("xla_scatter_set", scat_xla)]:
        t = jax.device_put(rng.normal(size=(V, W)).astype(np.float32))
        for _ in range(WARM):
            t = fn(t, uids, rows)
        float(jnp.sum(t[0]))
        state = {"t": t}

        def dispatch():
            state["t"] = fn(state["t"], uids, rows)

        def fetch():
            return float(jnp.sum(state["t"][0]))

        ms = slope_time(dispatch, fetch)
        results[name] = ms
        print(f"{name}: {ms:.3f} ms  ({ms * 1e6 / N:.1f} ns/row)")

    print("\nsummary (ms / ns-per-row):")
    for k, v in results.items():
        print(f"  {k:22s} {v:8.3f} ms   {v * 1e6 / N:7.1f} ns/row")


if __name__ == "__main__":
    main()
