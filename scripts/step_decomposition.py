"""Single-chip step-time decomposition for the bench config (VERDICT r1 #2).

Instrument: FETCH-FORCED SLOPE timing. Through the axon tunnel,
``jax.block_until_ready`` can return before device execution finishes
(measured 2026-08-17: an 852k-row scatter chain "completed" at 10x the HBM
roofline; fetch-forced timing of the same chain was ~90x slower), so both the
old pipelined-dispatch instrument and bench.py's pre-correction windows
measured the ENQUEUE rate. The only airtight completion signal is fetching a
scalar that data-depends on the whole chain. Each probe here chains K
dispatches through a donated carry, fetches a dependent scalar, and reports
the SLOPE between two K values (fixed RPC/fetch costs cancel).

Also: never close over device arrays in probe jits — XLA constant-folds
them (an earlier probe's argsort vanished from the compiled HLO because its
ids were a closure constant). Probe inputs are passed as arguments.

Measured cost model on the v5e (2026-08-17, b32768 -> n = 852k ids over a
[2.6M, 16] f32 unified table):
  matmul 187 TFLOP/s, streaming HBM 1570 GB/s (chip healthy), BUT
  row-granular ops are latency-bound: gather ~29 ns/row, scatter ~107
  ns/row, so the sparse step is dominated by its per-row passes:
  fwd gather + grad-permute + moment gathers + 3 scatters ~= 363 of 415 ms.
  argsort of 852k keys is ~1 ms — the sort was never the bottleneck.

Probes at b16384 / b32768 of the DCN-v2 Criteo bench config:
  * gather      — rows = table[ids] (per-occurrence forward read)
  * permute     — rows[order] (the dedup sort's row permutation)
  * argsort     — sort keys alone
  * scatter     — one sorted-unique row scatter-add
  * update      — full sparse lazy-Adam row update
  * step        — full production train step (trainer-built, device batch)
plus HBM rooflines.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/step_decomposition.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_DENSE, N_SPARSE, VOCAB, EMB = 13, 26, 100_000, 16
HBM_GBPS = 1570  # measured streaming rate on this v5e (chip_health probe)
KS = (4, 16)     # slope window sizes (chained dispatches)
REPS = 2


def slope_time(dispatch, fetch, ks=KS, reps=REPS):
    """``dispatch()`` enqueues one chained step; ``fetch() -> float`` forces
    completion of the whole chain. Returns per-step ms via two-point slope
    (fixed costs cancel)."""
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
    return (times[k1] - times[k0]) / (k1 - k0) * 1e3


def make_host_batch(rng, batch):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=batch).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=batch).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=batch).astype(np.int32)
    return b


def build(batch_size):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True)
    trainer = SparseEmbeddingTrainer(model)
    trainer.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
                    matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batch = make_host_batch(rng, batch_size)
    trainer.init_state(batch, seed=0)
    return trainer, batch


def main():
    from pytorchrec_tpu.ops.sparse_update import sparse_lazy_adam

    print(f"devices: {jax.devices()}", flush=True)
    V = VOCAB * N_SPARSE
    for B in (16384, 32768):
        n = B * N_SPARSE
        rng = np.random.default_rng(1)
        ids = jnp.asarray(
            np.concatenate([rng.integers(0, VOCAB, size=B) + i * VOCAB
                            for i in range(N_SPARSE)]).astype(np.int32))
        dvec = jnp.asarray(rng.normal(size=(n, EMB)).astype(np.float32))
        uids = jnp.asarray(np.sort(np.random.default_rng(2).choice(
            V, size=min(n, V - 8), replace=False)).astype(np.int32))
        urows = jnp.asarray(rng.normal(size=(uids.shape[0], EMB)).astype(np.float32))
        row = {"batch": B, "ids": n, "unique": int(uids.shape[0])}

        # gather: per-occurrence forward read
        @partial(jax.jit, donate_argnums=0)
        def gat(carry, ids_):
            t, acc = carry
            r = jnp.take(t, ids_, axis=0, mode="clip")
            return (t, acc + r[0, 0] + r[-1, -1])

        box = {"c": gat((jnp.zeros((V, EMB), jnp.float32), jnp.float32(0)), ids)}
        float(box["c"][1])
        row["gather_ms"] = round(slope_time(
            lambda: box.update(c=gat(box["c"], ids)),
            lambda: float(box["c"][1])), 2)

        # permute: rows[order] (the dedup's row movement)
        order = jnp.argsort(ids)

        @partial(jax.jit, donate_argnums=0)
        def perm(carry, order_):
            r, acc = carry
            p = r[order_]
            return (r, acc + p[0, 0] + p[-1, -1])

        box = {"c": perm((dvec + 0, jnp.float32(0)), order)}
        float(box["c"][1])
        row["permute_ms"] = round(slope_time(
            lambda: box.update(c=perm(box["c"], order)),
            lambda: float(box["c"][1])), 2)

        # argsort alone
        @partial(jax.jit, donate_argnums=0)
        def srt(carry, keys):
            k, acc = carry
            o = jnp.argsort(keys + (acc > jnp.float32(1e30)).astype(jnp.int32))
            return (k, acc + o[0].astype(jnp.float32))

        box = {"c": srt((ids + 0, jnp.float32(0)), ids)}
        float(box["c"][1])
        row["argsort_ms"] = round(slope_time(
            lambda: box.update(c=srt(box["c"], ids)),
            lambda: float(box["c"][1])), 2)

        # one sorted-unique scatter-add
        @partial(jax.jit, donate_argnums=0)
        def sca(t, ids_, rows_):
            return t.at[ids_].add(rows_, mode="drop", indices_are_sorted=True,
                                  unique_indices=True)

        box = {"t": sca(jnp.zeros((V, EMB), jnp.float32), uids, urows)}
        float(box["t"][0, 0])
        row["scatter_ms"] = round(slope_time(
            lambda: box.update(t=sca(box["t"], uids, urows)),
            lambda: float(box["t"][0, 0])), 2)

        # full sparse lazy-Adam update
        @partial(jax.jit, donate_argnums=0)
        def upd(carry, ids_, dvec_):
            t, m, v, i = carry
            t, m, v = sparse_lazy_adam(t, m, v, ids_, dvec_, i, lr=1e-3)
            return (t, m, v, i + 1), t[0, 0] + m[1, 0] + v[2, 0]

        c = (jnp.zeros((V, EMB), jnp.float32), jnp.zeros((V, EMB), jnp.float32),
             jnp.zeros((V, EMB), jnp.float32), jnp.int32(1))
        box = {}
        box["c"], box["s"] = upd(c, ids, dvec)
        float(box["s"])

        def d_upd():
            box["c"], box["s"] = upd(box["c"], ids, dvec)

        row["update_ms"] = round(slope_time(d_upd, lambda: float(box["s"])), 2)

        # rooflines (touched-bytes / measured streaming rate)
        row["gather_roofline_ms"] = round(n * EMB * 4 * 2 / HBM_GBPS / 1e6, 3)
        row["update_roofline_ms"] = round(
            (6 * int(uids.shape[0]) * EMB * 4 + 4 * n * EMB * 4)
            / HBM_GBPS / 1e6, 3)
        print(row, flush=True)

        # full production step (trainer-built jit, device-resident batch)
        trainer, batch = build(B)
        step = jax.jit(trainer._build_train_step(), donate_argnums=0)
        batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
        sbox = {}
        sbox["state"], sbox["loss"] = step(trainer.state, batch_dev)
        float(sbox["loss"])

        def d_step():
            sbox["state"], sbox["loss"] = step(sbox["state"], batch_dev)

        step_ms = slope_time(d_step, lambda: float(sbox["loss"]))
        print({"batch": B, "step_ms": round(step_ms, 2),
               "examples_per_sec": int(B / step_ms * 1e3)}, flush=True)
        del trainer, sbox


if __name__ == "__main__":
    main()
