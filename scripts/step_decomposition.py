"""Single-chip step-time decomposition for the bench config (VERDICT r1 #2).

Times, on the real chip, the pieces of the sparse-Adam DCN-v2 step:
  * full train step (scatter-patch path vs rows-injection path)
  * forward+backward only (no table update)
  * dedup (sort + segment-sum) alone at the step's id volume
  * sparse-adam update alone (given pre-deduped rows)
plus scatter-flag variants, at b16384 and b32768. Prints a table + an
HBM-roofline estimate for the sparse-update traffic.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/step_decomposition.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_DENSE, N_SPARSE, VOCAB, EMB = 13, 26, 100_000, 16
HBM_GBPS = 819  # v5e HBM bandwidth (public spec ~819 GB/s)


def timeit(fn, *args, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def make_batch(rng, batch):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=batch).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=batch).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=batch).astype(np.int32)
    return b


def build(batch_size, inject: bool):
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
    trainer.rows_injection = inject
    trainer.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
                    matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size)
    trainer.init_state(batch, seed=0)
    return trainer, batch


def main():
    from pytorchrec_tpu.ops.sparse_update import dedup_row_grads, sparse_lazy_adam

    print(f"devices: {jax.devices()}")
    for B in (16384, 32768):
        n = B * N_SPARSE
        rng = np.random.default_rng(1)
        ids = jnp.asarray(
            np.concatenate([rng.integers(0, VOCAB, size=B) + i * VOCAB
                            for i in range(N_SPARSE)]).astype(np.int32))
        dvec = jnp.asarray(rng.normal(size=(n, EMB)).astype(np.float32))
        V = VOCAB * N_SPARSE
        table = jnp.zeros((V, EMB), jnp.float32)
        m = jnp.zeros_like(table)
        v = jnp.zeros_like(table)
        step = jnp.ones((), jnp.int32)

        t_dedup = timeit(jax.jit(dedup_row_grads), ids, dvec)
        t_update = timeit(
            jax.jit(lambda t_, m_, v_, i_, d_: sparse_lazy_adam(
                t_, m_, v_, i_, d_, step, lr=1e-3)),
            table, m, v, ids, dvec)

        # roofline: touched-row traffic of the update (reads+writes of
        # table/m/v rows + the [n, E] grad stream + sort keys)
        touched = min(n, V)
        bytes_update = (6 * touched * EMB * 4    # r+w of table/m/v rows
                        + 2 * n * EMB * 4        # read dvec (sort r+w once)
                        + 4 * n * 4 * 3)         # id sort traffic (rough)
        roofline_ms = bytes_update / (HBM_GBPS * 1e9) * 1e3

        row = {"batch": B, "ids": n, "dedup_ms": round(t_dedup, 3),
               "update_ms": round(t_update, 3),
               "update_roofline_ms": round(roofline_ms, 3),
               "update_roofline_pct": round(100 * roofline_ms / t_update, 1)}

        for inject in (False, True):
            trainer, batch = build(B, inject)
            t_step = timeit(lambda b: trainer._train_step(b), batch,
                            warmup=5, iters=10)
            # throughput
            row[f"step_ms[{'inject' if inject else 'patch'}]"] = round(t_step, 3)
            row[f"ex/s[{'inject' if inject else 'patch'}]"] = int(B / t_step * 1e3)
            del trainer
        print(row)


if __name__ == "__main__":
    main()
