"""Single-chip step-time decomposition for the bench config (VERDICT r1 #2).

Measures DEVICE time, not wall-clock: every probe fuses K iterations into a
single dispatch via ``lax.scan`` so the tunnel's per-call RTT and the host
batch upload are amortized 1/K (through the dev tunnel a single dispatch
costs 100s of ms of link latency — per-call timing measures the link, not
the chip; CLAUDE.md "Host-pipeline perf").

Earlier versions fused with ``lax.scan`` — CAVEAT (measured on the v5e,
2026-08-17): a scanned step changes XLA's layout assignment for the carried
embedding tables (the while-loop carry gets a row-MINOR tiled layout
``{0,1:T(8,128)}`` and every row scatter serializes: ~44 ms for 426k rows
vs ~1 ms with the natural ``{1,0}`` layout a per-dispatch jit picks). The
probes therefore UNROLL the K iterations inside one jit instead — the
chain is a straight-line XLA computation whose buffers keep their natural
layouts, so the amortized per-iteration time matches the per-dispatch
donated path (bench.py) while still hiding the tunnel RTT.

Probes, at b16384 and b32768 of the DCN-v2 Criteo config:
  * full sparse-Adam train step — scatter-patch path vs rows-injection path
  * dedup (sort + segment-sum) alone at the step's id volume
  * sparse-adam row update alone (given raw ids + grads)
plus an HBM-roofline estimate for the sparse-update traffic.

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
K = 20        # fused iterations per dispatch (micro probes)
K_STEP = 8    # unrolled full train steps per dispatch (HLO size)


def timeit_fused(fused_fn, *args, k=K, reps=3):
    """fused_fn runs k iterations in ONE dispatch; returns ms per iteration."""
    out = fused_fn(*args)  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fused_fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / k * 1e3


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


def fused_train_step(trainer, batch):
    """K_STEP train steps on a device-resident batch in one jitted dispatch
    (UNROLLED chain, not lax.scan — see the layout caveat above)."""
    step = trainer._build_train_step()
    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}

    @jax.jit
    def run(state):
        loss = None
        for _ in range(K_STEP):
            state, loss = step(state, batch_dev)
        return state, loss

    return run


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

        @jax.jit
        def dedup_k(ids_, dvec_):
            acc = jnp.float32(0)
            for _ in range(K):
                # consume the result so iterations aren't DCE'd; feeding the
                # carry back into the grads chains the iterations
                g = dedup_row_grads(ids_ + (acc == jnp.inf), dvec_ + acc,
                                    pad_id_base=V)
                acc = g.rows[0, 0] + g.ids[0] * jnp.float32(1e-12)
            return acc

        @jax.jit
        def update_k(t0, m0, v0):
            t, m_, v_ = t0, m0, v0
            for i in range(K):
                t, m_, v_ = sparse_lazy_adam(t, m_, v_, ids, dvec,
                                             jnp.int32(i + 1), lr=1e-3)
            return t, m_, v_

        t_dedup = timeit_fused(dedup_k, ids, dvec)
        t_update = timeit_fused(update_k, table, m, v)

        # roofline for the full update (dedup included): sort the [n] ids +
        # [n, E] grads, then read+write table/m/v touched rows
        touched = min(n, V)
        bytes_update = (6 * touched * EMB * 4    # r+w of table/m/v rows
                        + 2 * n * EMB * 4        # grad stream r+w (sort)
                        + 4 * n * 4 * 3)         # id sort traffic (rough)
        roofline_ms = bytes_update / (HBM_GBPS * 1e9) * 1e3

        row = {"batch": B, "ids": n, "dedup_ms": round(t_dedup, 3),
               "update_ms": round(t_update, 3),
               "update_roofline_ms": round(roofline_ms, 3),
               "update_roofline_pct": round(
                   100 * roofline_ms / max(t_update, 1e-9), 1)}

        for inject in (False, True):
            trainer, batch = build(B, inject)
            run = fused_train_step(trainer, batch)
            t_step = timeit_fused(run, trainer.state, k=K_STEP)
            row[f"step_ms[{'inject' if inject else 'patch'}]"] = round(t_step, 3)
            row[f"ex/s[{'inject' if inject else 'patch'}]"] = int(B / t_step * 1e3)
            del trainer, run
        print(row, flush=True)


if __name__ == "__main__":
    main()
