"""End-to-end Criteo-style pipeline: raw TSV -> formatter -> streaming
shards -> sparse-embedding training -> held-out AUC.

The production path in one script: ``format_criteo`` (DLRM prep, sharded
parquet), ``StreamingBatchSource`` (interleaved shard reads, shuffle
buffer), ``SparseEmbeddingTrainer`` (row-sparse lazy Adam, unified table,
bf16 matmuls), ``Trainer.fit_steps`` (step-driven, packed transfers),
held-out evaluation with the serving fn + AUC.

    PYTORCHREC_TPU_WORK_DIR=/tmp/criteo_demo \\
        python examples/criteo_end_to_end.py --rows 500000 --steps 200

With real Criteo data, point ``--raw`` at the train.txt and skip --rows.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_raw_tsv(path: str, rows: int, seed: int = 0) -> None:
    """Criteo-format synthetic raw file with planted signal."""
    import numpy as np

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    field_effects = [rng.normal(scale=0.4, size=1000) for _ in range(26)]
    with open(path, "w") as f:
        for start in range(0, rows, 100_000):
            n = min(100_000, rows - start)
            dense = rng.integers(0, 200, size=(n, 13))
            cats = rng.integers(0, 1000, size=(n, 26))
            logits = sum(field_effects[j][cats[:, j]] for j in range(26))
            label = (rng.random(n) < 1 / (1 + np.exp(-(logits - 0.5)))).astype(int)
            lines = []
            for i in range(n):
                parts = [str(label[i])]
                parts += [str(v) if rng.random() > 0.1 else "" for v in dense[i]]
                parts += [format(int(c), "08x") if rng.random() > 0.05 else ""
                          for c in cats[i]]
                lines.append("\t".join(parts))
            f.write("\n".join(lines) + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=500_000)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--hash_bucket", type=int, default=100_000)
    parser.add_argument("--vocab_cap", type=int, default=0,
                        help="if set, run a frequency-vocab admission pass: "
                             "top-K ids per feature own slots, the tail "
                             "shares OOV buckets (tables shrink accordingly)")
    parser.add_argument("--raw", default=None, help="existing raw TSV (skips synthesis)")
    parser.add_argument("--mesh", default=None,
                        help="d,m — train on a (data, model) mesh through the "
                             "explicit sharded-embedding engine (e.g. "
                             "--cpu --mesh 4,2 with "
                             "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    parser.add_argument("--hot_mass", type=float, default=0.0,
                        help="with --vocab_cap and --mesh: replicate the "
                             "hottest rows carrying this fraction of lookup "
                             "traffic on every device; the cold tail rides "
                             "the all-to-all (strategy='hot_cold')")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pytorchrec_tpu.data.process.datasets import format_criteo
    from pytorchrec_tpu.data.streaming import StreamingBatchSource
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.metric import AUC
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
    from pytorchrec_tpu.utils import constants as C
    from pytorchrec_tpu.utils.profiling import StepTimer

    raw = args.raw or "criteo_demo/train.txt"
    raw_abs = os.path.join(C.raw_data_dir(), raw)
    if args.raw is None and not os.path.exists(raw_abs):
        print(f"synthesizing {args.rows} raw rows ...", flush=True)
        synth_raw_tsv(raw_abs, args.rows)

    # shard sizing that guarantees >= 2 shards even for small --rows
    # (shards flush at chunk granularity)
    rows_per_shard = max(args.rows // 4, 1)
    out = format_criteo("Criteo-Demo", raw, hash_bucket=args.hash_bucket,
                        rows_per_shard=rows_per_shard,
                        chunk_rows=max(rows_per_shard // 2, 1))
    shards = sorted(os.listdir(os.path.join(out, "shards")))
    assert len(shards) >= 2, shards
    train_shards = [os.path.join(out, "shards", s) for s in shards[:-1]]
    heldout_shard = os.path.join(out, "shards", shards[-1])
    print(f"{len(shards)} shards; training on {len(train_shards)}, "
          f"holding out {os.path.basename(heldout_shard)}", flush=True)

    transform = None
    if args.vocab_cap:
        from pytorchrec_tpu.data.vocab import VocabMapper, build_vocabs

        print(f"building frequency vocabs (cap {args.vocab_cap}/feature) ...",
              flush=True)
        scan = StreamingBatchSource(train_shards, batch_size=args.batch,
                                    chunk_rows=65536, shuffle_files=False,
                                    seed=0)
        vocabs = build_vocabs(scan.batches(epochs=1),
                              [f"c_{i}" for i in range(26)],
                              min_count=2, max_size=args.vocab_cap,
                              num_oov_buckets=16)
        cov = np.mean([v.coverage for v in vocabs.values()])
        rows = sum(v.size for v in vocabs.values())
        print(f"vocabs: {rows} total rows (vs {26 * args.hash_bucket} "
              f"uncapped), mean coverage {cov:.4f}", flush=True)
        transform = VocabMapper(vocabs)
        sparse = tuple(vocabs[f"c_{i}"].make_column(f"c_{i}")
                       for i in range(26))
    else:
        sparse = tuple(
            CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                          category_num=args.hash_bucket)
            for i in range(26)
        )
    dense = tuple(NumericColumn(feature_name=f"d_{i}") for i in range(13))
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)

    mesh = None
    if args.mesh:
        from pytorchrec_tpu.parallel import make_mesh

        d, m = map(int, args.mesh.split(","))
        mesh = make_mesh(data=d, model=m)
    model = DCNv2(sparse_columns=sparse, dense_columns=dense,
                  label_column=label, emb_size=16, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  table_row_multiple=(m if mesh is not None else 1))
    if mesh is not None and args.hot_mass > 0:
        # the admission pass's traffic counts size the hot set directly:
        # the unified table's slot space is the per-field spaces concatenated
        assert args.vocab_cap, "--hot_mass needs --vocab_cap (traffic counts)"
        from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

        counts = np.concatenate(
            [vocabs[f"c_{i}"].slot_counts() for i in range(26)])
        trainer = ShardedSparseEmbeddingTrainer(
            model, mesh=mesh, strategy="hot_cold",
            hot_counts={"unified": counts, "unified_lin": counts},
            hot_rows=args.hot_mass)
        print(f"hot/cold over {args.mesh} mesh: hot mass {args.hot_mass}",
              flush=True)
    elif mesh is not None:
        from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

        trainer = ShardedSparseEmbeddingTrainer(model, mesh=mesh)
    else:
        trainer = SparseEmbeddingTrainer(model)
    trainer.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
                    matmul_precision="bfloat16")

    timer = StepTimer(batch_size=args.batch)
    source = StreamingBatchSource(train_shards, batch_size=args.batch,
                                  chunk_rows=65536, seed=1,
                                  transform=transform)
    trainer.fit_steps(source.batches(epochs=None), steps=args.steps,
                      log_every=max(args.steps // 4, 1), verbose=1,
                      callbacks=[timer])
    stats = timer.stats()
    print(f"steady-state: {stats.get('examples_per_sec', 0)/1e6:.2f}M "
          f"examples/sec (p50 {stats.get('p50_s', 0)*1e3:.2f} ms/step)",
          flush=True)

    serve = trainer.make_serving_fn()
    auc = AUC()
    heldout = StreamingBatchSource([heldout_shard], batch_size=args.batch,
                                   chunk_rows=65536, shuffle_files=False, seed=2,
                                   transform=transform)
    scores, labels = [], []
    for i, batch in enumerate(heldout.batches(epochs=1)):
        scores.append(np.asarray(serve(batch)))
        labels.append(batch["label"])
        if i >= 10:
            break
    print(f"held-out AUC: {auc(np.concatenate(scores), np.concatenate(labels)):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
