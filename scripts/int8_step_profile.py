"""Per-fusion device-time profile of the int8-packed bench step.

The int8-packed config is the round-4 headline (879.8k ex/s = 37.2 ms at
b32768). Its three irreducible row passes measured in isolation sum to
~21-26 ms (u8 [852k,128] gather ~8.6 + permute ~8.6 + scatter 3.7-8.6 —
RESULTS.md width rule), so unlike the f32 step (86-99%% of its floor) this
one may hold ~10 ms of non-row-pass slack. This profiles WHERE: trace one
warmed step with jax.profiler (works through the tunnel — CLAUDE.md), sum
device-op durations by fusion name, print the top bins.

Usage: python scripts/int8_step_profile.py [--config int8-packed|f32-packed]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DENSE, N_SPARSE, VOCAB, BATCH = 13, 26, 100_000, 32768


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="int8-packed",
                    choices=["int8-packed", "f32-packed"])
    args = ap.parse_args()

    import jax

    from bench import bench_tpu, make_host_batch  # noqa: F401 (path setup)
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    quantized = args.config == "int8-packed"
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=16, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  quantized_embedding=quantized, table_packed=quantized)
    cls = QuantizedEmbeddingTrainer if quantized else SparseEmbeddingTrainer
    t = cls(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    rng = np.random.default_rng(0)
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    t.init_state(b, seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    dev = {k: jax.device_put(v) for k, v in b.items()}
    for _ in range(12):  # past the tunnel ramp
        loss = t._train_step(dev)
    float(loss)

    trace_dir = tempfile.mkdtemp(prefix="int8prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            loss = t._train_step(dev)
        float(loss)

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # device-op events: sum dur by FULL op name (fusion.N stays distinct),
    # keep the long_name (HLO expression) of the heaviest for attribution
    bins = defaultdict(float)
    long_names = {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        if not name or name.startswith(("process_", "Steal", "Infeed")):
            continue
        if any(k in name for k in ("fusion", "copy", "sort", "custom-call",
                                   "convert", "scatter", "gather", "bitcast",
                                   "while", "dynamic", "reduce", "dot",
                                   "transpose", "select", "broadcast",
                                   "concatenate", "slice", "iota", "tuple")):
            bins[name] += ev["dur"]
            total += ev["dur"]
            ln = (ev.get("args") or {}).get("long_name", "")
            if ln:
                long_names[name] = ln
    steps = 3
    print(f"total attributed device time: {total/1e3/steps:.2f} ms/step "
          f"({args.config})")
    for name, dur in sorted(bins.items(), key=lambda kv: -kv[1])[:25]:
        ln = long_names.get(name, "")[:140]
        print(f"  {name:30s} {dur/1e3/steps:8.3f} ms/step  {ln}")


if __name__ == "__main__":
    main()
