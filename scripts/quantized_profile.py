"""On-chip profile of the int8 packed quantized train step (bench config).

The int8 packed path is the fastest measured training configuration
(RESULTS.md: 872k ex/s, 37.5 ms/step at b32768) but sits at ~56% of its own
3-pass row floor (int8 w=128 per 852k rows: gather ~8.6 + permute ~8.6 +
scatter ~3.7 = ~21 ms). This script attributes the gap: jax.profiler trace
over a fetch-forced step chain, aggregated per-fusion device times.

Usage: PYTHONPATH=/root/repo python scripts/quantized_profile.py [bits]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

N_DENSE, N_SPARSE, VOCAB, EMB, BATCH = 13, 26, 100_000, 16, 32768
STEPS = 10


def make_host_batch(rng):
    b = {f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return b


def build(bits: int):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  quantized_embedding=True, table_bits=bits,
                  table_packed=True)
    t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
              matmul_precision="bfloat16")
    return t


def main():
    import jax

    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = build(bits)
    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    t.init_state(batches[0], seed=0)
    t.packed_transfer = False
    t._train_step_fn = None
    batches_dev = [{k: jax.device_put(v) for k, v in b.items()}
                   for b in batches]
    for i in range(5):
        loss = t._train_step(batches_dev[i % 4])
    float(loss)

    start = time.perf_counter()
    for i in range(STEPS + 1):
        loss = t._train_step(batches_dev[i % 4])
    float(loss)
    wall = (time.perf_counter() - start) / STEPS
    print(f"int{bits} packed fetch-forced: {wall * 1e3:.1f} ms/step "
          f"({BATCH / wall / 1e3:.1f}k ex/s)")

    trace_dir = "/tmp/quant_profile"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(STEPS + 1):
            loss = t._train_step(batches_dev[i % 4])
        float(loss)

    # aggregate device-side op times from the trace
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    device_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev["args"].get("name", "")
            if "TPU" in name or "/device:" in name.lower() or "xla" in name.lower():
                device_pids.add(ev["pid"])
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        if name.startswith(("fusion", "loop_", "copy", "gather", "scatter",
                            "sort", "dynamic", "custom", "convert", "while",
                            "all_", "bitcast", "dot", "cumsum", "iota",
                            "transpose", "reduce", "select", "concatenate",
                            "broadcast", "slice", "add", "multiply", "rng")):
            by_op[name] += ev["dur"]
            total += ev["dur"]
    per_step = {k: v / (STEPS + 1) / 1e3 for k, v in by_op.items()}
    print(f"\ndevice op time/step (total {total/(STEPS+1)/1e3:.1f} ms):")
    for k, v in sorted(per_step.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:7.2f} ms  {k}")


if __name__ == "__main__":
    main()
