"""1-D vs 2-D sparse parallelism: exchange traffic + step time comparison.

Compares ShardedSparseEmbeddingTrainer strategies on the 8-device virtual
mesh (data=4, model=2):

* exchange traffic — measured from the COMPILED HLO: bytes of every
  all-to-all / all-gather / collective-permute operand in one train step
  (what actually crosses the interconnect, not hand math);
* per-device table+moment HBM resident bytes;
* wall-clock step time (median of N steps; CPU-mesh timings are a rough
  proxy for ICI behavior — the traffic numbers are the portable result).

Usage: python scripts/sparse_2d_compare.py [--batch 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "f64": 8, "s64": 8, "u64": 8, "pred": 1}

# e.g. "f32[2,512,8]" inside an all-to-all(...) operand list
_SHAPE = re.compile(r"\b(f32|bf16|f16|f64|s8|u8|s32|u32|s64|u64|pred)\[([\d,]*)\]")


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def collective_bytes(compiled_text: str):
    """Per-device bytes RECEIVED by each collective in one step (the output
    shapes between '=' and the instruction name, e.g.
    ``%all-to-all = (s32[1,8]{1,0}, f32[1,8,16]{...}) all-to-all(...)``)."""
    out = {"all-to-all": 0, "all-gather": 0, "collective-permute": 0,
           "all-reduce": 0}
    for line in compiled_text.splitlines():
        stripped = line.strip()
        if "=" not in stripped:
            continue
        for op in out:
            m = re.search(rf"=\s*(.*?)\s{op}\(", stripped)
            if m:
                out[op] += _shape_bytes(m.group(1))
                break
    return out


def build(strategy: str, reader):
    from pytorchrec_tpu.parallel import make_mesh
    from pytorchrec_tpu.tasks import build_model
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    model = build_model("dcn", reader, emb_size=16, unified_embedding=True,
                        table_row_multiple=8)
    tr = ShardedSparseEmbeddingTrainer(model, mesh=make_mesh(data=4, model=2),
                                       strategy=strategy)
    tr.compile(optimizer="adam", lr=0.01, loss="bce", metrics=("ndcg@5",),
               user_sample_n=10)
    return tr


def table_hbm_per_device(trainer) -> int:
    total = 0
    for path in trainer._table_paths:
        for tree in (trainer.state.params, trainer.state.table_moments):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            for p, leaf in flat:
                joined = "/".join(str(getattr(k, "key", k)) for k in p)
                if path in joined and hasattr(leaf, "addressable_shards"):
                    total += leaf.addressable_shards[0].data.nbytes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    os.environ.setdefault("PYTORCHREC_TPU_WORK_DIR", "/tmp/ptrec_2d_wd")
    from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
    from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
    from pytorchrec_tpu.utils import constants as C

    name = "Synthetic-ML-2D"
    if not os.path.exists(os.path.join(C.dataset_dir(), name)):
        generate_synthetic_ml(name, n_users=2047, n_items=8191, seed=5)
    reader = SimpleDataReader(name, split_mode=SplitMode.LEAVE_K_OUT, warm_n=5,
                              leave_k=1, neg_sample_n=9,
                              train_mode=TrainMode.POINT_WISE, random_seed=2020)

    rows = []
    for strategy in ("1d", "grid"):
        tr = build(strategy, reader)
        batch = reader.get_batch("train", np.arange(args.batch))
        tr.init_state(batch, seed=3)
        step_fn = tr._train_step_fn = None  # force fresh build
        tr._train_step_fn = tr._jit_train_step(tr._build_train_step())
        device_batch = tr._put_batch(batch)
        lowered = tr._train_step_fn.lower(tr.state, device_batch)
        compiled = lowered.compile()
        coll = collective_bytes(compiled.as_text())
        hbm = table_hbm_per_device(tr)

        # timing
        state = tr.state
        state, loss = tr._train_step_fn(state, device_batch)
        jax.block_until_ready(loss)
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, loss = tr._train_step_fn(state, device_batch)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times)) * 1e3
        rows.append((strategy, coll, hbm, med))

    print(f"\nDCN-v2 unified table, batch={args.batch}, mesh data=4 x model=2, "
          f"emb=16 (8 virtual CPU devices)")
    print(f"{'strategy':8} {'a2a MB':>9} {'allgather MB':>13} "
          f"{'allreduce MB':>13} {'table HBM/dev MB':>17} {'ms/step':>9}")
    for strategy, coll, hbm, med in rows:
        print(f"{strategy:8} {coll['all-to-all'] / 1e6:9.2f} "
              f"{coll['all-gather'] / 1e6:13.2f} "
              f"{coll['all-reduce'] / 1e6:13.2f} "
              f"{hbm / 1e6:17.2f} {med:9.2f}")


if __name__ == "__main__":
    main()
