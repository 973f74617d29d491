"""Quantized vs f32 exchange traffic — measured from the COMPILED HLO.

VERDICT r3 #1 "done" criterion: with quantized byte-row tables through the
explicit sharded engine, account the interconnect bytes the way
`sparse_2d_compare.py` does — sum every all-to-all / all-gather /
collective-permute operand in one compiled train step on the 8-device CPU
mesh (data=4, model=2) — for three DLRM configs over identical shapes:

* f32 packed rows (the r3 baseline format);
* int8 packed byte rows (lookup return hop ships q||scale bytes);
* int8 packed + ``qgrad_exchange`` (backward row grads ship int8+scale).

Usage: python scripts/quantized_exchange_bytes.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_2d_compare import collective_bytes  # noqa: E402  (same dir)

V, E, B = 8192, 16, 4096


def build(quantized: bool, qgrad: bool):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DLRM
    from pytorchrec_tpu.parallel import make_mesh
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    sparse = [
        CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=V)
        for i in range(4)
    ]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DLRM(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                 label_column=label, emb_size=E, bottom_layers=(32,),
                 top_layers=(32,), unified_embedding=True,
                 quantized_embedding=quantized, table_packed=quantized,
                 table_row_multiple=8)
    tr = ShardedSparseEmbeddingTrainer(
        model, mesh=make_mesh(data=4, model=2), strategy="1d",
        packed_tables=True, qgrad_exchange=qgrad)
    tr.compile(optimizer="adam", lr=0.01, loss="bce", metrics=("auc",))
    return tr


def batch(seed=0):
    r = np.random.default_rng(seed)
    b = {f"c_{i}": r.integers(0, V, size=B).astype(np.int32)
         for i in range(4)}
    b["d_0"] = r.normal(size=B).astype(np.float32)
    b["label"] = r.integers(0, 2, size=B).astype(np.int32)
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.parse_args()

    results = {}
    for name, (q, g) in {
        "f32-packed": (False, False),
        "int8-packed": (True, False),
        "int8-packed+qgrad": (True, True),
    }.items():
        tr = build(q, g)
        b = batch()
        tr.init_state(b, seed=3)
        tr._train_step_fn = tr._jit_train_step(tr._build_train_step())
        db = tr._put_batch(b)
        compiled = tr._train_step_fn.lower(tr.state, db).compile()
        coll = collective_bytes(compiled.as_text())
        total = sum(coll.values())
        results[name] = total
        parts = ", ".join(f"{k} {v/1e6:.2f}MB" for k, v in sorted(coll.items()))
        print(f"{name:18s} total {total/1e6:8.2f} MB/device/step  ({parts})",
              flush=True)
        # numerics sanity: one live step
        state, loss = tr._train_step_fn(tr.state, db)
        assert np.isfinite(float(loss)), loss

    base = results["f32-packed"]
    for name, total in results.items():
        print(f"{name:18s} {base / total:5.2f}x fewer bytes than f32"
              if total < base else f"{name:18s} baseline")


if __name__ == "__main__":
    main()
