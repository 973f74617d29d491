"""End-to-end C++ serving shim demo on the real chip (VERDICT r1 #9).

Phase 1 (child python process): trains a small DCN-v2 for a few steps on
the TPU, exports a serving bundle (pytorchrec_tpu/serving/bundle.py), and
EXITS — releasing its axon device session.
Phase 2 (C++): the Python-free shim (native/serving/pjrt_serving.cpp)
dlopens the PJRT plugin, creates its own client, compiles the StableHLO
artifact via PJRT_Client_Compile, scores the sample batch on the device,
and verifies the scores against what Python's ``make_serving_fn`` produced.

The two-phase split matters: the tunnel serializes device sessions, so the
exporter must release its claim before the shim creates one.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/serving_shim_demo.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SPARSE, N_DENSE, VOCAB, EMB, BATCH = 8, 4, 1000, 16, 1024


def export_phase(out_dir: str) -> None:
    import numpy as np

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.serving import export_serving_bundle
    from pytorchrec_tpu.training import Trainer

    import jax

    print(f"[export] devices: {jax.devices()}", flush=True)

    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=VOCAB)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=EMB, num_cross_layers=2,
                  layers=(64, 32))
    trainer = Trainer(model)
    trainer.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",))

    rng = np.random.default_rng(0)
    batch = {f"c_{i}": rng.integers(0, VOCAB, BATCH).astype(np.int32)
             for i in range(N_SPARSE)}
    batch.update({f"d_{i}": rng.normal(size=BATCH).astype(np.float32)
                  for i in range(N_DENSE)})
    batch["label"] = rng.integers(0, 2, BATCH).astype(np.int32)
    trainer.init_state(batch, seed=0)
    for _ in range(3):  # a few steps so the params aren't the init values
        trainer._train_step(batch)
    export_serving_bundle(trainer, batch, out_dir)
    print(f"[export] bundle written to {out_dir}", flush=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--export":
        export_phase(sys.argv[2])
        return

    out_dir = tempfile.mkdtemp(prefix="serving_bundle_")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--export", out_dir], check=True, env=env)

    shim = os.path.join(REPO, "pytorchrec_tpu", "native", "serving", "pjrt_serve")
    subprocess.run(["make", "-C", os.path.dirname(shim)], check=True)
    run = subprocess.run([shim, out_dir, "--reps", "10"], text=True)
    sys.exit(run.returncode)


if __name__ == "__main__":
    main()
