"""Reference-vs-build TRAINING-TRAJECTORY parity (FUTURE.md #7, VERDICT r1).

Where `reference_parity.py` compares best-epoch TEST metrics, this compares
the per-epoch DEV-metric trajectory of the unmodified torch reference
against this build on the same dataset and seeds: both stacks train
EPOCHS epochs with dev evaluation every epoch, and the per-epoch mean
curves are required to track each other within the cross-seed spread.

Protocol (per model): 3 seeds x 20 epochs on the Parity-ML synthetic
artifacts (byte-identical on-disk format for both stacks). Verdict is
TRAJECTORY PARITY when, at every epoch e,

    |mean_build(e) - mean_ref(e)| <= max(2 * spread(e), 0.01)

with spread(e) = max(std_build(e), std_ref(e)) across seeds — the same
band the final-metric check uses, applied pointwise along the curve.
Reference fit loop: /root/reference/torchrec/model/IModel.py:146-212
(dev_freq=1 merges dev metrics into epoch logs, History records them).

Usage:
    PYTORCHREC_TPU_WORK_DIR=/tmp/parity_wd \
        python scripts/trajectory_parity.py [--seq] [model ...]

``--seq`` runs on the Markov-structured dataset instead
(``generate_synthetic_ml(markov_strength=0.8, n_clusters=20)``, the round-2
sequential benchmark config): on the plain generator sequence models sit at
the random floor on BOTH stacks (flat curves — in-band but uninformative);
the planted successor structure makes the GRU4Rec curves RISE, so tracking
is meaningful.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import reference_parity as rp

SEEDS = [2020, 2021, 2022]
# one factorization model + one sequence model covers both reader families
MODELS = ["funksvd", "gru4rec"]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    work_dir = os.environ.get("PYTORCHREC_TPU_WORK_DIR")
    assert work_dir, "set PYTORCHREC_TPU_WORK_DIR"

    from pytorchrec_tpu.data.process.datasets import generate_synthetic_ml

    argv = [a for a in sys.argv[1:] if a != "--seq"]
    if "--seq" in sys.argv[1:]:
        rp.DATASET = "Parity-Seq"
        if not os.path.exists(os.path.join(work_dir, "Dataset", rp.DATASET)):
            generate_synthetic_ml(rp.DATASET, n_users=500, n_items=1000,
                                  min_interactions=30, max_interactions=80,
                                  markov_strength=0.8, n_clusters=20, seed=42)
    elif not os.path.exists(os.path.join(work_dir, "Dataset", rp.DATASET)):
        generate_synthetic_ml(rp.DATASET, n_users=500, n_items=1000,
                              min_interactions=30, max_interactions=80, seed=42)

    models = argv or MODELS
    trajs = {}
    for model_name in models:
        trajs[model_name] = {
            "ours": [rp.run_ours(model_name, seed)[2] for seed in SEEDS]}

    rp._patch_reference_paths(work_dir)
    for model_name in models:
        trajs[model_name]["ref"] = [
            rp.run_reference(model_name, seed)[2] for seed in SEEDS]

    report = {}
    for model_name in models:
        ours = np.asarray(trajs[model_name]["ours"])   # [seeds, epochs]
        ref = np.asarray(trajs[model_name]["ref"])
        epochs = min(ours.shape[1], ref.shape[1])
        ours, ref = ours[:, :epochs], ref[:, :epochs]
        mo, so = ours.mean(0), ours.std(0)
        mr, sr = ref.mean(0), ref.std(0)
        diff = np.abs(mo - mr)
        band = np.maximum(2 * np.maximum(so, sr), 0.01)
        within = diff <= band
        # also the curve-level summary: correlation of the mean curves
        corr = float(np.corrcoef(mo, mr)[0, 1]) if epochs > 2 else float("nan")
        verdict = "TRAJECTORY PARITY" if bool(within.all()) else (
            "NEAR (>=90% epochs in band)" if within.mean() >= 0.9 else "DIVERGENT")
        report[model_name] = {
            "epochs": int(epochs),
            "in_band": int(within.sum()),
            "curve_corr": round(corr, 4),
            "verdict": verdict,
            "build_mean": [round(float(v), 4) for v in mo],
            "ref_mean": [round(float(v), 4) for v in mr],
            "band": [round(float(v), 4) for v in band],
        }
        print(f"\n[{model_name}] dev ndcg@10 per epoch "
              f"(mean over {len(SEEDS)} seeds)")
        print("epoch  build   ref     |diff|  band    ok")
        for e in range(epochs):
            print(f"{e + 1:>5}  {mo[e]:.4f}  {mr[e]:.4f}  {diff[e]:.4f}  "
                  f"{band[e]:.4f}  {'y' if within[e] else 'N'}")
        print(f"[{model_name}] {within.sum()}/{epochs} epochs in band, "
              f"mean-curve corr {corr:.3f} -> {verdict}")

    out = os.path.join(work_dir, "trajectory_parity.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
