"""Analytical scaling curve for the flagship int8-packed engine config
(VERDICT r4 #7: the BASELINE ">80% scaling at v5e-16" target cannot be
RUN here — one real chip — but the per-device collective traffic CAN be
extracted exactly from the compiled HLO at every mesh size, and combined
with the measured single-chip step into a projected efficiency curve).

Method:
* compile the int8-packed ShardedSparseEmbeddingTrainer train step on
  virtual CPU meshes of 2..32 devices (weak scaling: per-device batch
  fixed, the production regime), mesh family (data=d, model=4) with a
  model=2 tail for the 2-device point;
* sum every collective's received bytes per device from the compiled HLO
  (scripts/sparse_2d_compare.py::collective_bytes — exact, not modeled);
* combine with the MEASURED single-chip step (37.2 ms @ b32768 int8 =
  1.135 us/row fetch-forced, BENCH_r04) under stated link speeds:
  v5e ICI ~= 90 GB/s/chip effective, DCN ~= 6.25 GB/s/chip (50 Gbps).
  Projected efficiency = compute / (compute + bytes/link_bw), i.e.
  NO compute/communication overlap — a PESSIMISTIC floor; XLA overlaps
  the exchange with dense compute in practice.

Usage: python scripts/scaling_curve.py [--per_dev_batch 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_2d_compare import collective_bytes  # noqa: E402

N_SPARSE, N_DENSE, V, E = 26, 13, 65_536, 16
US_PER_ROW_MEASURED = 37.2e3 / 32_768  # BENCH_r04 int8 single-chip
ICI_BW = 90e9    # bytes/s/chip, v5e effective
DCN_BW = 6.25e9  # bytes/s/chip (50 Gbps NIC)


def build(mesh_shape, per_dev_batch, qgrad, strategy="1d"):
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.parallel import make_mesh
    from pytorchrec_tpu.training import ShardedSparseEmbeddingTrainer

    d, m = mesh_shape
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=V)
              for i in range(N_SPARSE)]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label",
                                          category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=E, num_cross_layers=3,
                  layers=(256, 128), unified_embedding=True,
                  quantized_embedding=True, table_packed=True,
                  table_row_multiple=128)
    tr = ShardedSparseEmbeddingTrainer(
        model, mesh=make_mesh(data=d, model=m), strategy=strategy,
        packed_tables=True, qgrad_exchange=qgrad)
    tr.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",))
    rng = np.random.default_rng(0)
    B = per_dev_batch * d
    b = {f"c_{i}": rng.integers(0, V, size=B).astype(np.int32)
         for i in range(N_SPARSE)}
    for i in range(N_DENSE):
        b[f"d_{i}"] = rng.normal(size=B).astype(np.float32)
    b["label"] = rng.integers(0, 2, size=B).astype(np.int32)
    return tr, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_dev_batch", type=int, default=4096)
    ap.add_argument("--qgrad", action="store_true",
                    help="int8 row-grad exchange payloads")
    ap.add_argument("--strategy", default="1d", choices=["1d", "grid"],
                    help="grid removes the data-axis all_gather term "
                         "(unique row owner) — the scaling play once the "
                         "data axis grows")
    args = ap.parse_args()

    meshes = [(1, 2), (1, 4), (2, 4), (4, 4), (8, 4)]
    compute_ms = US_PER_ROW_MEASURED * args.per_dev_batch / 1e3
    rows = []
    print(f"per-device batch {args.per_dev_batch} (weak scaling), measured "
          f"compute {compute_ms:.2f} ms/step/device, qgrad={args.qgrad}, "
          f"strategy={args.strategy}")
    for d, m in meshes:
        n = d * m
        tr, b = build((d, m), args.per_dev_batch, args.qgrad,
                      args.strategy)
        tr.init_state(b, seed=3)
        tr._train_step_fn = tr._jit_train_step(tr._build_train_step())
        db = tr._put_batch(b)
        compiled = tr._train_step_fn.lower(tr.state, db).compile()
        coll = collective_bytes(compiled.as_text())
        total = sum(coll.values())
        # one live step (numerics sanity at every mesh size)
        state, loss = tr._train_step_fn(tr.state, db)
        assert np.isfinite(float(loss)), (n, loss)
        for bw, link in ((ICI_BW, "ICI"), (DCN_BW, "DCN")):
            t_coll = total / bw * 1e3
            eff = compute_ms / (compute_ms + t_coll)
            if link == "ICI":
                eff_ici, t_ici = eff, t_coll
            else:
                eff_dcn, t_dcn = eff, t_coll
        rows.append({"devices": n, "mesh": f"{d}x{m}",
                     "mb_per_dev_step": round(total / 1e6, 2),
                     "bytes_per_row": round(total / args.per_dev_batch, 1),
                     "coll_ms_ici": round(t_ici, 2),
                     "eff_ici": round(eff_ici, 3),
                     "coll_ms_dcn": round(t_dcn, 2),
                     "eff_dcn": round(eff_dcn, 3),
                     **{k: round(v / 1e6, 2) for k, v in coll.items()}})
        r = rows[-1]
        print(f"  {n:3d} dev ({d}x{m}): {r['mb_per_dev_step']:7.2f} "
              f"MB/dev/step  ICI {r['coll_ms_ici']:5.2f} ms -> eff "
              f"{r['eff_ici']:.1%} | DCN {r['coll_ms_dcn']:6.2f} ms -> "
              f"eff {r['eff_dcn']:.1%}", flush=True)

    print(json.dumps({"strategy": args.strategy,
                      "weak_scaling_curve": rows,
                      "compute_ms_per_dev": round(compute_ms, 2),
                      "ici_bw_gbps": ICI_BW / 1e9,
                      "dcn_bw_gbps": DCN_BW / 1e9,
                      "note": "no-overlap floor; XLA overlaps in practice"}))


if __name__ == "__main__":
    main()
