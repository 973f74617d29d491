"""Two-tower full-corpus retrieval throughput on the real chip.

Measures the serving-side retrieval path (serving/retrieval.py): one
[B, D] x [D, V] bf16 score matmul + lax.top_k over a V-item corpus —
the MXU-bound workload the two-tower family exists for. Reported as
user-item scores/sec plus the achieved fraction of the chip's measured
matmul rate (187 TFLOP/s bf16, RESULTS.md cost model).

Timing is fetch-forced (RESULTS.md measurement correction): calls are
data-chained through the query ids (a zero-valued function of the previous
window's scores is added to the ids) so float()ing the last window's scalar
forces the whole chain; block_until_ready lies through the dev tunnel.

Usage: python scripts/retrieval_bench.py [--small]  (--small: CPU smoke)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="tiny CPU smoke")
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--corpus", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--calls", type=int, default=20)
    args = parser.parse_args()

    if args.small:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.batch, args.corpus, args.dim, args.calls = 64, 2048, 16, 3

    import jax
    import jax.numpy as jnp

    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models.two_tower import TwoTower
    from pytorchrec_tpu.serving.retrieval import build_item_index, make_retrieve_fn

    B, V, D, K = args.batch, args.corpus, args.dim, args.topk
    n_users = 1_000_000 if not args.small else 512

    model = TwoTower(
        uid_column=CategoricalColumnWithIdentity(feature_name="uid", category_num=n_users),
        iid_column=CategoricalColumnWithIdentity(feature_name="iid", category_num=V),
        emb_size=64, layers=(256, D), normalize=True,
    )
    init_batch = {"uid": jnp.zeros((8,), jnp.int32),
                  "iid": jnp.zeros((8,), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), init_batch, False)

    t0 = time.perf_counter()
    index = build_item_index(model, params, num_items=V, batch_size=131072)
    float(jnp.sum(index[-1].astype(jnp.float32)))  # force build
    build_s = time.perf_counter() - t0

    base_ids = jnp.asarray(np.random.default_rng(0).integers(0, n_users, B,
                                                             dtype=np.int32))
    print(f"corpus={V} batch={B} dim={D} topk={K} calls={args.calls}")
    print(f"index build: {build_s*1e3:.1f} ms ({V} items; includes "
          f"first-call compiles — one-time)")

    exact_ids = None
    for mode, approx in (("exact lax.top_k", False),
                         ("approx_max_k r=0.99", True),
                         ("approx_max_k r=0.95", 0.95),
                         ("pallas fused bin-max", "fused")):
        if approx == "fused":
            retrieve = make_retrieve_fn(model, approx="fused")
        else:
            recall = approx if isinstance(approx, float) else 0.99
            retrieve = make_retrieve_fn(model, approx=bool(approx),
                                        recall_target=recall)

        def one_call(ids):
            scores, top_ids = retrieve(params, index, ids, K)
            # chain: zero-valued int of the scores feeds the next call's ids
            carry = (jnp.sum(scores[:, :1]) * 0).astype(jnp.int32)
            return ids + carry, jnp.sum(scores), top_ids

        ids, probe, top_ids = one_call(base_ids)  # warmup (compile)
        float(probe)
        measured_recall = ""
        if not approx:
            exact_ids = np.asarray(top_ids)
        elif exact_ids is not None:  # recall vs the exact run, same queries
            got = np.asarray(top_ids)
            hits = np.mean([np.isin(got[b], exact_ids[b]).mean()
                            for b in range(got.shape[0])])
            measured_recall = f"  recall@{K}={hits:.3f}"

        start = time.perf_counter()
        ids = base_ids
        for _ in range(args.calls):
            ids, probe, _ = one_call(ids)
        float(probe)  # forces the chain (each call's ids depend on prior scores)
        elapsed = time.perf_counter() - start

        scores_per_s = args.calls * B * V / elapsed
        flops = 2.0 * B * V * D * args.calls / elapsed
        print(f"{mode:>22}: {elapsed/args.calls*1e3:8.2f} ms/call  "
              f"{scores_per_s/1e9:7.2f}B scores/sec  "
              f"{flops/1e12:5.1f} TFLOP/s ({flops/187e12*100:.0f}% of "
              f"measured bf16 matmul rate){measured_recall}")


if __name__ == "__main__":
    main()
