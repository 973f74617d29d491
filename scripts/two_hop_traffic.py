"""Quantify the 2-hop hierarchical exchange's DCN savings vs the flat grid.

Host-side simulation of the static-shape bucket accounting that
``embedding_engine.grid_rowgrad`` (flat) and ``two_hop_rowgrad``
(hierarchical) actually use, on sampled id streams — and, from the same
measured capacities, the forward LOOKUP twin (``grid_lookup`` vs
``two_hop_lookup``): the lookup routes the same id buckets (requests out,
E-wide vectors back), so its zero-overflow capacities are identical and
only the per-entry byte split differs (4 B request + 4E B response vs the
backward's 4+4E B combined row). Two effects:

1. **Message aggregation**: flat grid sends (d-1)*m DCN messages per device
   per exchange; 2-hop sends (d-1) — the fast/model hop rides ICI. DCN at
   rec-model message sizes is latency-dominated, so m-fold fewer messages is
   the headline win on real pods.
2. **Duplicate combining**: the hop-1 landing zone holds every occurrence a
   fast lane forwards; summing duplicates there shrinks the REQUIRED
   slow-hop bucket capacity (exactness is capacity-independent either way —
   this sizes the no-overflow bucket, i.e. the bytes actually moved).

Capacities reported are the measured zero-overflow minima over the sampled
steps (what you'd set ``exchange_capacity`` to, plus margin).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

D, M = 4, 4            # hosts (DCN) x chips-per-host (ICI)
B = 8192               # ids per data shard per step (one table's occurrences)
E = 16
V = 100_000
STEPS = 20
ROW_BYTES = 4 + 4 * E  # id + f32 grad row


def streams(rng):
    yield "uniform", lambda n: rng.integers(0, V, size=n)
    zipf_p = 1.0 / np.arange(1, V + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    yield "zipf(1.1)", lambda n: rng.choice(V, size=n, p=zipf_p)


def simulate(sample):
    rows_per_dev = V // (D * M)
    flat_need, hop2_need = 0, 0
    for _ in range(STEPS):
        # each of the D data shards draws B ids, replicated over its M lanes;
        # each lane routes a 1/M chunk (grid_rowgrad's chunking)
        for di in range(D):
            ids = sample(B)
            chunks = ids.reshape(M, -1)  # lane mi routes chunks[mi]
            k = chunks.shape[1]
            for mi in range(M):
                owner = np.clip(chunks[mi] // rows_per_dev, 0, D * M - 1)
                flat_need = max(flat_need, np.bincount(
                    owner, minlength=D * M).max())
            # hop 1: lane l receives, from all M chunks, entries whose final
            # owner lane == l; dedup; hop 2 buckets by owner group
            for lane in range(M):
                owner = np.clip(ids // rows_per_dev, 0, D * M - 1)
                mine = ids[owner % M == lane]
                uniq = np.unique(mine)
                g = np.clip(uniq // rows_per_dev, 0, D * M - 1) // M
                hop2_need = max(hop2_need, np.bincount(
                    g, minlength=D).max() if len(g) else 0)
    k = B // M
    flat = {
        "dcn_msgs": (D - 1) * M,
        "cap": int(flat_need),
        "dcn_bytes": (D - 1) * M * int(flat_need) * ROW_BYTES,
        "worst_cap": k,
    }
    two = {
        "dcn_msgs": D - 1,
        "cap": int(hop2_need),
        "dcn_bytes": (D - 1) * int(hop2_need) * ROW_BYTES,
        "worst_cap": M * k,
    }
    return flat, two


def main():
    rng = np.random.default_rng(0)
    print(f"grid {D} hosts x {M} chips, B={B} ids/shard, E={E}, V={V}, "
          f"{STEPS} steps\n")
    for name, sample in streams(rng):
        flat, two = simulate(sample)
        ratio = flat["dcn_bytes"] / two["dcn_bytes"]
        print(f"{name:10s} flat-grid : {flat['dcn_msgs']:3d} DCN msgs/dev, "
              f"cap {flat['cap']:5d} (worst {flat['worst_cap']}), "
              f"{flat['dcn_bytes']/1e6:7.2f} MB DCN/dev/exchange")
        print(f"{'':10s} two-hop   : {two['dcn_msgs']:3d} DCN msgs/dev, "
              f"cap {two['cap']:5d} (worst {two['worst_cap']}), "
              f"{two['dcn_bytes']/1e6:7.2f} MB DCN/dev/exchange  "
              f"-> {ratio:.2f}x fewer DCN bytes, "
              f"{flat['dcn_msgs']/two['dcn_msgs']:.0f}x fewer messages")
        # forward lookup twin: same buckets, request ids out (4 B) +
        # vectors back (4E B); messages count BOTH directions
        lk_flat = (D - 1) * M * flat["cap"] * (4 + 4 * E)
        lk_two = (D - 1) * two["cap"] * (4 + 4 * E)
        print(f"{'':10s} lookup    : flat {2 * (D - 1) * M:3d} msgs "
              f"{lk_flat/1e6:7.2f} MB vs two-hop {2 * (D - 1):3d} msgs "
              f"{lk_two/1e6:7.2f} MB -> {lk_flat/lk_two:.2f}x fewer DCN "
              f"bytes, {M:.0f}x fewer messages\n")


if __name__ == "__main__":
    main()
