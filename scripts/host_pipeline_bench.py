"""Host input-pipeline throughput vs chip demand (VERDICT r4 #1).

The bench headline (878.7k ex/s/chip, int8 packed, b32768) is measured
over device-resident batches; this script measures the OTHER side of that
claim — what the host can actually produce — so the bench note rests on a
measurement instead of an assumption. The reference's input-scaling story
is ``DataLoader(num_workers)`` (/root/reference/torchrec/model/IModel.py:
183-187); ours is StreamingBatchSource's producer thread + (optionally)
process-sharded readers, measured here.

Pipeline stages measured at the bench config (26 sparse int32 x 100k
vocab, 13 dense f32, label, b32768), sharded parquet:

  A  StreamingBatchSource.batches()        raw chunk->shuffle->batch
  B  A + VocabMapper transform             hash-map 26 columns/chunk
  C  B + BatchPacker.pack                  2 contiguous buffers per batch
  D  C across N reader PROCESSES           files[p::n] per-host recipe

Each stage reports sustained rows/s + formed MB/s and the margin over the
chip's measured consumption. Run: python scripts/host_pipeline_bench.py
[--rows 4000000] [--shards 8] [--batch 32768] [--procs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SPARSE, N_DENSE, VOCAB = 26, 13, 100_000
CHIP_ROWS_PER_S = 878_700  # BENCH_r04 int8 live median
ROW_BYTES = 4 * (N_SPARSE + N_DENSE + 1)


def make_shards(root: str, total_rows: int, shards: int) -> list[str]:
    os.makedirs(root, exist_ok=True)
    paths = []
    rows = total_rows // shards
    for s in range(shards):
        path = os.path.join(root, f"shard_{s:03d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        import pandas as pd

        rng = np.random.default_rng(1000 + s)
        cols = {f"c_{i}": rng.integers(0, VOCAB, size=rows, dtype=np.int32)
                for i in range(N_SPARSE)}
        cols.update({f"d_{i}": rng.normal(size=rows).astype(np.float32)
                     for i in range(N_DENSE)})
        cols["label"] = rng.integers(0, 2, size=rows, dtype=np.int32)
        pd.DataFrame(cols).to_parquet(path, index=False)
    return paths


def build_mapper(paths):
    """Admission vocabs over one shard's head (the production recipe:
    data/vocab.py::build_vocabs over the stream)."""
    from pytorchrec_tpu.data.vocab import FrequencyVocab, VocabMapper

    import pandas as pd

    head = pd.read_parquet(paths[0]).head(200_000)
    vocabs = {}
    for i in range(N_SPARSE):
        v = FrequencyVocab(num_oov_buckets=10)
        v.update(head[f"c_{i}"].to_numpy())
        v.build(max_size=VOCAB)
        vocabs[f"c_{i}"] = v
    return VocabMapper(vocabs)


def consume(source_iter, batch_size, max_batches, pack_example=None):
    """Drain ``max_batches`` batches; returns (rows/s, MB/s) over the
    steady-state window (first 3 batches excluded as producer warmup)."""
    from pytorchrec_tpu.data.packing import BatchPacker

    packer = BatchPacker(pack_example) if pack_example is not None else None
    n = 0
    t0 = None
    for i, batch in enumerate(source_iter):
        if packer is not None:
            ints, floats = packer.pack(batch)
            assert ints.flags["C_CONTIGUOUS"]
        if i == 2:  # warmup boundary
            t0 = time.perf_counter()
            n = 0
        n += batch_size
        if i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n / dt, n * ROW_BYTES / dt / 1e6


def run_stage(paths, batch, max_batches, transform=None, pack=False,
              procs=1):
    from pytorchrec_tpu.data.streaming import StreamingBatchSource

    if procs == 1:
        src = StreamingBatchSource(paths, batch_size=batch,
                                   transform=transform, seed=7)
        it = src.batches(epochs=None)
        example = next(it)
        return consume(it, batch, max_batches,
                       pack_example=example if pack else None)

    # D: one reader PROCESS per file subset (files[p::n]), results drained
    # through a queue — the per-host sharding recipe measured end-to-end
    # (incl. pickling transfer cost, the honest upper bound for a
    # same-host multi-process loader without shared memory)
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    q: "mp.Queue" = ctx.Queue(maxsize=4 * procs)

    def worker(pid):
        src = StreamingBatchSource(paths, batch_size=batch,
                                   transform=transform, seed=7,
                                   process_id=pid, process_count=procs)
        packer = None
        for b in src.batches(epochs=None):
            if pack:
                from pytorchrec_tpu.data.packing import BatchPacker

                if packer is None:
                    packer = BatchPacker(b)
                q.put(packer.pack(b))
            else:
                q.put(b)

    workers = [ctx.Process(target=worker, args=(p,), daemon=True)
               for p in range(procs)]
    for w in workers:
        w.start()
    n = 0
    t0 = None
    for i in range(max_batches):
        q.get()
        if i == 2:
            t0 = time.perf_counter()
            n = 0
        n += batch
    dt = time.perf_counter() - t0
    for w in workers:
        w.terminate()
    return n / dt, n * ROW_BYTES / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32_768)
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--root", type=str,
                    default=os.environ.get("HOST_BENCH_DIR",
                                           "/tmp/host_pipeline_shards"))
    args = ap.parse_args()
    assert args.batches > 3, "--batches must exceed the 3-batch warmup"

    paths = make_shards(args.root, args.rows, args.shards)
    mapper = build_mapper(paths)

    results = {}
    for key, kwargs in [
        ("A_raw", dict()),
        ("B_vocab", dict(transform=mapper)),
        ("C_vocab_pack", dict(transform=mapper, pack=True)),
        (f"D_{args.procs}proc_pack", dict(transform=mapper, pack=True,
                                          procs=args.procs)),
    ]:
        rows_s, mb_s = run_stage(paths, args.batch, args.batches, **kwargs)
        results[key] = {"rows_per_s": round(rows_s),
                        "mb_per_s": round(mb_s, 1),
                        "x_chip_demand": round(rows_s / CHIP_ROWS_PER_S, 2)}
        print(f"{key:16s} {rows_s/1e3:8.1f}k rows/s  {mb_s:7.1f} MB/s  "
              f"{rows_s / CHIP_ROWS_PER_S:5.2f}x chip demand", flush=True)

    print(json.dumps({"host_pipeline": results,
                      "chip_demand_rows_per_s": CHIP_ROWS_PER_S,
                      "row_bytes": ROW_BYTES, "batch": args.batch}))


if __name__ == "__main__":
    main()
