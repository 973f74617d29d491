"""Headline benchmark: DCN-v2 training throughput, examples/sec/chip.

The BASELINE.json headline config ("DCN-v2 on Criteo": 13 dense + 26 sparse
fields). The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against the reference's own stack re-measured here: an equivalent
torch DCN-v2 train step (embedding gathers + cross layers + MLP + Adam) on
this host's CPU — the reference is torch, single-device, CPU-or-GPU
(task/Task.py:187-190), and this environment has no GPU.

Timing is FETCH-FORCED (float(loss) of a state-chained step sequence), not
block_until_ready-based: through this environment's remote-device tunnel,
block_until_ready can return before execution completes, so the old
instrument measured the enqueue rate (see bench_tpu). Numbers produced
before 2026-08-17 overstate throughput by that artifact.

Reporting (VERDICT r3 #6 final form): BOTH production table formats are
measured — ``f32-packed`` (packed [V, 3E] f32 table||moments rows, exact)
and ``int8-packed`` (packed byte rows, rowwise Adagrad + stochastic
requantize, the build's fastest config at a measured −0.0006 AUC,
RESULTS.md) — and the headline ``value`` is the LIVE MEDIAN of the faster
config's windows; best-of-run and best-same-source-ever ride along as
fields, and each config reports its percent of the measured per-row-latency
floor (RESULTS.md step decomposition).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Criteo-like config
N_DENSE = 13
N_SPARSE = 26
VOCAB = 100_000
EMB = 16
BATCH = 32768
CROSS_LAYERS = 3
MLP_UNITS = (256, 128)

WARMUP_STEPS = 5
MEASURE_STEPS = 20
MEASURE_WINDOWS = 3  # best-of-N guards against transient link slowdowns
TORCH_MEASURE_STEPS = 5


def make_host_batch(rng: np.random.Generator):
    batch = {
        f"c_{i}": rng.integers(0, VOCAB, size=BATCH).astype(np.int32)
        for i in range(N_SPARSE)
    }
    for i in range(N_DENSE):
        batch[f"d_{i}"] = rng.normal(size=BATCH).astype(np.float32)
    batch["label"] = rng.integers(0, 2, size=BATCH).astype(np.int32)
    return batch


def bench_tpu(config: str = "f32-packed") -> list:
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )
    from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer

    sparse = [
        CategoricalColumnWithIdentity(feature_name=f"c_{i}", category_num=VOCAB)
        for i in range(N_SPARSE)
    ]
    dense = [NumericColumn(feature_name=f"d_{i}") for i in range(N_DENSE)]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    quantized = config == "int8-packed"
    model = DCNv2(
        sparse_columns=tuple(sparse),
        dense_columns=tuple(dense),
        label_column=label,
        emb_size=EMB,
        num_cross_layers=CROSS_LAYERS,
        layers=MLP_UNITS,
        # one offset-indexed table: 26 dedup-sorts collapse to 1 in the
        # sparse update (~15% faster, interleaved A/B)
        unified_embedding=True,
        # int8-packed: [V, 128] u8 q||scale||acc byte rows, rowwise Adagrad
        # + stochastic requantize — the measured-fastest production format
        # (−0.0006 AUC vs f32, scripts/quantized_accuracy.py / RESULTS.md)
        quantized_embedding=quantized,
        table_packed=quantized,
    )
    # production path: row-sparse lazy updates over PACKED rows — row ops on
    # this hardware are latency-bound (~29/107 ns/row regardless of row
    # bytes), so packing cuts the update's per-row passes from ~6 to 3
    # (ops/sparse_update.py::packed_sparse_update).
    # packed_min_width=64 measured best end-to-end: 128-wide f32 rows make
    # the isolated scatter faster (6.7 vs 13.7 ms) but the extra 2x bytes
    # through the forward gather + update permute cost more than that
    # (measured 60.0 vs 45.8 ms/step)
    if quantized:
        trainer = QuantizedEmbeddingTrainer(model, packed_tables=True)
    else:
        trainer = SparseEmbeddingTrainer(model, packed_tables=True)
    trainer.compile(optimizer="adam", lr=1e-3, loss="bce", metrics=("auc",),
                    matmul_precision="bfloat16")

    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng) for _ in range(4)]
    trainer.init_state(batches[0], seed=0)

    # Train-step throughput is measured over DEVICE-RESIDENT batches: this
    # dev environment reaches the chip through a tunnel that moves host
    # batches at ~46 MB/s (~114 ms for the 5.2 MB batch — measured
    # 2026-08-17), which would swamp the 54 ms device step. On production
    # hosts the same transfer is sub-ms DMA overlapped by the prefetch
    # pipeline, so steady-state fit() time is the device step. The measured
    # tunnel input cost is disclosed separately by the caller's note.
    trainer.packed_transfer = False  # no host-side packing; batches resident
    trainer._train_step_fn = None
    batches_dev = [
        {k: jax.device_put(v) for k, v in b.items()} for b in batches
    ]

    for i in range(WARMUP_STEPS):
        loss = trainer._train_step(batches_dev[i % len(batches_dev)])
    float(loss)  # fetch-forced sync (see below)

    # MEASUREMENT CONTRACT (round-2 correction): through the axon tunnel,
    # ``jax.block_until_ready`` can return BEFORE device execution finishes
    # (measured 2026-08-17: a step chain "completed" 10x faster than the HBM
    # roofline allows; fetch-forced timing of the same chain was ~90x
    # slower). block_until_ready-based windows measure the ENQUEUE rate, not
    # throughput — every pre-correction bench number overstated accordingly.
    # The only airtight completion signal is FETCHING a value that
    # data-depends on the whole chain: steps are state-chained (donated
    # state), so float(loss_k) forces steps 1..k-1 entirely plus step k's
    # forward. One extra dispatch is appended so the fetched loss also
    # covers the last measured step's table update.
    windows = []
    for _ in range(MEASURE_WINDOWS):
        start = time.perf_counter()
        for i in range(MEASURE_STEPS + 1):
            loss = trainer._train_step(batches_dev[i % len(batches_dev)])
        float(loss)
        elapsed = time.perf_counter() - start
        windows.append(MEASURE_STEPS * BATCH / elapsed)
    return windows


def bench_torch_reference() -> float:
    """Reference-stack equivalent: torch DCN-v2 train step on host CPU."""
    import torch

    torch.manual_seed(0)

    class TorchDCN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.ModuleList(
                [torch.nn.Embedding(VOCAB, EMB) for _ in range(N_SPARSE)]
            )
            d = N_SPARSE * EMB + N_DENSE
            self.cross_w = torch.nn.ParameterList(
                [torch.nn.Parameter(torch.randn(d, d) * 0.01) for _ in range(CROSS_LAYERS)]
            )
            self.cross_b = torch.nn.ParameterList(
                [torch.nn.Parameter(torch.zeros(d)) for _ in range(CROSS_LAYERS)]
            )
            mlp = []
            prev = d
            for units in MLP_UNITS:
                mlp += [torch.nn.Linear(prev, units), torch.nn.ReLU()]
                prev = units
            self.mlp = torch.nn.Sequential(*mlp)
            self.head = torch.nn.Linear(d + MLP_UNITS[-1], 1)

        def forward(self, sparse_ids, dense_vals):
            embs = [emb(ids) for emb, ids in zip(self.embeddings, sparse_ids)]
            x0 = torch.cat(embs + [dense_vals], dim=-1)
            x = x0
            for w, b in zip(self.cross_w, self.cross_b):
                x = x0 * (x @ w + b) + x  # DCN-v2 cross
            deep = self.mlp(x0)
            return self.head(torch.cat([x, deep], dim=-1))[:, 0]

    model = TorchDCN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()

    rng = np.random.default_rng(0)
    batch = make_host_batch(rng)
    sparse_ids = [torch.from_numpy(batch[f"c_{i}"].astype(np.int64)) for i in range(N_SPARSE)]
    dense_vals = torch.from_numpy(
        np.stack([batch[f"d_{i}"] for i in range(N_DENSE)], axis=-1)
    )
    labels = torch.from_numpy(batch["label"].astype(np.float32))

    def step():
        opt.zero_grad()
        out = model(sparse_ids, dense_vals)
        loss = loss_fn(out, labels)
        loss.backward()
        opt.step()

    step()  # warmup
    best = 0.0
    for _ in range(2):  # best-of-2: fair to the baseline under host load
        start = time.perf_counter()
        for _ in range(TORCH_MEASURE_STEPS):
            step()
        elapsed = time.perf_counter() - start
        best = max(best, TORCH_MEASURE_STEPS * BATCH / elapsed)
    return best


CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache.json")
DEVICE_BUDGET_S = 420  # the TPU link stalls occasionally; don't lose the run


def _src_hash() -> str:
    """Fingerprint of the measured code (bench.py + every package source).

    The device tunnel's throughput varies ~3-20x run to run, so the reported
    value is best-of-runs — but only across runs of IDENTICAL source: any
    package change invalidates the cache so a code regression can never hide
    behind an old healthy-window measurement."""
    import glob as _glob
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    digest = hashlib.md5()
    files = [os.path.join(root, "bench.py")] + sorted(
        _glob.glob(os.path.join(root, "pytorchrec_tpu", "**", "*.py"),
                   recursive=True))
    for path in files:
        digest.update(path.encode())
        with open(path, "rb") as f:
            digest.update(f.read())
    return digest.hexdigest()


def _measure_with_watchdog(config: str):
    """Run the device benchmark under a wall-clock budget.

    Returns ``(windows, error)``: the list of live per-window throughputs (or
    ``[]``) plus the failure description. Only an alarm timeout or a device/
    runtime error falls back — a plain Python bug (TypeError etc.) raises."""
    import signal

    class _Timeout(Exception):
        pass

    def _raise(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _raise)
    signal.alarm(DEVICE_BUDGET_S)
    try:
        windows = bench_tpu(config)
        signal.alarm(0)
        return windows, None
    except (_Timeout, RuntimeError, OSError, jax_errors()) as e:
        signal.alarm(0)
        sys.stderr.write(f"bench[{config}]: live measurement failed ({e!r})\n")
        return [], f"{type(e).__name__}: {e}"


def jax_errors():
    try:
        from jax.errors import JaxRuntimeError

        return JaxRuntimeError
    except ImportError:  # older jax: XlaRuntimeError rides on RuntimeError
        return RuntimeError


def _load_cache(src: str) -> dict:
    """Prior cache (best-known kept only for THIS source version)."""
    if not os.path.exists(CACHE_PATH):
        return {}
    try:
        with open(CACHE_PATH) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        return {}
    if cache.get("src_hash") != src:
        # keep the torch baseline (source-independent); drop the TPU best
        cache = {"torch_value": cache.get("torch_value", 0.0)}
    return cache


# Per-config per-row-latency floors at b32768 (the sum of each layout's
# three irreducible fast-width row passes, measured in isolation —
# RESULTS.md step decomposition + width-rule tables):
#   f32-packed  [852k, 64] f32 rows: 11.6 (fwd gather) + 11.6 (update
#               permute) + 13.7 (scatter-set) = 36.9 ms (isolated probes)
#   int8-packed [852k, 128] u8 rows: 7.5 (gather) + 1.5 (permute) + 9.4
#               (scatter) = 18.4 ms — from the IN-STEP jax.profiler
#               attribution (scripts/int8_step_profile.py); isolated u8
#               probes are misleading both ways (RESULTS.md)
# (The int8 floor is LOWER — byte rows move fewer bytes once vectorized —
# so its pct-of-floor is not comparable to f32's; each config reports
# against its own layout's floor.)
ROW_LATENCY_FLOOR_MS = {"f32-packed": 36.9, "int8-packed": 18.4}

CONFIGS = ("int8-packed", "f32-packed")  # fastest first = headline


def _device_reachable(timeout_s: int = 240) -> bool:
    """Probe the TPU backend in a SUBPROCESS with a hard wall-clock kill.

    The in-process watchdog (SIGALRM) cannot interrupt a backend-init hang
    inside a blocking C call — observed 2026-08-21 when the axon tunnel
    went down and ``jax.devices()`` hung >8 min. A dead tunnel must fall
    back to the same-source cache, not hang the driver's bench run."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    src = _src_hash()
    cache = _load_cache(src)
    cfg_cache = cache.get("configs", {})
    baseline = bench_torch_reference()
    # baseline is best-of-runs too (its BEST run = the most conservative
    # ratio; protects the reference stack from this host's transient load)
    baseline = max(baseline, cache.get("torch_value", 0.0))

    device_ok = _device_reachable()
    if not device_ok:
        sys.stderr.write("bench: device backend unreachable (probe "
                         "timeout) — falling back to same-source cache\n")

    per_config, errors = {}, {}
    for config in CONFIGS:
        if not device_ok:
            windows, error = [], "device backend unreachable (init hang)"
        else:
            windows, error = _measure_with_watchdog(config)
        live_best = max(windows) if windows else 0.0
        live_median = float(np.median(windows)) if windows else 0.0
        best_known = max(live_best, cfg_cache.get(config, {}).get("value", 0.0))
        step_ms = BATCH / live_median * 1e3 if live_median else 0.0
        per_config[config] = {
            "median": round(live_median, 1),
            "best": round(live_best, 1),
            "best_known": round(best_known, 1),
            "n_windows": len(windows),
            "pct_of_row_latency_floor": (
                round(100.0 * ROW_LATENCY_FLOOR_MS[config] / step_ms, 1)
                if step_ms else None),
        }
        if error:
            errors[config] = error
        if best_known > 0:  # a failed run must never stomp a prior value
            cfg_cache[config] = {"value": best_known}

    cache.update({"configs": cfg_cache, "torch_value": baseline,
                  "src_hash": src,
                  # legacy field some docs referenced: overall best-known
                  "value": max((c["value"] for c in cfg_cache.values()),
                               default=0.0)})
    if cfg_cache:  # all-failed with empty cache: keep the file untouched
        try:
            with open(CACHE_PATH, "w") as f:
                json.dump(cache, f)
        except OSError:
            pass

    # headline = the faster config's LIVE MEDIAN (best rides along)
    live = [(c, v) for c, v in per_config.items() if v["median"] > 0]
    if live:
        head_cfg, head = max(live, key=lambda cv: cv[1]["median"])
        value = head["median"]
        note = (
            f"value = live MEDIAN of {head['n_windows']} fetch-forced "
            f"windows on the {head_cfg} table format "
            f"(best this run {round(head['best']/1e6, 2)}M, best "
            f"same-source ever {round(head['best_known']/1e6, 2)}M, "
            f"{head['pct_of_row_latency_floor']}% of this layout's "
            f"{ROW_LATENCY_FLOOR_MS[head_cfg]} ms per-row-latency floor). "
            f"Measured over device-resident batches: the dev tunnel moves "
            f"host batches at ~46 MB/s (~114 ms per 5.2 MB batch), an "
            f"environment artifact a production host's prefetch pipeline "
            f"hides (sub-ms DMA). The host SIDE of that claim is now "
            f"MEASURED, not assumed: this machine's "
            f"StreamingBatchSource -> VocabMapper -> packing sustains "
            f"~3.0M rows/s of formed b32768 batches single-process = "
            f"3.4x this chip demand (scripts/host_pipeline_bench.py, "
            f"RESULTS.md round-5 host-supply table)."
        )
    else:
        best_any = max((c["value"] for c in cfg_cache.values()), default=0.0)
        if best_any == 0.0:
            raise SystemExit(f"bench: no live measurement and no same-source "
                             f"cache ({errors})")
        head_cfg, value = max(cfg_cache.items(), key=lambda cv: cv[1]["value"])
        value = cfg_cache[head_cfg]["value"]
        note = (f"NO live measurement this run ({errors}); value is the best "
                f"same-source prior run ({head_cfg})")

    result = {
        "metric": "dcnv2_criteo_train_throughput",
        "value": round(value, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(value / baseline, 3),
        "config": head_cfg,
        "configs": per_config,
        "note": note,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
