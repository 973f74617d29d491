"""Criteo click-log formatter (Kaggle/Terabyte TSV format).

No reference counterpart (the reference has no CTR datasets); required by
the BASELINE.json configs ("DeepFM on Criteo-1M sample", "DCN-v2 on full
Criteo"). Raw rows are ``label \\t I1..I13 \\t C1..C26`` where the integer
features may be empty/negative and the categorical features are 32-bit hex
strings (or empty).

Standard preparation (DLRM recipe):

* dense ``d_0..d_12``: missing -> 0, negatives -> 0, then ``log1p`` (served
  as float32 — models z-score via NumericColumn stats);
* sparse ``c_0..c_25``: hex -> int, hashed into a capped vocab
  (``hash_bucket`` each, id 0 reserved for missing);
* output: SHARDED parquet under ``<dataset>/shards/`` for
  ``StreamingBatchSource`` (full-Criteo path), plus canonical in-memory
  artifacts for the reader/Task path when ``sample_rows`` is set.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np
import pandas as pd

from pytorchrec_tpu.data.schema import DatasetDescription, FeatureMeta
from pytorchrec_tpu.utils import constants as C

logger = logging.getLogger(__name__)

N_DENSE = 13
N_SPARSE = 26


def _prepare_chunk(chunk: pd.DataFrame, hash_bucket: int) -> pd.DataFrame:
    out = {}
    out[C.LABEL] = chunk.iloc[:, 0].fillna(0).astype(np.int32)
    for i in range(N_DENSE):
        col = pd.to_numeric(chunk.iloc[:, 1 + i], errors="coerce").fillna(0)
        out[f"d_{i}"] = np.log1p(np.clip(col.to_numpy(np.float64), 0, None)).astype(np.float32)
    for i in range(N_SPARSE):
        raw = chunk.iloc[:, 1 + N_DENSE + i]
        # hex string -> int; NaN/empty -> 0 (reserved); hash into [1, bucket)
        values = raw.fillna("")
        ids = np.zeros(len(values), np.int64)
        mask = values != ""
        if mask.any():
            ints = values[mask].map(lambda s: int(s, 16)).to_numpy(np.uint64)
            # splitmix-style scramble before the modulus for uniformity
            z = (ints + np.uint64(0x9E3779B97F4A7C15))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            ids[np.flatnonzero(mask.to_numpy())] = (
                (z % np.uint64(hash_bucket - 1)) + np.uint64(1)
            ).astype(np.int64)
        out[f"c_{i}"] = ids.astype(np.int32)
    return pd.DataFrame(out)


def format_criteo(
    dataset_name: str = "Criteo",
    raw_tsv: str = "criteo/train.txt",
    hash_bucket: int = 1_000_000,
    rows_per_shard: int = 1_000_000,
    sample_rows: Optional[int] = None,
    chunk_rows: int = 250_000,
) -> str:
    """Stream the raw TSV into sharded parquet; optionally also write the
    canonical reader-compatible artifacts from the first ``sample_rows``."""
    raw_path = os.path.join(C.raw_data_dir(), raw_tsv)
    out_dir = os.path.join(C.dataset_dir(), dataset_name)
    shard_dir = os.path.join(out_dir, "shards")
    os.makedirs(shard_dir, exist_ok=True)

    shard_index = 0
    buffered = []
    buffered_rows = 0
    total = 0
    sample_frames = []

    def flush():
        nonlocal shard_index, buffered, buffered_rows
        if not buffered:
            return
        df = pd.concat(buffered, ignore_index=True)
        df.to_parquet(os.path.join(shard_dir, f"part-{shard_index:05d}.parquet"))
        shard_index += 1
        buffered, buffered_rows = [], 0

    for chunk in pd.read_csv(raw_path, sep="\t", header=None,
                             chunksize=chunk_rows, dtype=str):
        prepared = _prepare_chunk(chunk, hash_bucket)
        if sample_rows and total < sample_rows:
            sample_frames.append(prepared.iloc[: sample_rows - total])
        total += len(prepared)
        buffered.append(prepared)
        buffered_rows += len(prepared)
        if buffered_rows >= rows_per_shard:
            flush()
    flush()
    logger.info("criteo: %d rows -> %d shards", total, shard_index)

    description = DatasetDescription(
        info=f"Criteo click log ({total} rows, hash bucket {hash_bucket})",
        base_features=[FeatureMeta(C.LABEL, C.CATEGORICAL_COLUMN)],
        context_features=(
            [FeatureMeta(f"d_{i}", C.NUMERIC_COLUMN) for i in range(N_DENSE)]
            + [FeatureMeta(f"c_{i}", C.CATEGORICAL_COLUMN,
                           {"vocab": hash_bucket}) for i in range(N_SPARSE)]
        ),
    )
    description.save(dataset_name)

    if sample_rows:
        df = pd.concat(sample_frames, ignore_index=True).iloc[:sample_rows].copy()
        # canonical reader skeleton (same recipe as generate_synthetic_ctr)
        rng = np.random.default_rng(0)
        n = len(df)
        df[C.UID] = rng.integers(1, max(2, n // 50) + 1, size=n).astype(np.int32)
        df[C.IID] = df["c_0"].astype(np.int32) + 1
        df[C.RATE] = df[C.LABEL].astype(np.int32)
        df[C.TIME] = np.arange(n, dtype=np.int32)
        df = df.sort_values(by=[C.UID, C.TIME], kind="stable").reset_index(drop=True)
        base = [C.UID, C.IID, C.RATE, C.LABEL, C.TIME]
        df[base].reset_index(drop=True).to_feather(
            os.path.join(out_dir, C.BASE_INTERACTION_FEATHER))
        df.reset_index(drop=True).to_feather(
            os.path.join(out_dir, C.INTERACTION_FEATHER))
        pd.DataFrame({C.IID: np.arange(1, int(df[C.IID].max()) + 1, dtype=np.int32)}
                     ).to_feather(os.path.join(out_dir, C.ITEM_FEATHER))
    return out_dir
