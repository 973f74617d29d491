"""Streaming input pipeline for datasets that do not fit in host RAM.

The in-memory readers (data/readers/) mirror the reference's
load-everything design (SimpleDataReader.py:160-189) — fine for
MovieLens/Amazon, impossible for full Criteo (4B rows). This pipeline
streams CTR-style rows from sharded parquet/CSV files:

* files are read chunk-by-chunk in a background thread (double-buffered),
* chunks are shuffled within a shuffle buffer and cut into fixed-shape
  batches (drop-remainder) so the jitted step never recompiles,
* each epoch can reshuffle the file order,
* under a mesh, per-host sharding falls out of giving each process its own
  file subset (``files[process_id::process_count]``) — the standard
  per-host data-sharding recipe.

Use with ``Trainer.fit_steps`` (step-driven, no dataset length needed).
"""

from __future__ import annotations

import glob
import logging
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

Batch = Dict[str, np.ndarray]


class StreamingBatchSource:
    """Fixed-shape batch stream over sharded columnar files."""

    def __init__(
        self,
        file_pattern: str | Sequence[str],
        batch_size: int,
        columns: Optional[Sequence[str]] = None,
        chunk_rows: int = 262_144,
        shuffle_buffer_chunks: int = 4,
        shuffle_files: bool = True,
        interleave_files: int = 4,
        seed: int = 2020,
        process_id: int = 0,
        process_count: int = 1,
        queue_depth: int = 4,
        transform: Optional[Callable[[Batch], Batch]] = None,
    ):
        if isinstance(file_pattern, str):
            files = sorted(glob.glob(file_pattern))
        else:
            files = list(file_pattern)
        assert files, f"no files match {file_pattern!r}"
        # per-host shard: process p reads files[p::n]
        self.files: List[str] = files[process_id::process_count]
        assert self.files, (
            f"process {process_id}/{process_count} got no files "
            f"({len(files)} total) — need at least one file per process"
        )
        self.batch_size = batch_size
        self.columns = list(columns) if columns else None
        self.chunk_rows = chunk_rows
        self.shuffle_buffer_chunks = shuffle_buffer_chunks
        self.shuffle_files = shuffle_files
        self.interleave_files = max(1, interleave_files)
        self.rng = np.random.default_rng(seed + process_id)
        self.queue_depth = queue_depth
        # per-chunk column transform (e.g. data.vocab.VocabMapper) — runs on
        # the producer thread, before batching, so batch shapes stay fixed
        self.transform = transform

    # ------------------------------------------------------------------

    def _read_file_chunks(self, path: str) -> Iterator[pd.DataFrame]:
        if path.endswith(".parquet"):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(path)
            for record_batch in pf.iter_batches(batch_size=self.chunk_rows,
                                                columns=self.columns):
                yield record_batch.to_pandas()
        elif path.endswith(".feather"):
            df = pd.read_feather(path, columns=self.columns)
            for start in range(0, len(df), self.chunk_rows):
                yield df.iloc[start : start + self.chunk_rows]
        else:  # csv / tsv
            sep = "\t" if path.endswith((".tsv", ".txt")) else ","
            yield from pd.read_csv(path, sep=sep, chunksize=self.chunk_rows,
                                   usecols=self.columns)

    def _chunk_to_columns(self, df: pd.DataFrame) -> Batch:
        return {name: np.ascontiguousarray(df[name].to_numpy()) for name in df.columns}

    def _epoch_chunks(self) -> Iterator[Batch]:
        """Round-robin over up to ``interleave_files`` open files so
        consecutive chunks come from different shards (cheap global mix
        before the shuffle buffer)."""
        files = list(self.files)
        if self.shuffle_files:
            self.rng.shuffle(files)
        pending = files[::-1]  # pop() order = shuffled order
        open_iters: List[Iterator[pd.DataFrame]] = []
        while pending and len(open_iters) < self.interleave_files:
            open_iters.append(self._read_file_chunks(pending.pop()))
        while open_iters:
            for it in list(open_iters):
                chunk = next(it, None)
                if chunk is None:
                    open_iters.remove(it)
                    if pending:
                        open_iters.append(self._read_file_chunks(pending.pop()))
                    continue
                columns = self._chunk_to_columns(chunk)
                if self.transform is not None:
                    columns = self.transform(columns)
                yield columns

    def batches(self, epochs: Optional[int] = None) -> Iterator[Batch]:
        """Yield fixed-shape batches; ``epochs=None`` streams forever."""
        out: "queue.Queue" = queue.Queue(maxsize=self.queue_depth)
        stop = object()
        error: list = []

        def producer():
            try:
                epoch = 0
                while epochs is None or epoch < epochs:
                    buffer: List[Batch] = []
                    carry: Optional[Batch] = None
                    for chunk in self._epoch_chunks():
                        buffer.append(chunk)
                        if len(buffer) >= self.shuffle_buffer_chunks:
                            carry = self._drain(buffer, carry, out)
                            buffer = []
                    self._drain(buffer, carry, out, final=True)
                    epoch += 1
            except BaseException as e:
                error.append(e)
            finally:
                out.put(stop)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out.get()
            if item is stop:
                if error:
                    raise error[0]
                return
            yield item

    def _drain(self, buffer: List[Batch], carry: Optional[Batch], out,
               final: bool = False) -> Optional[Batch]:
        """Shuffle buffered chunks together, emit full batches, keep the
        remainder as carry (dropped at epoch end — drop_last semantics)."""
        parts = ([carry] if carry is not None else []) + buffer
        if not parts:
            return None
        keys = parts[0].keys()
        merged = {k: np.concatenate([p[k] for p in parts]) for k in keys}
        n = len(next(iter(merged.values())))
        order = self.rng.permutation(n)
        merged = {k: v[order] for k, v in merged.items()}
        n_batches = n // self.batch_size
        for b in range(n_batches):
            start = b * self.batch_size
            out.put({k: v[start : start + self.batch_size] for k, v in merged.items()})
        if final:
            return None
        rest = n_batches * self.batch_size
        return {k: v[rest:] for k, v in merged.items()}
