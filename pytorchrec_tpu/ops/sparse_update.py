"""Sparse-row (lazy) optimizer updates for embedding tables.

The dense-optimizer cost model on TPU: Adam over a [V, E] table reads and
writes params + both moments for every row, every step — ~6 x V x E x 4
bytes of HBM traffic even when the batch touches only B x F rows. These
kernels update ONLY the touched rows, with static shapes throughout (no
``jnp.unique`` — duplicate ids are combined with a sort + segment-sum whose
segment count is the static batch size).

Semantics = "lazy Adam" (torch ``SparseAdam``-style): moments of untouched
rows do not decay; bias correction uses the global step. ``sparse_adagrad``
is the Adagrad variant (the BASELINE.json sparse-table staple).

Scatter efficiency: ``dedup_row_grads`` emits ids that are SORTED and (when
``pad_id_base`` is given) strictly UNIQUE — padding slots get ascending
out-of-range ids instead of aliasing a real row — so the moment/table
gathers and scatters can carry ``indices_are_sorted`` / ``unique_indices``
hints and XLA lowers them to the vectorized path instead of the serializing
general-scatter combiner.

All functions are pure and jit-friendly; tables/moments are donated by the
caller's train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SparseRowGrad(NamedTuple):
    """Deduplicated row gradients: ``rows[i]`` applies to ``ids[i]``;
    ``mask[i]=0`` marks padding. ``ids`` are sorted ascending; with
    ``pad_id_base`` padding ids are out-of-range and strictly unique."""

    ids: jnp.ndarray    # [n] int32, sorted ascending
    rows: jnp.ndarray   # [n, E]
    mask: jnp.ndarray   # [n] 0/1


def dedup_row_grads(ids: jnp.ndarray, dvec: jnp.ndarray,
                    pad_id_base: Optional[int] = None) -> SparseRowGrad:
    """Combine duplicate ids by summing their row grads (static shapes).

    ``ids [n]``, ``dvec [n, E]`` -> SparseRowGrad with n slots; the first
    ``#unique`` slots hold summed grads, the rest are masked padding.

    ``pad_id_base`` (e.g. the table's row count): padding slots get ids
    ``pad_id_base + slot`` — out of range, strictly ascending and unique, so
    downstream scatters may use ``mode='drop'`` with
    ``unique_indices=indices_are_sorted=True``. Without it, padding aliases
    the last unique id (zero update via ``mask``; only safe for
    scatter-ADD).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    sorted_dvec = dvec[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    segment = jnp.cumsum(is_start) - 1  # [n], values in [0, #unique)
    rows = jax.ops.segment_sum(sorted_dvec, segment, num_segments=n)
    # id of each segment = id at its first element
    seg_ids = jax.ops.segment_max(sorted_ids, segment, num_segments=n)
    n_unique = segment[-1] + 1
    slot = jnp.arange(n)
    mask = (slot < n_unique).astype(dvec.dtype)
    if pad_id_base is None:
        # padding slots alias the last unique id (harmless for masked ADD)
        safe_ids = jnp.where(slot < n_unique, seg_ids, sorted_ids[-1])
    else:
        safe_ids = jnp.where(slot < n_unique, seg_ids, pad_id_base + slot)
    return SparseRowGrad(ids=safe_ids.astype(jnp.int32), rows=rows, mask=mask)


def _take_rows(array: jnp.ndarray, ids: jnp.ndarray,
               sorted_unique: bool) -> jnp.ndarray:
    return jnp.take(array, ids, axis=0, mode="clip",
                    indices_are_sorted=sorted_unique,
                    unique_indices=sorted_unique)


def sparse_lazy_adam(
    table: jnp.ndarray,  # [V, E]
    m: jnp.ndarray,      # [V, E]
    v: jnp.ndarray,      # [V, E]
    ids: jnp.ndarray,    # [n] (may contain duplicates)
    dvec: jnp.ndarray,   # [n, E]
    step: jnp.ndarray,   # global step (1-based for bias correction)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-sparse Adam: returns (table, m, v) with only touched rows changed."""
    g = dedup_row_grads(ids, dvec, pad_id_base=table.shape[0])
    mask = g.mask[:, None]

    m_rows = _take_rows(m, g.ids, True)
    v_rows = _take_rows(v, g.ids, True)
    new_m = b1 * m_rows + (1.0 - b1) * g.rows
    new_v = b2 * v_rows + (1.0 - b2) * jnp.square(g.rows)

    step = step.astype(jnp.float32)
    m_hat = new_m / (1.0 - b1 ** step)
    v_hat = new_v / (1.0 - b2 ** step)
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)

    # sorted-unique scatters; padding ids are out of range -> dropped
    flags = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
    table = table.at[g.ids].add(-delta * mask, **flags)
    m = m.at[g.ids].add((new_m - m_rows) * mask, **flags)
    v = v.at[g.ids].add((new_v - v_rows) * mask, **flags)
    return table, m, v


PACKED_COLS = {"adam": lambda e: 3 * e, "adagrad": lambda e: 2 * e,
               "rowwise_adagrad": lambda e: e + 1}

# Fast-path width rule, measured on the v5e (2026-08-17, fetch-forced slope
# over 852k rows of a [2.6M, W] table): XLA's row gather/scatter switches to
# a vectorized emitter at W >= 64 f32 columns (256 B rows) — scatter-set
# drops 92.7 -> 13.7 ms (W 16 -> 64) and 6.7 ms at W=128; gather 17.7 ->
# 11.6/8.5 ms. Below 64 every row op pays the ~100 ns/row serialized path.
_FAST_WIDTH = 64


def f32_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """[..., k] f32 -> [..., 4k] uint8 (bit view, platform byte order)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)  # [..., k, 4]
    return b.reshape(*x.shape[:-1], x.shape[-1] * 4)


def bytes_to_f32(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 4k] uint8 -> [..., k] f32 (inverse bit view)."""
    k = b.shape[-1] // 4
    return jax.lax.bitcast_convert_type(
        b.reshape(*b.shape[:-1], k, 4), jnp.float32)


def packed_width(emb_dim: int, optimizer: str,
                 min_width: int = _FAST_WIDTH) -> int:
    """Total packed row width: moments columns plus >= emb_dim padding
    columns (the padding stages the per-occurrence grads through the
    permute), rounded up to the vectorized-emitter multiple.

    ``min_width``: 64 = the fast-path threshold; 128 (a full 512-byte
    vector row) is ~1.5x faster still on scatters (6.7 vs 13.7 ms at
    852k rows) at the cost of proportionally more table HBM."""
    assert min_width % _FAST_WIDTH == 0, min_width
    need = PACKED_COLS[optimizer](emb_dim) + emb_dim
    return max(min_width, -(-need // _FAST_WIDTH) * _FAST_WIDTH)


def pack_table(table: jnp.ndarray, optimizer: str,
               min_width: int = _FAST_WIDTH,
               dtype: jnp.dtype = None) -> jnp.ndarray:
    """[V, E] table -> [V, W] packed row: table columns, zero-initialized
    optimizer moments (m||v / acc / row-acc), grad-staging padding.

    ``dtype`` (default: the table's own) sets the STORAGE dtype of the whole
    packed row — bf16 halves every row pass's bytes (the latency-optimal
    exact-ish layout; optimizer math stays f32 inside packed_sparse_update,
    storage rounds to nearest-even on write)."""
    v, e = table.shape
    if dtype is not None:
        table = table.astype(dtype)
    extra = packed_width(e, optimizer, min_width) - e
    return jnp.concatenate([table, jnp.zeros((v, extra), table.dtype)], axis=1)


def unpack_table(packed: jnp.ndarray, emb_dim: int) -> jnp.ndarray:
    """[V, W] packed row -> the [V, emb_dim] table columns."""
    return packed[:, :emb_dim]


# Flag representation A/B (scripts/scan_flags_ab.py, v5e 2026-08-19):
# ISOLATED, bool flags are 6.8x slower than f32 0/1 flags (1.49 vs 0.22 ms
# / 3 passes at n=852k — XLA's bit-packed pred layout hits a serialized
# emitter). END-TO-END the ranking inverts: the f32-packed step drops
# 730.9k -> 623.1k ex/s with f32 flags (the pred work fuses into
# neighboring passes for free, while f32 flags add real HBM traffic and a
# fatter cond carry); int8-packed is a wash (872k both). Bool stays the
# default; the toggle preserves the measured alternative.
_PRED_FLAGS = True


def _scan_passes(x, done, start_d, end_d):
    d = start_d
    while d < end_d:
        shifted_x = jnp.concatenate([jnp.zeros((d, x.shape[1]), x.dtype),
                                     x[:-d]], axis=0)
        if _PRED_FLAGS:
            shifted_done = jnp.concatenate([jnp.ones((d,), bool), done[:-d]])
            x = x + jnp.where(done[:, None], 0.0, shifted_x)
            done = done | shifted_done
        else:
            shifted_done = jnp.concatenate(
                [jnp.ones((d,), jnp.float32), done[:-d]])
            x = x + (1.0 - done)[:, None] * shifted_x
            done = jnp.maximum(done, shifted_done)
        d *= 2
    return x, done


# Segments up to this length are covered by the eager passes; longer runs
# fall to the lax.cond tail (exactness never depends on the value). At the
# bench id distribution (32k draws over 100k vocab per field, mean
# multiplicity 0.33) P(run > 8) ~ 3e-4 per step, so 3 eager passes cover
# essentially every step and the 4th pass (~1.9 ms at n=852k) never earns
# its keep; Zipf-skewed batches fire the tail either way (hot ids belong in
# the hot/cold replicated fragment, not this path).
_EAGER_DEPTH = 8


def _segmented_sum_scan(x: jnp.ndarray, is_start: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive sum scan (Hillis-Steele): ``x [n, E]`` rows in
    segment-sorted order, ``is_start [n]`` marking segment heads. Returns
    per-position running sums — each segment's LAST slot holds its total.

    Pure shift/where/add passes, so it avoids the serialized non-unique
    scatter-add that ``jax.ops.segment_sum`` lowers to. Each pass still
    costs ~1.9 ms at n=852k on the v5e (the shifted loop fusion runs at
    ~5% of stream rate), so depth is ADAPTIVE: segments are duplicate runs
    of one id, which on hashed/uniform id streams are short (max ~8 at the
    bench shapes) — the first log2(_EAGER_DEPTH) passes run eagerly and the
    remaining passes sit behind a ``lax.cond`` on the actual max run
    length, firing only for skewed batches (where they're needed for
    exactness)."""
    n = x.shape[0]
    flags = is_start if _PRED_FLAGS else is_start.astype(jnp.float32)
    if n <= 2 * _EAGER_DEPTH:
        x, _ = _scan_passes(x, flags, 1, n)
        return x

    x, done = _scan_passes(x, flags, 1, _EAGER_DEPTH)

    # done[i] == "a segment head lies within the last _EAGER_DEPTH slots",
    # so all(done) <=> every duplicate run fit the eager passes — no extra
    # max-run computation needed
    def tail(args):
        return _scan_passes(args[0], args[1], _EAGER_DEPTH, n)[0]

    all_done = jnp.all(done) if _PRED_FLAGS else jnp.min(done) > 0.5
    return jax.lax.cond(all_done, lambda args: args[0], tail, (x, done))


def segmented_sum_scan(x: jnp.ndarray, is_start: jnp.ndarray,
                       emb_dim: int = None) -> jnp.ndarray:
    """Dispatcher. ``x`` must be an ``[n, E]`` EMBEDDING-dim slice — the
    auto-enable keys on the embedding dim, so callers holding a wider
    packed/wire row (W >= 64 even at E=16, where the kernel measurably
    loses 8.5 ms/step) must pass ``emb_dim`` explicitly rather than let
    the operand width decide (ADVICE r4). The Pallas single-HBM-pass
    kernel (ops/kernels/seg_scan.py) auto-enables on TPU at E >= 64 — the
    measured crossover (`scripts/seg_scan_e_ab.py`, interleaved
    same-window A/B, v5e-1):

    * E=16 (bench config): the kernel LOSES 8.5 ms end-to-end (763.3k ->
      603.7k ex/s, 2026-08-18) — the custom-call is a fusion barrier and
      XLA can no longer fuse the scan's shift/adds into the surrounding
      permute/optimizer elementwise chain;
    * E=64: kernel WINS +3.6% (336.0k vs 324.4k ex/s, -35 ms/step);
    * E=128: kernel WINS +13% (168.6k vs 149.2k, -253 ms/step) — at
      large E the scan's O(depth) HBM traffic dominates the lost fusion.

    ``PYTORCHREC_TPU_SEG_SCAN_PALLAS=1`` forces it on, ``=0`` off."""
    import os

    from pytorchrec_tpu.ops.kernels import use_pallas_default

    flag = os.environ.get("PYTORCHREC_TPU_SEG_SCAN_PALLAS")
    e = x.shape[-1] if emb_dim is None else emb_dim
    want = e >= 64 if flag is None or flag == "" else flag != "0"
    if want and use_pallas_default() and x.shape[0] >= 512:
        from pytorchrec_tpu.ops.kernels.seg_scan import segmented_sum_scan_pallas

        return segmented_sum_scan_pallas(x, is_start)
    return _segmented_sum_scan(x, is_start)


def packed_sparse_update(
    packed: jnp.ndarray,   # [V, W] table||moments||staging rows (pack_table)
    rows: jnp.ndarray,     # [n, W] the forward gather of packed at ids
    ids: jnp.ndarray,      # [n] per-occurrence ids (duplicates allowed)
    dvec: jnp.ndarray,     # [n, E] per-occurrence row grads
    step: jnp.ndarray,     # global step (1-based, adam bias correction)
    lr: float,
    optimizer: str = "adam",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Row-sparse update over a PACKED table+moments buffer — the
    latency-optimal layout on TPU.

    Cost model (v5e, measured — RESULTS.md correction section): below 64
    f32 columns XLA's row gather/scatter takes a serialized ~100 ns/row
    path, and non-unique scatter-add (what segment_sum lowers to) is slow
    at EVERY width. This update therefore uses exactly 2 fast-width row
    passes beyond the caller's forward gather:

    1. ONE permute of the gathered [n, W] rows into id-sorted order — the
       per-occurrence grads are first staged into the packed row's padding
       columns, so grads, table and moments all move together;
    2. duplicate grads combined by a segmented Hillis-Steele scan (pure
       elementwise shift/add passes at HBM rate — no scatter);
    3. ONE absolute-value scatter-set of the new packed rows from each
       segment's last slot (sorted, unique, fast width).

    Same lazy semantics as sparse_lazy_adam/sparse_adagrad/
    sparse_rowwise_adagrad (untouched rows keep stale moments; adam bias
    correction uses the global step).

    ``rows`` MUST be ``stop_grad(packed)[ids]`` from the same step (the
    pre-update values the optimizer math needs — re-gathering here would
    waste a per-row pass).

    The packed leaf may be a NARROW dtype (bf16 — SparseEmbeddingTrainer's
    ``packed_dtype``): every row pass then moves half the bytes (the width
    rule says fewer bytes win once the column count vectorizes, and unlike
    the rejected byte-packed f32 layout there is no bitcast/reshape around
    the row ops — dtype converts are single fused elementwise ops). All
    optimizer arithmetic stays f32; table/moments/staged-grads round to the
    storage dtype on write.
    """
    n = ids.shape[0]
    e = dvec.shape[1]
    w = packed.shape[1]
    c = PACKED_COLS[optimizer](e)
    assert w >= c + e, (w, c, e)

    # variadic sort returns the sorted keys alongside the permutation —
    # a separate sorted_ids = ids[order] would be a narrow 1-D gather that
    # serializes (~6 ms at n=852k, measured)
    sorted_ids, order = jax.lax.sort(
        (ids, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # row-assembly variant (scripts/f32_select_ab.py): "select" builds
    # staged/out rows from elementwise where/pad-add fusions instead of
    # concatenates. Measured on-chip (v5e-1 2026-08-20, interleaved
    # windows): the f32 path LOSES 14.5% under select (620.4k vs 725.2k
    # ex/s) — unlike the int8 twin (+1.5%, ops/quantized_packed.py) there
    # are no u8 major-flip copies to delete here, so the pad-adds only
    # add HBM traffic. Concatenate stays the default; the flag remains
    # for A/B.
    import os

    select_rows = os.environ.get("PYTORCHREC_TPU_PACK_VARIANT", "") == \
        "select"
    # stage grads in the padding columns -> ONE fast-width permute moves
    # grads, table and moments together
    if select_rows:
        col = jnp.arange(w, dtype=jnp.int32)[None, :]
        staged = jnp.where(
            col < c, rows,
            jnp.pad(dvec.astype(rows.dtype), ((0, 0), (c, w - c - e))))
    else:
        staged = jnp.concatenate(
            [rows[:, :c], dvec.astype(rows.dtype),
             jnp.zeros((n, w - c - e), rows.dtype)], axis=1)
    moved = staged[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_last = jnp.concatenate(
        [sorted_ids[1:] != sorted_ids[:-1], jnp.ones((1,), bool)]
    )
    # duplicate grads sum via the segmented scan; each segment's LAST slot
    # holds the total. t/m/v are identical across a segment (same source
    # row), so the last slot already carries them — no reduction needed.
    # The scan accumulates in f32 regardless of storage dtype (the convert
    # fuses into the scan's first shift/add pass).
    g = segmented_sum_scan(moved[:, c:c + e].astype(jnp.float32), is_start)
    t_old = moved[:, :e].astype(jnp.float32)

    if optimizer == "adam":
        m_old = moved[:, e:2 * e].astype(jnp.float32)
        v_old = moved[:, 2 * e:3 * e].astype(jnp.float32)
        new_m = b1 * m_old + (1.0 - b1) * g
        new_v = b2 * v_old + (1.0 - b2) * jnp.square(g)
        s = step.astype(jnp.float32)
        delta = lr * (new_m / (1.0 - b1 ** s)) / (
            jnp.sqrt(new_v / (1.0 - b2 ** s)) + eps)
        pieces = [(t_old - delta, 0), (new_m, e), (new_v, 2 * e)]
    elif optimizer == "adagrad":
        acc_old = moved[:, e:2 * e].astype(jnp.float32)
        new_acc = acc_old + jnp.square(g)
        delta = lr * g / (jnp.sqrt(new_acc) + 1e-10)
        pieces = [(t_old - delta, 0), (new_acc, e)]
    else:  # rowwise_adagrad
        acc_old = moved[:, e].astype(jnp.float32)
        new_acc = acc_old + jnp.mean(jnp.square(g), axis=-1)
        delta = lr * g / (jnp.sqrt(new_acc)[:, None] + eps)
        pieces = [(t_old - delta, 0), (new_acc[:, None], e)]

    if select_rows:
        new_packed = sum(
            jnp.pad(p.astype(packed.dtype),
                    ((0, 0), (s, w - s - p.shape[1])))
            for p, s in pieces)
    else:
        body = jnp.concatenate([p for p, _ in pieces], axis=1)
        body = body.astype(packed.dtype)
        pad = jnp.zeros((n, w - body.shape[1]), packed.dtype)
        new_packed = jnp.concatenate([body, pad], axis=1)
    # scatter only each segment's last slot; the rest route out of range
    slot = jnp.arange(n)
    safe_ids = jnp.where(is_last, sorted_ids,
                         packed.shape[0] + slot).astype(jnp.int32)
    return packed.at[safe_ids].set(
        new_packed, mode="drop", unique_indices=True)


def packed_bytes_width(emb_dim: int, optimizer: str,
                       min_width: int = _FAST_WIDTH) -> int:
    """Byte-row width for the f32-exact BYTE-packed layout.

    The int-dtype probe (RESULTS.md width rule, 2026-08-18) showed the
    vectorized row emitter keys on COLUMN COUNT (>= 64), not bytes, and
    once vectorized FEWER BYTES WIN (uint8 [852k, 128] scatter 3.7 ms vs
    f32 [852k, 64] = 256 B 13.7 ms). Viewing the f32 fields as bytes
    therefore removes the f32 layout's padding waste: rowwise-Adagrad at
    E=16 needs table(64 B) + acc(4 B) + grad staging(64 B) = 132 B -> a
    192-column uint8 row, vs the f32 layout's pad-to-64-f32-columns
    = 256 B. Exact f32 numerics — fields are bitcast, never converted."""
    need = 4 * PACKED_COLS[optimizer](emb_dim) + 4 * emb_dim
    return max(min_width, -(-need // _FAST_WIDTH) * _FAST_WIDTH)


def pack_table_bytes(table: jnp.ndarray, optimizer: str,
                     min_width: int = _FAST_WIDTH) -> jnp.ndarray:
    """[V, E] f32 table -> [V, W] uint8 row: bitcast table columns,
    zero-initialized optimizer fields, grad-staging padding."""
    v, e = table.shape
    w = packed_bytes_width(e, optimizer, min_width)
    cols = PACKED_COLS[optimizer](e)
    body = f32_to_bytes(jnp.concatenate(
        [table.astype(jnp.float32),
         jnp.zeros((v, cols - e), jnp.float32)], axis=1))
    return jnp.concatenate(
        [body, jnp.zeros((v, w - body.shape[1]), jnp.uint8)], axis=1)


def unpack_table_bytes(packed: jnp.ndarray, emb_dim: int) -> jnp.ndarray:
    """[V, W] uint8 packed row -> the [V, emb_dim] f32 table columns."""
    return bytes_to_f32(packed[:, :4 * emb_dim])


def packed_sparse_update_bytes(
    packed: jnp.ndarray,   # [V, W] uint8 rows (pack_table_bytes)
    rows: jnp.ndarray,     # [n, W] the forward gather of packed at ids
    ids: jnp.ndarray,      # [n] per-occurrence ids (duplicates allowed)
    dvec: jnp.ndarray,     # [n, E] per-occurrence f32 row grads
    step: jnp.ndarray,     # global step (1-based, adam bias correction)
    lr: float,
    optimizer: str = "adam",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """``packed_sparse_update`` over BYTE rows: identical math and pass
    structure (one combined permute, segmented-scan dedup, one sorted-unique
    scatter-set), but every row op moves uint8 columns, which the v5e's
    vectorized emitter handles strictly faster per byte (width rule,
    RESULTS.md). Updates are bit-identical to the f32 packed layout: the
    f32 fields are bitcast in and out, and the optimizer arithmetic is the
    same ops in the same order."""
    n, e = dvec.shape
    w = packed.shape[1]
    c = PACKED_COLS[optimizer](e)
    base = 4 * c
    assert w >= base + 4 * e, (w, base, e)

    sorted_ids, order = jax.lax.sort(
        (ids, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    staged = jnp.concatenate(
        [rows[:, :base], f32_to_bytes(dvec),
         jnp.zeros((n, w - base - 4 * e), jnp.uint8)], axis=1)
    moved = staged[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_last = jnp.concatenate(
        [sorted_ids[1:] != sorted_ids[:-1], jnp.ones((1,), bool)]
    )
    g = segmented_sum_scan(bytes_to_f32(moved[:, base:base + 4 * e]),
                           is_start, emb_dim=e)
    fields = bytes_to_f32(moved[:, :base])  # [n, c] t||moments
    t_old = fields[:, :e]

    if optimizer == "adam":
        m_old, v_old = fields[:, e:2 * e], fields[:, 2 * e:3 * e]
        new_m = b1 * m_old + (1.0 - b1) * g
        new_v = b2 * v_old + (1.0 - b2) * jnp.square(g)
        s = step.astype(jnp.float32)
        delta = lr * (new_m / (1.0 - b1 ** s)) / (
            jnp.sqrt(new_v / (1.0 - b2 ** s)) + eps)
        new_fields = jnp.concatenate([t_old - delta, new_m, new_v], axis=1)
    elif optimizer == "adagrad":
        acc_old = fields[:, e:2 * e]
        new_acc = acc_old + jnp.square(g)
        delta = lr * g / (jnp.sqrt(new_acc) + 1e-10)
        new_fields = jnp.concatenate([t_old - delta, new_acc], axis=1)
    else:  # rowwise_adagrad
        acc_old = fields[:, e]
        new_acc = acc_old + jnp.mean(jnp.square(g), axis=-1)
        delta = lr * g / (jnp.sqrt(new_acc)[:, None] + eps)
        new_fields = jnp.concatenate(
            [t_old - delta, new_acc[:, None]], axis=1)

    out = jnp.concatenate(
        [f32_to_bytes(new_fields),
         jnp.zeros((n, w - base), jnp.uint8)], axis=1)
    slot = jnp.arange(n)
    safe_ids = jnp.where(is_last, sorted_ids,
                         packed.shape[0] + slot).astype(jnp.int32)
    return packed.at[safe_ids].set(out, mode="drop", unique_indices=True)


def sparse_rowwise_adagrad(
    table: jnp.ndarray,  # [V, E]
    accum: jnp.ndarray,  # [V] — ONE scalar second-moment per row
    ids: jnp.ndarray,
    dvec: jnp.ndarray,
    lr: float,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise Adagrad: the standard production embedding optimizer
    (DLRM-style; the reference's torch Adam carries 2 full [V, E] moment
    tables — `optim` rows in SURVEY §2.7 — this carries [V] floats).

    ``acc[row] += mean(g_row**2)``; ``row -= lr * g_row / (sqrt(acc) + eps)``.
    Optimizer HBM traffic per touched row drops from 4·E floats (adagrad) or
    8·E (adam moments) to 2 floats — the sparse-update step becomes
    table-read/write bound. Same math as the quantized trainer's internal
    accumulator (training/quantized_trainer.py:149-151), exposed for f32
    tables.
    """
    g = dedup_row_grads(ids, dvec, pad_id_base=table.shape[0])
    acc_rows = jnp.take(accum, g.ids, mode="clip",
                        indices_are_sorted=True, unique_indices=True)
    new_acc = acc_rows + jnp.mean(jnp.square(g.rows), axis=-1)
    delta = lr * g.rows / (jnp.sqrt(new_acc)[:, None] + eps)
    flags = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
    table = table.at[g.ids].add(-delta * g.mask[:, None], **flags)
    accum = accum.at[g.ids].add((new_acc - acc_rows) * g.mask, **flags)
    return table, accum


def sparse_adagrad(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    ids: jnp.ndarray,
    dvec: jnp.ndarray,
    lr: float,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sparse Adagrad: returns (table, accumulator)."""
    g = dedup_row_grads(ids, dvec, pad_id_base=table.shape[0])
    mask = g.mask[:, None]
    acc_rows = _take_rows(accum, g.ids, True)
    new_acc = acc_rows + jnp.square(g.rows)
    delta = lr * g.rows / (jnp.sqrt(new_acc) + eps)
    flags = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
    table = table.at[g.ids].add(-delta * mask, **flags)
    accum = accum.at[g.ids].add((new_acc - acc_rows) * mask, **flags)
    return table, accum
