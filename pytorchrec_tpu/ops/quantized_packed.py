"""Packed BYTE-row layout for quantized embedding tables.

The measured v5e row-op rule (RESULTS.md, int-dtype probe 2026-08-18): the
vectorized gather/scatter emitter switches on COLUMN COUNT (>= 64), not
bytes, and once vectorized fewer bytes win — an int8 [852k, 128] scatter
runs 3.7 ms where the classic quantized trainer's 16-24 BYTE q/scale/acc
rows each pay the serialized ~100 ns/row path. This module therefore packs
everything the quantized update touches into ONE uint8 row:

    [0, qb)             q bytes (qb = E for int8, E/2 nibble-packed int4)
    [qb, qb+4G)         per-row scale f32 (G column groups), bitcast
    [qb+4G, qb+4G+4)    rowwise-Adagrad accumulator f32, bitcast
    [base, base+4E)     f32 row-grad staging (rides the update permute)
    [base+4E, W)        zero pad to the 64-column multiple

so the train step runs exactly 3 fast row passes (forward gather, one
combined permute inside the update, one scatter) — the same shape as the
f32 packed path (ops/sparse_update.py::packed_sparse_update) at half the
bytes (W=128 vs 256 at E=16).

Numerics are identical to the classic QuantizedEmbeddingTrainer update
(dequantize -> rowwise Adagrad -> stochastic requantize,
training/quantized_trainer.py): f32 fields are bitcast, never converted.

Reference analogue: the quantized-embedding idea itself mirrors
production DLRM int8 tables; the reference stores f32 torch embeddings
(model/FunkSVD.py:40-41) — this layout is the TPU-native densification.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pytorchrec_tpu.ops.kernels.quantize import dequantize_rows, quantize_rows_xla
from pytorchrec_tpu.ops.sparse_update import (
    _FAST_WIDTH,
    bytes_to_f32,
    f32_to_bytes,
    segmented_sum_scan,
)


def q_row_bytes(emb_dim: int, bits: int) -> int:
    assert bits in (8, 4)
    assert bits == 8 or emb_dim % 2 == 0
    return emb_dim if bits == 8 else emb_dim // 2


def packed_q_base(emb_dim: int, bits: int, col_groups: int) -> int:
    """Byte offset of the grad-staging region (= bytes of q + scale + acc)."""
    return q_row_bytes(emb_dim, bits) + 4 * col_groups + 4


def packed_q_width(emb_dim: int, bits: int, col_groups: int = 1,
                   min_width: int = _FAST_WIDTH) -> int:
    need = packed_q_base(emb_dim, bits, col_groups) + 4 * emb_dim
    return max(min_width, -(-need // _FAST_WIDTH) * _FAST_WIDTH)


# bit-view helpers shared with the f32 byte-packed layout
_f32_to_bytes = f32_to_bytes
_bytes_to_f32 = bytes_to_f32


def pack_quantized_table(q: jnp.ndarray, scale: jnp.ndarray,
                         acc: jnp.ndarray, emb_dim: int, bits: int = 8,
                         col_groups: int = 1,
                         min_width: int = _FAST_WIDTH) -> jnp.ndarray:
    """(q [V, qb] int8, scale [V] or [V, G] f32, acc [V] f32) -> [V, W] u8."""
    v = q.shape[0]
    scale2 = scale[:, None] if scale.ndim == 1 else scale
    assert scale2.shape == (v, col_groups), (scale.shape, col_groups)
    w = packed_q_width(emb_dim, bits, col_groups, min_width)
    base = packed_q_base(emb_dim, bits, col_groups)
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(q, jnp.uint8),
        _f32_to_bytes(scale2),
        _f32_to_bytes(acc[:, None]),
        jnp.zeros((v, w - base), jnp.uint8),
    ], axis=1)


def unpack_quantized_table(packed: jnp.ndarray, emb_dim: int, bits: int = 8,
                           col_groups: int = 1,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[V, W] u8 -> (q int8, scale [V] or [V, G], acc [V]) — pack inverse."""
    qb = q_row_bytes(emb_dim, bits)
    q = jax.lax.bitcast_convert_type(packed[:, :qb], jnp.int8)
    scale = _bytes_to_f32(packed[:, qb:qb + 4 * col_groups])
    acc = _bytes_to_f32(packed[:, qb + 4 * col_groups:qb + 4 * col_groups + 4])
    if col_groups == 1:
        scale = scale[:, 0]
    return q, scale, acc[:, 0]


def dequant_packed_rows(rows: jnp.ndarray, emb_dim: int, bits: int = 8,
                        col_groups: int = 1) -> jnp.ndarray:
    """[n, W] u8 packed rows -> [n, E] f32 dequantized embedding rows."""
    qb = q_row_bytes(emb_dim, bits)
    q = jax.lax.bitcast_convert_type(rows[:, :qb], jnp.int8)
    scale = _bytes_to_f32(rows[:, qb:qb + 4 * col_groups])
    if col_groups == 1:
        scale = scale[:, 0]
    return dequantize_rows(q, scale, bits=bits, col_groups=col_groups)


def packed_table_init(emb_dim: int, bits: int = 8, col_groups: int = 1,
                      init=None, chunk: int = 2_000_000):
    """Flax param initializer factory for a packed quantized table leaf:
    ``self.param("x_q", packed_table_init(E, bits, G), (vocab,))`` declares
    the ``[vocab, packed_q_width(...)]`` uint8 q||scale||acc||staging rows
    seeded from ``init(rng, (n, E))`` f32 rows (default: the embedding
    layer's normal(0, 0.01)).

    Chunked: the normal->quantize->pack chain keeps several [V, E] f32
    temporaries live inside the one init jit — at 26M rows that transient
    peak OOMs a 16 GB chip even though the packed result is 3.3 GB.

    Shared by every model that offers int8/int4 byte-row tables (the CTR
    family's ``unified_q``, DIN's item table, ...)."""
    from pytorchrec_tpu.ops.embedding import normal_init
    from pytorchrec_tpu.ops.kernels.quantize import quantize_rows_xla

    assert bits in (8, 4)
    assert bits == 8 or emb_dim % 2 == 0, "int4 packing needs even emb_size"
    assert emb_dim % col_groups == 0, (emb_dim, col_groups)
    row_init = init if init is not None else normal_init

    def _pack_chunk(rng, n):
        rows = row_init(rng, (n, emb_dim))
        q, s = quantize_rows_xla(rows, bits=bits, col_groups=col_groups)
        acc = jnp.zeros((n,), jnp.float32)
        return pack_quantized_table(q, s, acc, emb_dim, bits, col_groups)

    def packed_init(rng, shape):
        n = shape[0]
        if n <= chunk:
            return _pack_chunk(rng, n)
        parts = [
            _pack_chunk(jax.random.fold_in(rng, i), min(chunk, n - start))
            for i, start in enumerate(range(0, n, chunk))
        ]
        return jnp.concatenate(parts)

    return packed_init


def packed_gather_dequant(packed: jnp.ndarray, ids: jnp.ndarray,
                          emb_dim: int, bits: int = 8,
                          col_groups: int = 1) -> jnp.ndarray:
    """``[ids..., E]`` f32 rows gathered+dequantized from a ``[V, W]`` u8
    packed leaf (forward path when no trainer injects rows)."""
    flat = jnp.reshape(packed[jnp.reshape(ids, (-1,))], (-1, packed.shape[1]))
    rows = dequant_packed_rows(flat, emb_dim, bits, col_groups)
    return jnp.reshape(rows, (*ids.shape, emb_dim))


def packed_quantized_update(
    packed: jnp.ndarray,    # [V, W] u8 (pack_quantized_table)
    rows: jnp.ndarray,      # [n, W] the forward gather of packed at ids
    ids: jnp.ndarray,       # [n] per-occurrence ids (duplicates allowed)
    dvec: jnp.ndarray,      # [n, E] per-occurrence f32 row grads
    rng_bits,               # [n, E] uint32 stochastic-rounding bits, or None
    lr: float,
    bits: int = 8,
    col_groups: int = 1,
    eps: float = 1e-6,
    rng_salt=None,          # scalar uint32: id-keyed bits (see below)
    ids_offset=0,           # local-id -> global-id shift for the bit keying
) -> jnp.ndarray:
    """Rowwise-Adagrad + stochastic requantize over the packed byte rows —
    3 fast row passes total, same structure as ``packed_sparse_update``:
    one combined permute (grads staged INTO the row bytes), duplicate grads
    summed by the segmented scan, one scatter-set of each segment's last
    slot. Same lazy semantics as the classic quantized trainer's update
    (training/quantized_trainer.py:147-178); ``rows`` must be the
    pre-update forward gather.

    Rounding bits: either positional ``rng_bits`` (consumed in id-sorted
    slot order) or — the layout-independent option — ``rng_salt``, which
    derives the bits INTERNALLY from the sorted ids via
    ``id_keyed_rounding_bits(ids + ids_offset, E, salt)``. ``ids_offset``
    lifts shard-local ids back to the global id space so every sharding
    layout keys the same row identically (the sharded trainer passes its
    shard's row offset).
    """
    import os

    n, e = dvec.shape
    w = packed.shape[1]
    qb = q_row_bytes(e, bits)
    base = packed_q_base(e, bits, col_groups)
    assert w >= base + 4 * e, (w, base, e)

    # Plumbing-attack variants (VERDICT r4 #2 — the int8 step's ~4.5 ms of
    # byte-view staging + layout-flip copies). A/B on-chip via
    # scripts/int8_plumbing_ab.py; numerics identical (parity-tested):
    #   ""         baseline: stage dvec bytes into the row, one combined
    #              permute, slice+bitcast the grads back out
    #   "dus"      stage via dynamic_update_slice instead of the 3-way
    #              concatenate (the row tail is already zero)
    #   "sortgrad" the variadic dedup sort CARRIES dvec's e f32 columns,
    #              so grads never round-trip through the byte view and the
    #              row permute moves the untouched gather output
    #   "select"   staging AND the out-row assembly via elementwise
    #              jnp.where over zero-padded pieces instead of
    #              concatenate (select preserves operand layouts; the
    #              concatenates are where XLA bounces u8 majors)
    #
    # Measured on-chip (scripts/int8_plumbing_ab.py, interleaved windows,
    # v5e-1 2026-08-20): select WINS +1.5% at int8 (892.8k vs 879.4k
    # ex/s, -1.2 ms/step, non-overlapping windows) and is the int8
    # DEFAULT — but LOSES 3.1% at int4 (664.0k vs 685.1k; the nibble
    # pack/unpack chain fuses differently), so int4 keeps concatenate.
    # dus LOSES 6% (821k), sortgrad LOSES 34% (580k — the variadic sort
    # carrying E f32 columns costs far more than the byte staging it
    # saves). "base" preserves the round-4 concatenate layout for A/B.
    default = "select" if bits == 8 else ""
    variant = os.environ.get("PYTORCHREC_TPU_QPACK_VARIANT", default)
    if variant == "base":
        variant = ""

    def _place(piece, start):
        # zero-pad ``piece`` to [n, w] at column ``start`` (fusable pad)
        return jnp.pad(piece, ((0, 0), (start, w - start - piece.shape[1])))

    def _assemble_select(pieces):
        # pieces: [(array, start_col)] disjoint; combined by elementwise
        # adds of zero-padded full-width views (pure fusion, no concat)
        out = _place(pieces[0][0], pieces[0][1])
        for piece, start in pieces[1:]:
            out = out + _place(piece, start)
        return out

    if variant == "sortgrad":
        ops = (ids, jnp.arange(n, dtype=jnp.int32)) + tuple(
            dvec[:, j] for j in range(e))
        sorted_all = jax.lax.sort(ops, num_keys=1)
        sorted_ids, order = sorted_all[0], sorted_all[1]
        g_sorted = jnp.stack(sorted_all[2:], axis=1)  # [n, e] f32
        moved = rows[order]
    else:
        sorted_ids, order = jax.lax.sort(
            (ids, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        if variant == "dus":
            staged = jax.lax.dynamic_update_slice(
                rows, _f32_to_bytes(dvec), (0, base))
        elif variant in ("select", "kernel"):  # kernel keeps the winning
            col = jnp.arange(w, dtype=jnp.int32)[None, :]  # select staging
            staged = jnp.where(col < base, rows,
                               _place(_f32_to_bytes(dvec), base))
        else:
            staged = jnp.concatenate([
                rows[:, :base], _f32_to_bytes(dvec),
                jnp.zeros((n, w - base - 4 * e), jnp.uint8)], axis=1)
        moved = staged[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    is_last = jnp.concatenate(
        [sorted_ids[1:] != sorted_ids[:-1], jnp.ones((1,), bool)])

    if variant == "sortgrad":
        g = segmented_sum_scan(g_sorted, is_start, emb_dim=e)
    else:
        g = segmented_sum_scan(_bytes_to_f32(moved[:, base:base + 4 * e]),
                               is_start, emb_dim=e)
    q_old = jax.lax.bitcast_convert_type(moved[:, :qb], jnp.int8)
    scale_old = _bytes_to_f32(moved[:, qb:qb + 4 * col_groups])
    acc_old = _bytes_to_f32(moved[:, qb + 4 * col_groups:
                                  qb + 4 * col_groups + 4])[:, 0]
    current = dequantize_rows(
        q_old, scale_old[:, 0] if col_groups == 1 else scale_old,
        bits=bits, col_groups=col_groups)

    if variant == "kernel" and bits == 8 and col_groups == 1 \
            and rng_salt is not None:
        # fused Pallas requantize (ops/kernels/quantize.py::
        # requantize_rows_pallas): one custom call replaces the
        # dequant/hash/quantize/byte-assembly fusions; the scatter below
        # consumes its materialized output
        from pytorchrec_tpu.ops.kernels import use_pallas_default
        from pytorchrec_tpu.ops.kernels.quantize import requantize_rows_pallas

        out = requantize_rows_pallas(
            moved, g, sorted_ids + ids_offset, rng_salt, lr, e, eps=eps,
            interpret=not use_pallas_default())
        slot = jnp.arange(n)
        safe_ids = jnp.where(is_last, sorted_ids,
                             packed.shape[0] + slot).astype(jnp.int32)
        return packed.at[safe_ids].set(out, mode="drop",
                                       unique_indices=True)

    acc_new = acc_old + jnp.mean(jnp.square(g), axis=-1)
    new_rows = current - lr * g / (jnp.sqrt(acc_new)[:, None] + eps)
    if rng_salt is not None:
        assert rng_bits is None, "pass rng_bits OR rng_salt, not both"
        from pytorchrec_tpu.ops.kernels.quantize import id_keyed_rounding_bits

        rng_bits = id_keyed_rounding_bits(sorted_ids + ids_offset, e, rng_salt)
    q_new, s_new = quantize_rows_xla(new_rows, rng_bits=rng_bits, bits=bits,
                                     col_groups=col_groups)
    s2 = s_new[:, None] if col_groups == 1 else s_new
    if variant == "select":
        out = _assemble_select([
            (jax.lax.bitcast_convert_type(q_new, jnp.uint8), 0),
            (_f32_to_bytes(s2), qb),
            (_f32_to_bytes(acc_new[:, None]), qb + 4 * col_groups),
        ])
    else:
        out = jnp.concatenate([
            jax.lax.bitcast_convert_type(q_new, jnp.uint8),
            _f32_to_bytes(s2),
            _f32_to_bytes(acc_new[:, None]),
            jnp.zeros((n, w - base), jnp.uint8)], axis=1)

    slot = jnp.arange(n)
    safe_ids = jnp.where(is_last, sorted_ids,
                         packed.shape[0] + slot).astype(jnp.int32)
    return packed.at[safe_ids].set(out, mode="drop", unique_indices=True)
