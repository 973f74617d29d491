"""Row-quantization kernels: f32 rows -> int8 (or packed int4) + per-row scale.

The storage format for quantized embedding tables
(ops/quantized_embedding.py): each row keeps ``int8 values * scale`` with
``scale = absmax / 127``. Updates re-quantize with STOCHASTIC rounding
(Pallas PRNG + ``pltpu.stochastic_round`` pattern from the TPU kernel
guide) so repeated small updates don't vanish — deterministic rounding
would swallow any delta below scale/2.

XLA twins are provided for CPU/test paths; the Pallas kernel engages on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """[..., E] int8 values in [-7, 7] -> [..., E//2] packed bytes (even
    columns in the low nibble, odd in the high)."""
    v = q.astype(jnp.int32)
    low = v[..., 0::2] & 0xF
    high = (v[..., 1::2] & 0xF) << 4
    return (low | high).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., E//2] packed bytes -> [..., E] int8 values in [-8, 7]
    (two's-complement nibble sign-extension via the xor-8 trick)."""
    p = packed.astype(jnp.int32) & 0xFF
    low = ((p & 0xF) ^ 8) - 8
    high = (((p >> 4) & 0xF) ^ 8) - 8
    out = jnp.stack([low, high], axis=-1)
    return out.reshape(*packed.shape[:-1], -1).astype(jnp.int8)


def quantize_rows_xla(rows: jnp.ndarray, rng_bits: jnp.ndarray = None,
                      bits: int = 8,
                      col_groups: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, E] f32 -> ([N, E] int8 (bits=8) or [N, E//2] packed (bits=4),
    f32 scale). ``rng_bits`` (uint32, shape [N, E]) enables stochastic
    rounding; None = round-to-nearest.

    ``col_groups=G`` quantizes each row in G column groups with an
    independent absmax scale per group (scale shape [N, G] instead of [N]):
    one outlier column no longer inflates the quantization step of the
    whole row — the win grows with ``bits=4`` where the grid has only 15
    levels. G=1 keeps the original per-row format (scale shape [N])."""
    assert bits in (8, 4)
    n, e = rows.shape
    assert e % col_groups == 0, (e, col_groups)
    if bits == 4:
        assert (e // col_groups) % 2 == 0, "int4 groups must pack to whole bytes"
    qmax = 127.0 if bits == 8 else 7.0
    grouped = rows.reshape(n, col_groups, e // col_groups)
    absmax = jnp.max(jnp.abs(grouped), axis=-1)            # [N, G]
    scale = jnp.where(absmax > 0, absmax / qmax, 1.0)      # [N, G]
    scaled = (grouped / scale[..., None]).reshape(n, e)
    if rng_bits is None:
        q = jnp.rint(scaled)
    else:
        # stochastic: floor(x + u), u ~ U[0,1)
        u = (rng_bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
        q = jnp.floor(scaled + u)
    q = jnp.clip(q, -qmax, qmax).astype(jnp.int8)
    if col_groups == 1:
        scale = scale[:, 0]
    if bits == 4:
        return pack_int4(q), scale
    return q, scale


def dequantize_rows(q: jnp.ndarray, scale: jnp.ndarray,
                    bits: int = 8, col_groups: int = 1) -> jnp.ndarray:
    """([..., E] int8 or [..., E//2] packed int4, [...] or [..., G] f32)
    -> [..., E]. ``col_groups`` must match the quantization call."""
    if bits == 4:
        q = unpack_int4(q)
    if col_groups == 1:
        return q.astype(jnp.float32) * scale[..., None]
    e = q.shape[-1]
    per_col = jnp.repeat(scale, e // col_groups, axis=-1)  # [..., E]
    return q.astype(jnp.float32) * per_col


def _quantize_kernel(rows_ref, bits_ref, q_ref, scale_ref):
    rows = rows_ref[:]  # [Rb, E]
    absmax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)  # [Rb, 1]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    scaled = rows / scale
    u = (bits_ref[:] >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(scaled + u), -127, 127)
    q_ref[:] = q.astype(jnp.int8)
    scale_ref[:] = scale


def quantize_rows_pallas(rows: jnp.ndarray, rng_bits: jnp.ndarray,
                         block_rows: int = DEFAULT_BLOCK_ROWS,
                         interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused absmax + scale + stochastic round in one VMEM pass.

    ``rng_bits``: uint32, same shape as rows (e.g. ``jax.random.bits``).
    Identical math to ``quantize_rows_xla(rows, rng_bits)``.
    """
    n, e = rows.shape
    pad = (-n) % block_rows
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        rng_bits = jnp.pad(rng_bits, ((0, pad), (0, 0)))
    np_rows = rows.shape[0]
    space = pl.ANY if interpret else pltpu.VMEM
    q, scale = pl.pallas_call(
        _quantize_kernel,
        grid=(np_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, e), lambda i: (i, 0), memory_space=space),
            pl.BlockSpec((block_rows, e), lambda i: (i, 0), memory_space=space),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, e), lambda i: (i, 0), memory_space=space),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=space),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_rows, e), jnp.int8),
            jax.ShapeDtypeStruct((np_rows, 1), jnp.float32),
        ),
        interpret=interpret,
    )(rows, rng_bits)
    return q[:n], scale[:n, 0]


def _mix_u32(x):
    """triple32-style finalizer — EXACTLY id_keyed_rounding_bits' mix."""
    x = x ^ (x >> jnp.uint32(17))
    x = x * jnp.uint32(0xED5AD4BB)
    x = x ^ (x >> jnp.uint32(11))
    x = x * jnp.uint32(0xAC4C1B51)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x31848BAB)
    x = x ^ (x >> jnp.uint32(14))
    return x


def _requantize_kernel(e_const, lr, eps, moved_ref, g_ref, ids_ref,
                       salt_ref, out_ref):
    """One VMEM pass per [R, W] block: dequantize q||scale||acc bytes,
    rowwise-Adagrad, id-keyed stochastic requantize, byte reassembly.
    All arrays stay full-width [R, W] (128 u8 lanes) — no narrow slices,
    no reshapes (Mosaic layout rules)."""
    b = moved_ref[:].astype(jnp.int32)             # [R, W]
    r, w = b.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    e = e_const
    qmask = lane < e

    # q bytes (lanes [0, e)) -> signed f32 values
    q_old = jnp.where(b > 127, b - 256, b).astype(jnp.float32)

    # scale/acc: 4 bytes each at [e, e+4) / [e+4, e+8) -> word -> f32.
    # Assembly runs in INT32 (Mosaic has no unsigned reductions); wrapping
    # preserves the bit pattern and the bitcast only needs the bits.
    sh = jnp.where((lane >= e) & (lane < e + 4), (lane - e) * 8, 0)
    s_i32 = jnp.sum(jnp.where((lane >= e) & (lane < e + 4), b << sh, 0),
                    axis=-1, keepdims=True)  # [R, 1]
    sh2 = jnp.where((lane >= e + 4) & (lane < e + 8), (lane - e - 4) * 8, 0)
    a_i32 = jnp.sum(jnp.where((lane >= e + 4) & (lane < e + 8), b << sh2, 0),
                    axis=-1, keepdims=True)
    scale_old = jax.lax.bitcast_convert_type(s_i32, jnp.float32)  # [R, 1]
    acc_old = jax.lax.bitcast_convert_type(a_i32, jnp.float32)

    g = g_ref[:]                                    # [R, W] (zeros past e)
    current = jnp.where(qmask, q_old * scale_old, 0.0)
    acc_new = acc_old + jnp.sum(
        jnp.where(qmask, jnp.square(g), 0.0), axis=-1, keepdims=True) / e
    new_rows = current - lr * g / (jnp.sqrt(acc_new) + eps)

    # id-keyed rounding bits (identical to id_keyed_rounding_bits)
    idv = ids_ref[:].astype(jnp.uint32)             # [R, 1]
    x = idv * jnp.uint32(0x9E3779B1)
    x = x + lane.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    x = x ^ salt_ref[0].astype(jnp.uint32)
    bits = _mix_u32(x)
    # u32 -> f32 casts are unsupported in Mosaic; the 24-bit value fits
    # int32 exactly, so hop through it
    u = (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * (1.0 / (1 << 24))

    absmax = jnp.max(jnp.where(qmask, jnp.abs(new_rows), 0.0),
                     axis=-1, keepdims=True)
    scale_new = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    qn = jnp.clip(jnp.floor(new_rows / scale_new + u), -127, 127)
    qn = qn.astype(jnp.int32)
    qn_byte = jnp.where(qn < 0, qn + 256, qn)

    # byte extraction in int32: arithmetic shift may sign-extend, the
    # & 0xFF mask recovers the exact byte either way
    sn_i32 = jax.lax.bitcast_convert_type(scale_new, jnp.int32)  # [R, 1]
    an_i32 = jax.lax.bitcast_convert_type(acc_new, jnp.int32)
    s_bytes = (sn_i32 >> sh) & 0xFF
    a_bytes = (an_i32 >> sh2) & 0xFF
    out = jnp.where(qmask, qn_byte,
                    jnp.where((lane >= e) & (lane < e + 4), s_bytes,
                              jnp.where((lane >= e + 4) & (lane < e + 8),
                                        a_bytes, 0)))
    out_ref[:] = out.astype(jnp.uint8)


def requantize_rows_pallas(moved: jnp.ndarray, g: jnp.ndarray,
                           ids: jnp.ndarray, salt: jnp.ndarray, lr: float,
                           e: int, eps: float = 1e-6,
                           block_rows: int = 1024,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused rowwise-Adagrad + stochastic requantize over permuted packed
    byte rows: [n, W] u8 ``moved`` (q||scale||acc||...) + [n, e] f32
    summed grads -> [n, W] u8 replacement rows. Bit-identical math to the
    XLA chain in ops/quantized_packed.py::packed_quantized_update
    (bits=8, col_groups=1). One HBM read of moved+g, one write of out —
    replaces the dequant/hash/quantize/byte-assembly fusions AND their
    layout-flip copies with a single custom call (VERDICT r4 #2's named
    remaining lever; A/B in scripts/int8_plumbing_ab.py 'kernel').
    """
    import functools

    n, w = moved.shape
    assert g.shape == (n, e), (g.shape, n, e)
    g_full = jnp.pad(g, ((0, 0), (0, w - e)))
    ids2 = ids.astype(jnp.int32)[:, None]
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    pad = (-n) % block_rows
    if pad:
        moved = jnp.pad(moved, ((0, pad), (0, 0)))
        g_full = jnp.pad(g_full, ((0, pad), (0, 0)))
        ids2 = jnp.pad(ids2, ((0, pad), (0, 0)))
    np_rows = moved.shape[0]
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_requantize_kernel, e, float(lr), float(eps)),
        grid=(np_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec(memory_space=pltpu.SMEM if not interpret
                         else pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((np_rows, w), jnp.uint8),
        interpret=interpret,
    )(moved, g_full, ids2, salt_arr)
    return out[:n]


def id_keyed_rounding_bits(ids: jnp.ndarray, e: int,
                           salt: jnp.ndarray) -> jnp.ndarray:
    """Deterministic stochastic-rounding bits keyed by (row id, column, salt).

    Counter-based uint32 hash (triple32-style finalizer): bits depend only on
    the GLOBAL row id, the column index and a per-(table, step) ``salt`` —
    never on slot position, device, or sharding layout. That makes the
    quantized update's stochastic rounding REPRODUCIBLE across layouts: the
    single-device packed trainer, the model-axis-sharded trainer and the
    grid-sharded trainer all draw the identical rounding decision for the
    same row value (training/sharded_sparse_trainer.py quantized path), so
    cross-layout parity holds to float-reassociation noise instead of
    diverging by independent rounding streams.

    ``ids [n]`` int, ``salt`` scalar uint32 (see ``table_rounding_salt``).
    Returns [n, e] uint32.
    """
    x = ids.astype(jnp.uint32)[:, None] * jnp.uint32(0x9E3779B1)
    x = x + jnp.arange(e, dtype=jnp.uint32)[None, :] * jnp.uint32(0x85EBCA77)
    x = x ^ salt.astype(jnp.uint32)
    x = x ^ (x >> 17)
    x = x * jnp.uint32(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * jnp.uint32(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x31848BAB)
    x = x ^ (x >> 14)
    return x


def table_rounding_salt(rng: jnp.ndarray, step: jnp.ndarray,
                        path: str) -> jnp.ndarray:
    """Per-(table, step) salt for ``id_keyed_rounding_bits``.

    Derived from the train state's PRNG key and the table's parameter path
    string, so trainers that share a seed draw the same salt for the same
    table regardless of sharding layout (the path string is the stable
    cross-trainer identity; a positional table index would not be)."""
    import zlib

    key = jax.random.fold_in(rng, zlib.crc32(path.encode()) & 0x7FFFFFFF)
    base = jax.random.bits(key, (), jnp.uint32)
    return base ^ (step.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
