"""Pallas TPU kernels for the hot interaction ops.

The build's native-kernel surface (SURVEY §2.10, BASELINE.json): FM pairwise
interaction, DCN-v2 cross layers, DIN attention pooling. Each kernel is a
drop-in replacement for its XLA twin in pytorchrec_tpu/ops/, validated
against it in tests (interpret mode on CPU, compiled on TPU).

Dispatch policy: modules call ``use_pallas_default()`` — kernels engage on a
real TPU backend and fall back to the XLA implementations elsewhere (CPU
tests, debugging). ``PYTORCHREC_TPU_DISABLE_PALLAS=1`` forces the fallback.
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def use_pallas_default() -> bool:
    if os.environ.get("PYTORCHREC_TPU_DISABLE_PALLAS"):
        return False
    import jax

    return jax.default_backend() == "tpu"


from pytorchrec_tpu.ops.kernels.fm import fm_interaction_pallas
from pytorchrec_tpu.ops.kernels.cross import cross_network_pallas
from pytorchrec_tpu.ops.kernels.din_attention import din_attention_pool_pallas

__all__ = [
    "use_pallas_default",
    "fm_interaction_pallas",
    "cross_network_pallas",
    "din_attention_pool_pallas",
]
