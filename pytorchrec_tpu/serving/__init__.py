"""Python-free serving: bundle export for the C++ PJRT shim.

The reference serves through the mutable torch module's Python predict loop
(reference model/IModel.py:272-308). The TPU build's serving story is AOT:
``Trainer.export_serving`` bakes params into serialized StableHLO, and
:func:`export_serving_bundle` (here) packages that artifact together with
everything a C++ process needs to score batches without Python — the PJRT
plugin path and client-create options, serialized XLA compile options, and
a sample batch with expected outputs for verification. The consumer is
``pytorchrec_tpu/native/serving/pjrt_serving.cpp``.
"""

from pytorchrec_tpu.serving.bundle import export_serving_bundle, shim_binary_path
from pytorchrec_tpu.serving.retrieval import (
    build_item_index,
    make_retrieve_fn,
    make_sharded_retrieve_fn,
    shard_item_index,
)

__all__ = [
    "export_serving_bundle",
    "shim_binary_path",
    "build_item_index",
    "make_retrieve_fn",
    "make_sharded_retrieve_fn",
    "shard_item_index",
]
