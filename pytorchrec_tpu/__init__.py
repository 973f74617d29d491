"""pytorchrec_tpu — a TPU-native (JAX/XLA/Pallas/pjit) recommender framework.

Brand-new implementation of the capability surface of PyTorchRec
(reference: /root/reference), re-architected TPU-first:

* functional models (flax) with one jitted ``train_step(state, batch)``
* static-shape data contracts (padded candidate blocks, masked sequences)
* sharded embedding tables over a ``jax.sharding.Mesh`` with XLA collectives
* Pallas kernels for the hot interaction / attention ops
"""

__version__ = "0.1.0"

# lazy top-level API: `from pytorchrec_tpu import Trainer, Task, ...` without
# paying the jax/flax import cost for metadata-only imports
_LAZY = {
    "Trainer": ("pytorchrec_tpu.training", "Trainer"),
    "RLTrainer": ("pytorchrec_tpu.training", "RLTrainer"),
    "SparseEmbeddingTrainer": ("pytorchrec_tpu.training.sparse_trainer",
                               "SparseEmbeddingTrainer"),
    "QuantizedEmbeddingTrainer": ("pytorchrec_tpu.training.quantized_trainer",
                                  "QuantizedEmbeddingTrainer"),
    "Task": ("pytorchrec_tpu.tasks", "Task"),
    "RepeatTask": ("pytorchrec_tpu.tasks", "RepeatTask"),
    "GridSearch": ("pytorchrec_tpu.tasks", "GridSearch"),
    "SplitMode": ("pytorchrec_tpu.data.schema", "SplitMode"),
    "TrainMode": ("pytorchrec_tpu.data.schema", "TrainMode"),
    "make_mesh": ("pytorchrec_tpu.parallel", "make_mesh"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
