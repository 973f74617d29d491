from pytorchrec_tpu.training.callbacks import (
    Callback,
    CallbackList,
    CSVLogger,
    EarlyStopping,
    History,
    ModelCheckpoint,
    ProgbarLogger,
    TerminateOnNaN,
)
from pytorchrec_tpu.training.checkpoint import (
    CheckpointCallback,
    CheckpointManager,
    PreemptionGuard,
)
from pytorchrec_tpu.training.rl_trainer import (
    RLTrainer,
    ShardedSparseRLTrainer,
    SparseRLTrainer,
)
from pytorchrec_tpu.training.sharded_sparse_trainer import ShardedSparseEmbeddingTrainer
from pytorchrec_tpu.training.sparse_trainer import SparseEmbeddingTrainer
from pytorchrec_tpu.training.state import RLTrainState, TrainState
from pytorchrec_tpu.training.trainer import Trainer

__all__ = [
    "Callback",
    "CallbackList",
    "History",
    "ModelCheckpoint",
    "EarlyStopping",
    "CSVLogger",
    "TerminateOnNaN",
    "ProgbarLogger",
    "Trainer",
    "RLTrainer",
    "SparseRLTrainer",
    "ShardedSparseRLTrainer",
    "SparseEmbeddingTrainer",
    "ShardedSparseEmbeddingTrainer",
    "CheckpointManager",
    "CheckpointCallback",
    "PreemptionGuard",
    "TrainState",
    "RLTrainState",
]
