"""Model zoo registry.

Capability parity with reference model/models.py:8-30 — but where the
reference registry lags its own zoo (only FunkSVD registered), every model is
registered here, each mapped to the data reader family it consumes.
"""

from pytorchrec_tpu.models.base import RecModel
from pytorchrec_tpu.models.ctr import DCNv2, DeepFM, DLRM, FM, LR
from pytorchrec_tpu.models.din import DIN
from pytorchrec_tpu.models.funk_svd import FunkSVD
from pytorchrec_tpu.models.multitask import ESMM, MMoE, PLE, SharedBottom
from pytorchrec_tpu.models.two_tower import TwoTower
from pytorchrec_tpu.models.gru4rec import GRU4Rec
from pytorchrec_tpu.models.ncf import NCF
from pytorchrec_tpu.models.sasrec import SASRec
from pytorchrec_tpu.models.svdpp import SVDPP
from pytorchrec_tpu.models.rl import (
    BranchQNet,
    DQNQNet,
    QNet,
    ValueRLModel,
    make_deers_qnet,
    make_lsrl_l_qnet,
    make_lsrl_lps_qnet,
    make_lsrl_ps_qnet,
    make_lsrl_psns_qnet,
    make_lsrl_qnet,
)
from pytorchrec_tpu.utils.registry import Registry

MODELS: Registry = Registry("model")

# (model factory, reader name) — reader names resolve via data.readers registry
_MODEL_TO_READER = {
    "funksvd": (FunkSVD, "simple"),
    "ncf": (NCF, "simple"),
    "svdpp": (SVDPP, "svdpp"),
    "gru4rec": (GRU4Rec, "history"),
    "sasrec": (SASRec, "history"),
    "din": (DIN, "history"),
    "lr": (LR, "simple"),
    "fm": (FM, "simple"),
    "deepfm": (DeepFM, "ctr"),
    "dcn": (DCNv2, "ctr"),
    "dcnv2": (DCNv2, "ctr"),
    "dlrm": (DLRM, "ctr"),
    "two_tower": (TwoTower, "simple"),
    "shared_bottom": (SharedBottom, "ctr"),
    "mmoe": (MMoE, "ctr"),
    "ple": (PLE, "ctr"),
    "esmm": (ESMM, "ctr"),
    "dqn": (DQNQNet, "value_rl"),
    "deers": (make_deers_qnet, "value_rl"),
    "lsrl": (make_lsrl_qnet, "value_rl"),
    "lsrl_l": (make_lsrl_l_qnet, "value_rl"),
    "lsrl_ps": (make_lsrl_ps_qnet, "value_rl"),
    "lsrl_lps": (make_lsrl_lps_qnet, "value_rl"),
    "lsrl_psns": (make_lsrl_psns_qnet, "value_rl"),
}

for _name, (_factory, _reader) in _MODEL_TO_READER.items():
    MODELS.register(_name, (_factory, _reader))

model_name_list = list(MODELS.names())


def get_model_type(model_name: str):
    return MODELS.get(model_name)[0]


def get_data_reader_name(model_name: str) -> str:
    return MODELS.get(model_name)[1]


__all__ = [
    "RecModel",
    "FunkSVD",
    "SVDPP",
    "NCF",
    "GRU4Rec",
    "SASRec",
    "DIN",
    "LR",
    "FM",
    "DeepFM",
    "DCNv2",
    "DLRM",
    "TwoTower",
    "SharedBottom",
    "MMoE",
    "PLE",
    "ESMM",
    "QNet",
    "DQNQNet",
    "BranchQNet",
    "ValueRLModel",
    "MODELS",
    "model_name_list",
    "get_model_type",
    "get_data_reader_name",
]
