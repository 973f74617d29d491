"""Reader registry.

Capability parity with the reference's model→reader map
(model/models.py:19-30) generalized into a name→class registry. ``"ctr"`` is
the feature-loading variant of the simple reader (DeepFM/DCN-style models need
the dense + sparse feature columns carried through).
"""

from __future__ import annotations

from pytorchrec_tpu.data.readers.base import DataReader
from pytorchrec_tpu.data.readers.history import HistoryDataReader
from pytorchrec_tpu.data.readers.svdpp import SVDPPDataReader
from pytorchrec_tpu.data.readers.value_rl import ValueRLDataReader
from pytorchrec_tpu.utils.registry import Registry

# "simple" is the base reader (reference SimpleDataReader)
SimpleDataReader = DataReader


class CTRDataReader(DataReader):
    """Simple reader defaulting to feature loading (dense + sparse columns)."""

    def __init__(self, *args, load_feature: bool = True, **kwargs):
        super().__init__(*args, load_feature=load_feature, **kwargs)


READERS: Registry = Registry("data_reader")
READERS.register("simple", SimpleDataReader)
READERS.register("history", HistoryDataReader)
READERS.register("svdpp", SVDPPDataReader)
READERS.register("value_rl", ValueRLDataReader)
READERS.register("ctr", CTRDataReader)

data_reader_name_list = list(READERS.names())


def get_data_reader_type(name: str):
    return READERS.get(name)


__all__ = [
    "DataReader",
    "SimpleDataReader",
    "HistoryDataReader",
    "SVDPPDataReader",
    "ValueRLDataReader",
    "CTRDataReader",
    "READERS",
    "data_reader_name_list",
    "get_data_reader_type",
]
