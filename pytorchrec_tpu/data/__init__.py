from pytorchrec_tpu.data.schema import DatasetDescription, SplitMode, TrainMode
from pytorchrec_tpu.data.readers import (
    CTRDataReader,
    DataReader,
    HistoryDataReader,
    READERS,
    SVDPPDataReader,
    SimpleDataReader,
    ValueRLDataReader,
    data_reader_name_list,
    get_data_reader_type,
)
from pytorchrec_tpu.data.loader import eval_batches, num_train_batches, train_batches
from pytorchrec_tpu.data.vocab import FrequencyVocab, VocabMapper, build_vocabs

__all__ = [
    "DatasetDescription",
    "SplitMode",
    "TrainMode",
    "DataReader",
    "SimpleDataReader",
    "HistoryDataReader",
    "SVDPPDataReader",
    "ValueRLDataReader",
    "CTRDataReader",
    "READERS",
    "data_reader_name_list",
    "get_data_reader_type",
    "train_batches",
    "eval_batches",
    "num_train_batches",
    "FrequencyVocab",
    "VocabMapper",
    "build_vocabs",
]
