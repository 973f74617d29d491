from pytorchrec_tpu.data.schema import DatasetDescription, SplitMode, TrainMode

__all__ = ["DatasetDescription", "SplitMode", "TrainMode"]
