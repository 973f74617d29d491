from pytorchrec_tpu.utils.argument import ArgumentDescription, WithArguments
from pytorchrec_tpu.utils.registry import Registry
from pytorchrec_tpu.utils.rng import KeyStream, make_rngs
from pytorchrec_tpu.utils.timer import Timer
from pytorchrec_tpu.utils.version import environment_summary

__all__ = [
    "ArgumentDescription",
    "WithArguments",
    "Registry",
    "KeyStream",
    "make_rngs",
    "Timer",
    "environment_summary",
]
