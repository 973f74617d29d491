"""Dataset generators & raw-data formatters.

* Synthetic generators (hermetic tests/benchmarks): ``generate_synthetic_ml``,
  ``generate_synthetic_ctr``.
* Raw formatters, capability parity with reference proprecess/ (SURVEY §2.6):
  MovieLens 100K/1M/10M, Jester, Amazon Beauty/Cellphones/Grocery, XING.
"""

from pytorchrec_tpu.data.process.datasets.synthetic import (
    generate_synthetic_ctr,
    generate_synthetic_ml,
)
from pytorchrec_tpu.data.process.datasets.movielens import (
    format_movielens_100k,
    format_movielens_1m,
    format_movielens_10m,
)
from pytorchrec_tpu.data.process.datasets.amazon import (
    format_amazon,
    format_amazon_beauty,
    format_amazon_cellphones,
    format_amazon_grocery,
)
from pytorchrec_tpu.data.process.datasets.jester import format_jester
from pytorchrec_tpu.data.process.datasets.xing import (
    format_xing,
    prepare_interaction_data,
    prepare_item_data,
    prepare_user_data,
)

__all__ = [
    "generate_synthetic_ml",
    "generate_synthetic_ctr",
    "format_movielens_100k",
    "format_movielens_1m",
    "format_movielens_10m",
    "format_amazon",
    "format_amazon_beauty",
    "format_amazon_cellphones",
    "format_amazon_grocery",
    "format_jester",
    "format_xing",
    "prepare_user_data",
    "prepare_item_data",
    "prepare_interaction_data",
]

from pytorchrec_tpu.data.process.datasets.criteo import format_criteo

__all__.append("format_criteo")
