"""Embedding table as a flax module.

The reference uses ``torch.nn.Embedding`` with normal(0, 0.01) re-init
(model/IModel.py:61-68). On TPU the lookup lowers to an XLA gather that rides
HBM bandwidth; when tables are sharded over a mesh axis the same module works
under pjit with a row-sharded param (see
pytorchrec_tpu/parallel/embedding_parallel.py for the explicit all-to-all
engine used at scale).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import normal

# weight-init policy of the whole framework: normal(0, 0.01) for every
# Dense kernel/bias and every Embedding (reference IModel.py:61-68)
normal_init = normal(stddev=0.01)


class Embedding(nn.Module):
    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", normal_init, (self.num_embeddings, self.features), self.dtype
        )
        return jnp.take(table, ids, axis=0)
