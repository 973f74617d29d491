"""pytorchrec_tpu — a TPU-native (JAX/XLA/Pallas/pjit) recommender framework.

Brand-new implementation of the capability surface of PyTorchRec
(reference: /root/reference), re-architected TPU-first:

* functional models (flax) with one jitted ``train_step(state, batch)``
* static-shape data contracts (padded candidate blocks, masked sequences)
* sharded embedding tables over a ``jax.sharding.Mesh`` with XLA collectives
* Pallas kernels for the hot interaction / attention ops
"""

__version__ = "0.1.0"
