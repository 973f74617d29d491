"""Optimizers as optax gradient transformations.

Capability parity with the reference optim layer (optim/optimizers.py:7-20:
sgd / adam / custom AdamW) plus adagrad (BASELINE.md sparse-table staple).

Semantics notes vs the reference:

* torch ``Adam(weight_decay=l2)`` couples L2 into the gradient — mirrored by
  ``optax.add_decayed_weights`` *before* the Adam moments.
* the reference's hand-written AdamW (optim/AdamW.py:8-61, HuggingFace style)
  decouples weight decay *after* the Adam step, scaled by lr, and excludes
  biases via its param groups (IModel.get_parameters, model/IModel.py:84-92) —
  mirrored by a masked ``add_decayed_weights`` after ``scale_by_adam``.
* all tree-wide updates are dense; the sharded embedding engine applies its
  own sparse-row variant (see pytorchrec_tpu/parallel/embedding_parallel.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import optax

from pytorchrec_tpu.utils.registry import Registry


def _is_bias(path: tuple) -> bool:
    return any(str(getattr(k, "key", getattr(k, "name", k))) == "bias" for k in path)


def default_weight_decay_mask(params) -> Any:
    """True for every param except biases (reference param-group split)."""
    import jax

    return jax.tree_util.tree_map_with_path(lambda path, _: not _is_bias(path), params)


def _sgd(lr: float, weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(lr))
    return optax.chain(*parts)


def _adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, **_) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        # torch-style coupled L2: decay added to the gradient before moments
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*parts)


def _adamw(lr: float, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-6, **_) -> optax.GradientTransformation:
    # decoupled decay after the Adam step; biases excluded, like the
    # reference's param-group split
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=default_weight_decay_mask)
        if weight_decay
        else optax.identity(),
        optax.scale(-lr),
    )


def _adagrad(lr: float, weight_decay: float = 0.0, eps: float = 1e-10, **_) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adagrad(lr, eps=eps))
    return optax.chain(*parts)


OPTIMIZERS: Registry[Callable[..., optax.GradientTransformation]] = Registry("optimizer")
OPTIMIZERS.register("sgd", _sgd)
OPTIMIZERS.register("adam", _adam)
OPTIMIZERS.register("adamw", _adamw)
OPTIMIZERS.register("adagrad", _adagrad)

optimizer_name_list = list(OPTIMIZERS.names())


def get_optimizer(name: str) -> Callable[..., optax.GradientTransformation]:
    return OPTIMIZERS.get(name)


def build_optimizer(
    name: str,
    lr: float,
    weight_decay: float = 0.0,
    grad_clip_norm: Optional[float] = None,
    **kwargs,
) -> optax.GradientTransformation:
    tx = get_optimizer(name)(lr=lr, weight_decay=weight_decay, **kwargs)
    if grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
